"""kurosiwo_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for rapid
flood mapping from multi-temporal Sentinel-1 SAR, providing the full capability
surface of the Kuro Siwo reference stack (Orion-AI-Lab/KuroSiwo) re-designed
TPU-first.

Capability parity map (reference file → this package):
  main.py                    → kurosiwo_tpu.cli / main.py
  utilities/utilities.py     → kurosiwo_tpu.config, kurosiwo_tpu.ops.{losses,metrics,schedules}
  dataset/Dataset.py         → kurosiwo_tpu.data.*
  models/*                   → kurosiwo_tpu.models.*
  training/*                 → kurosiwo_tpu.training.*
  (no reference equivalent)  → kurosiwo_tpu.parallel.* (mesh/sharding; reference is single-GPU)

Design stance: functional JAX core (pure jitted train/eval steps, explicit PRNG
keys, pytree state), NHWC layout, bf16 compute / f32 params, a named-mesh
runtime where single-chip is a 1x1 mesh, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
