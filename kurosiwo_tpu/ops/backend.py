"""Single predicate for "is this a TPU backend".

The axon-tunneled chip can surface with a backend name containing "axon"
rather than the literal "tpu". Round-3 ADVICE: steps.py and
resolve_fused_tail required ``jax.default_backend() == "tpu"`` exactly while
the kernel gates (_use_short_kernel/_use_pallas_conv/_use_pallas) also
accepted axon — on such a backend an explicit fused_tail flag validated
cleanly but silently ran the kernel in interpret mode (orders of magnitude
slower). Every hardware-gating predicate now shares this helper.
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    backend = jax.default_backend()
    return backend == "tpu" or "axon" in backend
