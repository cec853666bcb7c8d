"""Hardware A/B: Pallas GEMM-formulated conv dW vs XLA's conv backward-filter
(VERDICT r3 item 3 — the one conv family with no dead-end-ledger entry).

Shapes are the UNet-resnet18 b128 bench's layer3/layer4 3x3 convs — the
C >= 256 region where docs/speed_of_light.md measures XLA's dW at ~45% MXU
(fwd is 58%). Sweeps the kernel's batch_block; prints one JSON row per leg.

Usage: python scripts/bench_dw.py [--batch 128] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_fn(fn, *args, reps):
    out = fn(*args)
    float(jnp.sum(out))  # host fetch blocks through the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from kurosiwo_tpu.ops.backend import is_tpu_backend
    from kurosiwo_tpu.ops.pallas_dw import conv3x3_dw, xla_dw

    interp = args.interpret or not is_tpu_backend()
    shapes = [
        ("layer2", (args.batch, 56, 56, 128), 128, (2, 4)),
        ("layer3", (args.batch, 28, 28, 256), 256, (4, 8)),
        ("layer4", (args.batch, 14, 14, 512), 512, (2, 4, 8)),
    ]
    rng = np.random.RandomState(0)
    for name, xshape, cout, blocks in shapes:
        x = jnp.asarray(rng.randn(*xshape).astype(np.float32), dtype=jnp.bfloat16)
        dy = jnp.asarray(rng.randn(*xshape[:3], cout).astype(np.float32), dtype=jnp.bfloat16)
        flops = 2 * xshape[0] * xshape[1] * xshape[2] * 9 * xshape[3] * cout

        jref = jax.jit(xla_dw)
        ms_xla = time_fn(jref, x, dy, reps=args.reps)
        ref = jref(x, dy)  # reuse the compiled fn — an eager call would pay a second multi-minute remote compile per shape
        print(json.dumps({
            "case": f"dw/{name}", "leg": "xla", "ms": round(ms_xla, 3),
            "tf_s": round(flops / ms_xla / 1e9, 1),
        }))

        for bb in blocks:
            fn = jax.jit(lambda x, dy, bb=bb: conv3x3_dw(x, dy, batch_block=bb,
                                                         interpret=interp))
            try:
                got = fn(x, dy)
                md = float(jnp.max(jnp.abs(got - ref)))
                scale = float(jnp.max(jnp.abs(ref))) or 1.0
                ms = time_fn(fn, x, dy, reps=args.reps)
            except Exception as e:  # Mosaic lowering failures are a RESULT here
                print(json.dumps({
                    "case": f"dw/{name}", "leg": f"pallas_bb{bb}",
                    "error": f"{type(e).__name__}: {str(e)[:300]}",
                }))
                continue
            print(json.dumps({
                "case": f"dw/{name}", "leg": f"pallas_bb{bb}", "ms": round(ms, 3),
                "tf_s": round(flops / ms / 1e9, 1),
                "vs_xla": round(ms_xla / ms, 3),
                "rel_maxdiff": round(md / scale, 6),
            }))


if __name__ == "__main__":
    main()
