"""Hardware validation of the per-ring-step flash kernels (VERDICT r3 item 5).

The ring collective itself cannot run on a single chip, but the blocks it is
made of can — and they are exactly what interpret mode cannot vouch for
(Mosaic lowering differs from the interpreter). `ops/ring_attention.py`'s
flash branch calls two kernels per ring step:

  _flash_fwd(q, kb, vb, scale, bq, bk)            per rotating k/v block,
                                                  merged with logaddexp
  flash_bwd(q, kb, vb, do, lse, delta, ...)       with GLOBAL (ring-merged)
                                                  lse/delta residuals

This script emulates a P=2 ring on one device: a 2048-token sequence split
into two 1024-token k/v blocks, forward-merged exactly as `_ring_impl`'s
flash branch merges them (ring_attention.py:75-90), then the per-block flash
backward with the merged residuals (ring_attention.py:159-169) — asserted
against dense attention + autodiff gradients at f32 and bf16.

Run on the real chip (the r4 TPU chain does); exits non-zero on mismatch.
Usage: python scripts/hw_ring_flash.py [--seq 2048] [--blocks 2]
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


def dense_attn(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(q.dtype)


def make_ring_fns(p_blocks, scale, bq, bk, interp):
    from kurosiwo_tpu.ops.pallas_attention import _flash_fwd, flash_bwd

    def ring_fwd(q, kbs, vbs):
        # mirror of ring_attention._ring_impl's flash branch (logaddexp merge)
        acc = jnp.zeros(q.shape, jnp.float32)
        lse_run = jnp.full(q.shape[:-1] + (1,), -1e30, jnp.float32)
        for i in range(p_blocks):
            o_blk, lse_blk = _flash_fwd(q, kbs[i], vbs[i], scale, bq, bk, interp)
            lse_blk = lse_blk[..., None]
            lse_new = jnp.logaddexp(lse_run, lse_blk)
            acc = acc * jnp.exp(lse_run - lse_new) + o_blk.astype(jnp.float32) * jnp.exp(
                lse_blk - lse_new
            )
            lse_run = lse_new
        return acc.astype(q.dtype), lse_run

    def ring_bwd(q, kbs, vbs, o, lse, do):
        # mirror of ring_attention._ring_bwd_flash (global lse/delta residuals)
        dof = do.astype(jnp.float32)
        delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)
        lse3 = lse[..., 0]
        dq = jnp.zeros(q.shape, jnp.float32)
        dks, dvs = [], []
        for i in range(p_blocks):
            dq_blk, dk_blk, dv_blk = flash_bwd(
                q, kbs[i], vbs[i], do, lse3, delta, scale, bq, bk, interp
            )
            dq = dq + dq_blk.astype(jnp.float32)
            dks.append(dk_blk.astype(jnp.float32))
            dvs.append(dv_blk.astype(jnp.float32))
        return dq, jnp.stack(dks), jnp.stack(dvs)

    return ring_fwd, ring_bwd


def run_case(dtype, args, interp):
    from kurosiwo_tpu.ops.attention import _pick_block

    b, h, d = args.batch, args.heads, args.dim
    n_local = args.seq // args.blocks
    scale = d**-0.5
    bq = _pick_block(n_local)
    bk = _pick_block(n_local, want=1024)
    assert bq and bk, (n_local, bq, bk)

    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), dtype=dtype)
    q = mk(b, h, n_local, d)
    k = mk(b, h, args.seq, d)
    v = mk(b, h, args.seq, d)
    do = mk(b, h, n_local, d)
    kbs = [k[:, :, i * n_local : (i + 1) * n_local] for i in range(args.blocks)]
    vbs = [v[:, :, i * n_local : (i + 1) * n_local] for i in range(args.blocks)]

    ring_fwd, ring_bwd = make_ring_fns(args.blocks, scale, bq, bk, interp)

    @jax.jit
    def flash_all(q, kbs, vbs, do):
        o, lse = ring_fwd(q, kbs, vbs)
        dq, dk, dv = ring_bwd(q, kbs, vbs, o, lse, do)
        return o, dq, dk, dv

    @jax.jit
    def dense_all(q, k, v, do):
        o, vjp = jax.vjp(lambda q, k, v: dense_attn(q, k, v, scale), q, k, v)
        dq, dk, dv = vjp(do)
        return o, dq, dk, dv

    t0 = time.perf_counter()
    o_f, dq_f, dk_f, dv_f = flash_all(q, kbs, vbs, do)
    float(jnp.sum(o_f))  # host fetch: block through the tunnel
    compile_s = time.perf_counter() - t0
    o_d, dq_d, dk_d, dv_d = dense_all(q, k, v, do)
    dk_d = jnp.stack([dk_d[:, :, i * n_local : (i + 1) * n_local] for i in range(args.blocks)])
    dv_d = jnp.stack([dv_d[:, :, i * n_local : (i + 1) * n_local] for i in range(args.blocks)])

    # f32 tolerances differ by backend: TPU f32 einsums run bf16 multiplies
    # at DEFAULT precision (both the dense reference and the kernel), so the
    # summation-order spread is bf16-product-scale — measured 5.7e-4 on the
    # chip vs the CPU-true-f32 ~1e-5. The CPU interpret run keeps the tight
    # band; hardware gets a band set at ~3x the measured value.
    if interp:
        tol = {"float32": (5e-4, 2e-3), "bfloat16": (2e-2, 5e-2)}[jnp.dtype(dtype).name]
    else:
        tol = {"float32": (2e-3, 5e-3), "bfloat16": (2e-2, 5e-2)}[jnp.dtype(dtype).name]
    diffs = {}
    for name, a, bb, t in (
        ("out", o_f, o_d, tol[0]),
        ("dq", dq_f, dq_d, tol[1]),
        ("dk", dk_f, dk_d, tol[1]),
        ("dv", dv_f, dv_d, tol[1]),
    ):
        md = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
        diffs[name] = round(md, 6)
        assert md <= t, f"{jnp.dtype(dtype).name} {name}: maxdiff {md} > tol {t}"

    # steady-state fwd+bwd timing of the flash ring blocks at this shard shape
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        o_f, dq_f, _, _ = flash_all(q, kbs, vbs, do)
    float(jnp.sum(dq_f))
    step_ms = (time.perf_counter() - t0) / reps * 1e3

    print(json.dumps({
        "case": f"ring-flash-blocks/{jnp.dtype(dtype).name}",
        "backend": jax.default_backend(),
        "seq": args.seq, "blocks": args.blocks, "n_local": n_local,
        "bq": bq, "bk": bk, "maxdiff": diffs, "pass": True,
        "fwd_bwd_ms": round(step_ms, 2), "first_call_s": round(compile_s, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (smoke only; hardware is the point)")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    if args.interpret:
        # must happen before ANY device use — the image's sitecustomize pins
        # the axon TPU backend and a stalled tunnel hangs backend init
        jax.config.update("jax_platforms", "cpu")

    from kurosiwo_tpu.ops.backend import is_tpu_backend

    interp = args.interpret or not is_tpu_backend()
    if interp and not args.interpret:
        print(json.dumps({"warning": "no TPU backend; running interpret-mode smoke"}))
    for dtype in (jnp.float32, jnp.bfloat16):
        run_case(dtype, args, interp)


if __name__ == "__main__":
    main()
