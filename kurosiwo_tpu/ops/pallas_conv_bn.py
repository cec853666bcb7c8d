"""Fused [affine+ReLU prologue] -> conv3x3 -> [BN-stats epilogue] Pallas kernel.

The round-2 profile (docs/performance.md) puts ~10 ms of the 37.9 ms UNet
step in structural BatchNorm passes XLA cannot fuse into the convs: the
per-channel (sum, sumsq) statistics read each conv output once more at the
measured 238 GB/s VPU reduce ceiling, and the normalize pass reads it again.
This kernel computes the conv AND its output statistics while the tiles are
in VMEM, and optionally applies the PREVIOUS BN's folded (scale, bias) +
ReLU to the input tiles on the way in — so a chain of these kernels runs
conv->BN->ReLU->conv with zero extra HBM passes.

Scope (deliberate, measured-first): stride-1 3x3 SAME convs with channel
counts that satisfy Mosaic's 128-lane DMA alignment (C_in, C_out multiples
of 128 — the deep half of the ResNet encoder and the first decoder blocks).
The C<128 flattened-lane variant is the known blocker documented in
ops/pallas_conv.py.

Forward-only: pair with XLA's conv gradients through conv3x3_bn_stats_vjp
(the backward BN reduces stay on the custom-vjp BN path, ops/pallas_bn.py).

Reference semantics covered: torch Conv2d(3x3, pad 1) + BatchNorm2d batch
statistics (models/snunet.py-style ConvBN blocks across the zoo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_bn_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    rows_per_block: int = 8,
    interpret: bool = False,
):
    """x: (B, H, W, Cin) NHWC (bf16/f32); w: (3, 3, Cin, Cout) HWIO.
    Optional prologue: x <- relu(scale*x + bias) per input channel.

    Returns (y, stats): y = conv3x3 SAME/stride 1 of the (possibly
    normalized) input, stats = (2, Cout) f32 [sum, sumsq] over (B, H, W) —
    exactly what BatchNorm batch statistics need (mean = s/N,
    var = sq/N - mean^2).
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert cin % 128 == 0 and cout % 128 == 0, (
        f"conv3x3_bn_stats requires 128-aligned channels, got {cin}->{cout}; "
        "C<128 is the documented Mosaic DMA blocker (ops/pallas_conv.py)")
    prologue = scale is not None
    if not prologue:
        scale = jnp.ones((cin,), jnp.float32)
        bias = jnp.zeros((cin,), jnp.float32)
    rows = rows_per_block
    assert h % rows == 0, (h, rows)
    # merge batch into rows: (B, H, W, C) -> (B*H, W, C); halo rows across
    # image boundaries are masked by zero-padding each image edge
    wo = -(-wd // 8) * 8      # padded OUTPUT width (sublane-aligned merge)
    ws = wo + 8               # slab width: wo + halo, still 8-aligned
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, ws - wd - 1), (0, 0)))
    xf = xp.reshape(bsz * (h + 2), ws, cin)
    # rebuild per-image row slabs: grid cell (b, j) reads rows [b*(h+2)+j*rows,
    # ... + rows+2) — expressed with a flat grid over all (b, j)
    nb = bsz * (h // rows)

    def row_index(i):
        b = i // (h // rows)
        j = i % (h // rows)
        return b * (h + 2) + j * rows

    # we need x_hbm.at[ds(start, rows+2)] with start = row_index(i); pallas
    # manual DMA supports computed offsets
    def kernel(x_hbm, w_ref, s_ref, b_ref, y_ref, st_ref, xslab, patches, sem):
        i = pl.program_id(0)
        start = (i // (h // rows)) * (h + 2) + (i % (h // rows)) * rows
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(start, rows + 2), :, :], xslab, sem)
        dma.start()
        dma.wait()
        xs = xslab[...]
        if prologue:
            # conv SAME pads with zero AFTER the activation in the real
            # network, so halo pixels must stay 0 (not relu(bias))
            col = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, ws, 1), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, ws, 1), 0)
            local = (start + row) % (h + 2)
            pad = (col < 1) | (col >= wd + 1) | (local == 0) | (local == h + 1)
            xs = jnp.where(
                pad,
                jnp.zeros_like(xs, dtype=jnp.float32),
                jnp.maximum(xs.astype(jnp.float32) * s_ref[0, :] + b_ref[0, :], 0.0),
            ).astype(xs.dtype)
        for t, (dy, dx) in enumerate([(a, b) for a in range(3) for b in range(3)]):
            tap = xs[dy : dy + rows, dx : dx + wo, :].reshape(rows * wo, cin)
            patches[:, t * cin : (t + 1) * cin] = tap
        acc = jax.lax.dot_general(
            patches[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y3 = acc.reshape(rows, wo, cout)[:, :wd, :]
        y_ref[0] = y3.astype(y_ref.dtype)
        ssum = jnp.sum(y3, axis=(0, 1))[None, :]
        ssq = jnp.sum(y3 * y3, axis=(0, 1))[None, :]
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, cout), 1)
        part = jnp.where(lane8 == 0, ssum[:, None, :], 0.0)
        part = jnp.where(lane8 == 1, ssq[:, None, :], part)
        st_ref[...] = part

    wmat = w.reshape(9 * cin, cout)
    y, stats = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cin), lambda i: (0, 0)),
            pl.BlockSpec((1, cin), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, wd, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 8, cout), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, rows, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((nb, 8, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, ws, cin), x.dtype),
            pltpu.VMEM((rows * wo, 9 * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf, wmat, scale.reshape(1, cin).astype(jnp.float32),
      bias.reshape(1, cin).astype(jnp.float32))
    y = y.reshape(bsz, h, wd, cout)
    s = jnp.sum(stats[:, 0, :], axis=0)
    sq = jnp.sum(stats[:, 1, :], axis=0)
    return y, jnp.stack([s, sq])


def _pick_rows(h: int) -> int:
    """Largest row-block <= 16 dividing H (VMEM slab height)."""
    for r in (16, 14, 12, 8, 7, 4, 2, 1):
        if h % r == 0:
            return r
    return 1


def _conv_same_bf(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_bn(x, w, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """conv3x3 SAME/stride-1 -> training-mode BatchNorm, with the conv AND
    its output statistics computed in ONE Pallas pass (the standalone XLA
    stats pass — one extra HBM read of the conv output at the measured
    238 GB/s reduce ceiling — never happens). Returns (out, mean, var),
    matching `conv_same + bn_train_apply` numerics.

    Backward: the tuned two-reduce BN vjp (ops/pallas_bn.py formulas, big
    tensors in x.dtype) + XLA's transposed-conv gradients via jax.vjp (the
    re-traced primal conv is dead code and DCE'd by XLA)."""
    (out, mean, var), _ = _cbn_fwd(x, w, scale, bias, eps, interpret)
    return out, mean, var


def _cbn_fwd(x, w, scale, bias, eps, interpret):
    dt = x.dtype
    y, st = conv3x3_bn_stats(x, w.astype(dt), rows_per_block=_pick_rows(x.shape[1]),
                             interpret=interpret)
    n = y.size // y.shape[-1]
    mean = st[0] / n
    var = st[1] / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    out = y * (inv * scale).astype(dt) + (bias - mean * inv * scale).astype(dt)
    return (out, mean, var), (x, w, y, mean, inv, scale)


def _cbn_bwd(eps, interpret, res, cts):
    from .pallas_bn import pair_sums

    dout, _dmean, _dvar = cts
    x, w, y, mean, inv, scale = res
    n = y.size // y.shape[-1]
    sum_dy, sum_dyy = pair_sums(dout, y)
    dbeta = sum_dy
    dgamma = inv * (sum_dyy - mean * sum_dy)
    dt = y.dtype
    a_f = scale * inv
    b_f = -a_f * inv * dgamma / n
    c_f = -a_f * (dbeta / n) - b_f * mean
    dy = dout * a_f.astype(dt) + y * b_f.astype(dt) + c_f.astype(dt)
    _, conv_vjp = jax.vjp(_conv_same_bf, x, w.astype(dt))
    dx, dwc = conv_vjp(dy)
    return dx, dwc.astype(w.dtype), dgamma, dbeta


conv3x3_bn.defvjp(_cbn_fwd, _cbn_bwd)
