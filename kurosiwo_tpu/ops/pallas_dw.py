"""Pallas GEMM-formulated 3x3 conv weight gradient (dW).

docs/speed_of_light.md attributes the UNet headline gap to XLA's dense-conv
MXU efficiency, and the weight-grad pass is its weakest leg (45% MXU vs 58%
fwd). Unlike the measured-regression conv-epilogue kernels (which PRODUCE
activation-layout tensors and pay XLA's custom-conv relayout tax on the
boundary), a dW kernel consumes two big tensors but produces only a tiny
(3, 3, Cin, Cout) one — the one conv family with no entry in the dead-end
ledger (VERDICT r3 item 3).

Formulation — one flat GEMM per kernel tap, no im2col materialization:

  * pad x and dy into the SAME (b, H+4, Wp, C) geometry (H padded by 2 top
    and bottom, W to the next 8-aligned width with a 1-col left halo), then
    flatten the leading dims: a (kh, kw) tap of the conv becomes a constant
    ROW OFFSET off = (kh-1)*Wp + (kw-1) between the two flat views;
  * dW[kh, kw] = xflat[s+off : s+off+K]^T @ dyflat[s : s+K] — a static
    sublane slice (lane dim untouched) feeding a (K, Cin) x (K, Cout)
    MXU contraction with K ~ b_blk*(H+4)*Wp. Rows where dy is zero padding
    contribute nothing, which is what makes the cross-row/cross-batch
    flat shifts exact (any out-of-tap row multiplies a zero);
  * grid over batch chunks; the (9, Cin, Cout) f32 accumulator block has a
    constant index map, so it lives in VMEM across the sequential grid and
    is read-modify-written per cell.

The reference gets this op from cuDNN's conv backward-filter
(`/root/reference/models/snunet.py:11-29`-style blocks via torch autograd);
here it is jax.lax.conv_general_dilated's dW whenever this kernel is off.

STATUS: experiment behind `conv3x3_dw` (not wired into model code until the
hardware A/B in scripts/bench_dw.py says keep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _dw_kernel(x_ref, dy_ref, o_ref, *, taps, dy_start, k_rows, cin, cout):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xf = x_ref[:].reshape(-1, cin)
    dyf = dy_ref[:].reshape(-1, cout)
    dys = dyf[dy_start : dy_start + k_rows, :]

    # per-tap read-modify-write (no 9-way stack/concat — friendlier Mosaic);
    # the o_ref block has a constant index map so it stays VMEM-resident
    # across the sequential batch grid
    for t, off in enumerate(taps):
        xs = xf[dy_start + off : dy_start + off + k_rows, :]
        o_ref[t] = o_ref[t] + jax.lax.dot_general(
            xs, dys, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def conv3x3_dw(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    batch_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weight gradient of a stride-1 SAME 3x3 conv.

    x: (B, H, W, Cin) forward input; dy: (B, H, W, Cout) output cotangent.
    Returns (3, 3, Cin, Cout) float32 — bit-comparable to
    jax.grad(conv)(w) up to f32 accumulation order.
    """
    b, h, w, cin = x.shape
    cout = dy.shape[-1]
    assert dy.shape[:3] == (b, h, w), (x.shape, dy.shape)
    assert cin % 128 == 0 and cout % 128 == 0, "dW kernel targets C >= 128 lanes"
    assert b % batch_block == 0, (b, batch_block)

    wp = _round_up(w + 2, 8)
    # shared geometry: content sits at rows [2, H+2), cols [1, W+1)
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, wp - w - 1), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (2, 2), (1, wp - w - 1), (0, 0)))

    rows_pb = (h + 4) * wp
    n = batch_block * rows_pb
    max_off = wp + 1
    dy_start = _round_up(max_off, 8)
    # K: multiple of 8, slices in-bounds for every tap, window covers every
    # nonzero dy row [2*wp+1, n - 3*wp + w + 1]
    k_rows = (n - dy_start - max_off) // 8 * 8
    assert dy_start <= 2 * wp + 1 and dy_start + k_rows >= n - 3 * wp + w + 2, (
        "flat tap window cannot cover the dy content rows", h, w, wp, n, k_rows
    )
    taps = [(kh - 1) * wp + (kw - 1) for kh in range(3) for kw in range(3)]

    out = pl.pallas_call(
        functools.partial(
            _dw_kernel, taps=taps, dy_start=dy_start, k_rows=k_rows,
            cin=cin, cout=cout,
        ),
        grid=(b // batch_block,),
        in_specs=[
            pl.BlockSpec((batch_block, h + 4, wp, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((batch_block, h + 4, wp, cout), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        interpret=interpret,
    )(xp, dyp)
    return out.reshape(3, 3, cin, cout)


def pick_batch_block(b: int, h: int, w: int, cin: int, cout: int,
                     itemsize: int = 2, budget: int = 15 * 2 ** 20) -> int:
    """Largest batch block whose kernel fits scoped VMEM (16 MB on v5e).

    Footprint model calibrated against measured compiles (r5 hardware A/B):
    the naive 2*(x+dy tiles)+acc model under-counts — Mosaic's actual scoped
    allocation at (14,14,256,256) bb=16 was 16.02 MB vs 11.8 MB modeled
    (OOM by 20 KB), consistent with an extra in-flight copy of the input
    tiles beyond double-buffering; 3*(x+dy)+acc matches that point and stays
    conservative for the shapes that did compile (layer4 bb<=4)."""
    wp = _round_up(w + 2, 8)
    acc = 9 * cin * cout * 4
    for bb in (16, 8, 4, 2, 1):
        if b % bb:
            continue
        tiles = bb * (h + 4) * wp * (cin + cout) * itemsize
        if 3 * tiles + acc <= budget:
            return bb
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_pdw(x, w, batch_block=8, interpret=False):
    """stride-1 SAME 3x3 conv whose forward and dx are XLA's own lowering
    and ONLY dW is the Pallas GEMM kernel — the in-step experiment shape
    (the standalone A/B in scripts/bench_dw.py cannot see the relayout tax
    a pallas boundary puts on conv-custom-layout activations)."""
    return _conv_same(x, w)


def _conv_same(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _pdw_fwd(x, w, batch_block, interpret):
    return _conv_same(x, w), (x, w)


def _pdw_bwd(batch_block, interpret, res, dy):
    x, w = res
    _, vjp = jax.vjp(lambda xx: _conv_same(xx, w), x)
    (dx,) = vjp(dy)
    dw = conv3x3_dw(x, dy, batch_block=batch_block, interpret=interpret)
    return dx, dw.astype(w.dtype)


conv3x3_pdw.defvjp(_pdw_fwd, _pdw_bwd)


def xla_dw(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: the dW jax.grad produces for the same conv, with the
    train step's dtype convention — the conv runs wholly in compute dtype
    (flax nn.Conv dtype=bf16 in the engine), and the f32 cast happens at the
    param boundary (astype transpose), i.e. AFTER the dW conv."""
    w_shape = (3, 3, x.shape[-1], dy.shape[-1])

    def conv(w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(conv, jnp.zeros(w_shape, x.dtype))
    return vjp(dy.astype(x.dtype))[0].astype(jnp.float32)
