"""Pallas fused conv3x3 for small-channel high-resolution feature maps.

Motivation (profiled, SURVEY.md §7 hot-path work): XLA lowers an NHWC conv by
padding the channel dim to the 128-lane MXU width, so a 3x3 conv with C=16 at
224^2 wastes ~8x MXU throughput (K = 9*128 padded vs 9*16 real). This kernel
reformulates the conv as an explicit im2col matmul in VMEM:

  * grid over (batch, row-blocks); the padded input stays in HBM/ANY and
    each cell DMAs its (rows+2, W+2, C) halo slab into VMEM scratch
    (overlapping halos can't be expressed as BlockSpec tiles);
  * the 9-shifted im2col stack is built in VMEM and contracted
    (rows*W, 9C) x (9C, O) on the MXU — K pads to 256 instead of 1152 for
    C=16;
  * bias + ReLU fused into the epilogue (one HBM round trip saved).

Forward-only; a custom_vjp upstream can pair it with XLA's conv gradients
(weight grads contract over the huge B*H*W dim where XLA is already
MXU-efficient).

STATUS: EXPERIMENTAL — correct under the Pallas interpreter (covered by
tests/test_pallas_conv.py) but not yet lowerable by the current Mosaic
release on real hardware: HBM DMA slices require the channel (lane) dim to
be 128-aligned ("Slice shape along dimension 3 must be aligned to tiling
(128), but is 16"), which defeats the small-channel purpose. Landing it
needs either a (B, H, W*C) flattened-lane layout with relayout-tolerant
shifted slices, or a Mosaic that supports sub-tile DMA. Not wired into the
model hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    x_hbm, w_ref, b_ref, o_ref, scratch, patches_ref, sem, *, relu, rows, width, cin, cout
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * rows, rows + 2), :, :], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[:, :, :]
    # materialize im2col into a (rows*W, 9*cin) scratch via per-tap stores
    # (Mosaic cannot lower a 9-way vector concat of shifted slices)
    for t, (dy, dx) in enumerate([(a, b) for a in range(3) for b in range(3)]):
        tap = x[dy : dy + rows, dx : dx + width, :].reshape(rows * width, cin)
        patches_ref[:, t * cin : (t + 1) * cin] = tap
    acc = jax.lax.dot_general(
        patches_ref[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + b_ref[0, :].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(rows, width, cout).astype(o_ref.dtype)


def conv3x3_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    relu: bool = True,
    rows_per_block: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, Cin) NHWC; w: (3, 3, Cin, Cout) HWIO; b: (Cout,).
    'SAME' padding, stride 1."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert h % rows_per_block == 0, (h, rows_per_block)
    # width padded to left 1 + right up-to-8-alignment: DMA slices along the
    # sublane (width) dim must be 8-aligned on TPU
    wpad_total = -(-(wd + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad_total - wd - 1), (0, 0)))
    wmat = w.reshape(9 * cin, cout)  # im2col order: (dy, dx, cin)
    grid = (bsz, h // rows_per_block)
    return pl.pallas_call(
        functools.partial(
            _conv_kernel, relu=relu, rows=rows_per_block, width=wd, cin=cin, cout=cout
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows_per_block, wd, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_per_block + 2, wpad_total, cin), x.dtype),
            pltpu.VMEM((rows_per_block * wd, 9 * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wmat, b.reshape(1, cout))
