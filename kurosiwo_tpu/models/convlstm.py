"""Encoder-decoder ConvLSTM for N-to-1 recurrent segmentation.

Parity with `/root/reference/models/convlstm.py:57-227`. The reference runs an
eager per-timestep python loop on device; here the whole T-step recurrence is
traced once under jit (T=3 is static, so the scan is unrolled and XLA fuses
across steps; longer sequences would switch to flax's lifted nn.scan).

Dataflow quirks of the reference, preserved:
  * decoder CLSTM cells receive ZERO inputs and are seeded with the reversed
    encoder hidden states (hidden_states[-1], [-2], [-3]);
  * consequently the transconv_1d/transconv_2d branches of the reference are
    dead computation (their outputs are overwritten before use,
    convlstm.py:205-215) — we skip them, which changes nothing numerically;
  * softmax over classes is applied INSIDE the model; the trainer's CE then
    treats the probabilities as logits (replicated faithfully);
  * only the last timestep is returned (N-to-1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nn import TorchConvTranspose


class CLSTMCell(nn.Module):
    """ConvLSTM cell: gates via one grouped conv + GroupNorm over 4F channels."""

    input_channels: int
    num_features: int
    filter_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, hidden_state, seq_len: int):
        """inputs: (T, B, H, W, C) or None; hidden_state: (hx, cx) or None.
        Returns (outputs (T, B, H, W, F), (hy, cy))."""
        f = self.num_features
        pad = (self.filter_size - 1) // 2
        conv = nn.Conv(
            4 * f, (self.filter_size, self.filter_size), padding=pad, dtype=self.dtype, name="conv"
        )
        norm = nn.GroupNorm(num_groups=4 * f // 32, epsilon=1e-5, dtype=self.dtype, name="norm")

        if inputs is not None:
            t, b, h, w, _ = inputs.shape
        else:
            b, h, w = hidden_state[0].shape[0], hidden_state[0].shape[1], hidden_state[0].shape[2]
            t = seq_len
        if hidden_state is None:
            hx = jnp.zeros((b, h, w, f), self.dtype)
            cx = jnp.zeros((b, h, w, f), self.dtype)
        else:
            hx, cx = hidden_state

        xs = (
            inputs
            if inputs is not None
            else jnp.zeros((t, b, h, w, self.input_channels), self.dtype)
        )

        # Unrolled scan: T is tiny and static (3 frames); unrolling avoids
        # loop-carried layout constraints and lets XLA fuse across steps. For
        # long sequences this would become flax's lifted nn.scan.
        outs = []
        for ti in range(t):
            gates = norm(conv(jnp.concatenate([xs[ti], hx], axis=-1)))
            i, fg, g, o = jnp.split(gates, 4, axis=-1)
            cx = nn.sigmoid(fg) * cx + nn.sigmoid(i) * jnp.tanh(g)
            hx = nn.sigmoid(o) * jnp.tanh(cx)
            outs.append(hx)
        return jnp.stack(outs), (hx, cx)


class ConvLSTM(nn.Module):
    """3-stage strided-conv + CLSTM encoder, 3-stage CLSTM + transposed-conv
    decoder seeded with reversed encoder states; N-to-1 output."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, C) -> time-major (T, B, H, W, C)
        x = jnp.swapaxes(x, 0, 1)
        t = x.shape[0]
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)

        def per_frame(v, mod):
            tt, b = v.shape[0], v.shape[1]
            flat = v.reshape((tt * b,) + v.shape[2:])
            out = mod(flat)
            return out.reshape((tt, b) + out.shape[1:])

        conv1 = nn.Conv(16, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv_1e")
        x = lrelu(per_frame(x, conv1))
        x, h1 = CLSTMCell(16, 64, dtype=self.dtype, name="clstm_1e")(x, None, t)

        conv2 = nn.Conv(64, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv_2e")
        x = lrelu(per_frame(x, conv2))
        x, h2 = CLSTMCell(64, 96, dtype=self.dtype, name="clstm_2e")(x, None, t)

        conv3 = nn.Conv(96, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv_3e")
        x = lrelu(per_frame(x, conv3))
        x, h3 = CLSTMCell(96, 96, dtype=self.dtype, name="clstm_3e")(x, None, t)

        # Decoder (zero-input cells seeded with encoder states). The reference
        # also computes transconv_1d/2d on the stage outputs but discards the
        # results; we materialize only what reaches the output.
        d1, _ = CLSTMCell(96, 96, dtype=self.dtype, name="clstm_1d")(None, h3, t)
        del d1
        d2, _ = CLSTMCell(96, 96, dtype=self.dtype, name="clstm_2d")(None, h2, t)
        del d2
        d3, _ = CLSTMCell(96, 64, dtype=self.dtype, name="clstm_3d")(None, h1, t)

        # Only the LAST timestep reaches the N-to-1 output.
        last = d3[-1]
        out = TorchConvTranspose(self.num_classes, 4, 2, 1, dtype=self.dtype, name="transconv_3d")(last)
        out = lrelu(out)
        probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        return probs
