"""Custom-vjp LayerNorm — the ViT/MAE counterpart of the BN win.

Motivation (docs/performance.md, MAE profile): ~12 ms of the 91 ms ViT-L
step is LayerNorm/loss reductions over many small (64*tokens, 1024) tensors.
Autodiff through flax's LayerNorm saves/rereads f32 intermediates; this
drop-in keeps big-tensor arithmetic in x.dtype with per-ROW f32 statistics
(mu, rstd) as the only residuals beyond the input — the same recipe that won
+1.6% end-to-end for BatchNorm (ops/pallas_bn.py custom-vjp form).

Exact semantics of flax.linen.LayerNorm(epsilon=1e-6): statistics in f32
over the last axis, scale/bias f32 params, output cast to `dtype`.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mu) * rstd * scale + bias
    # single rounding straight to the module dtype: routing through x.dtype
    # first would insert a bf16 rounding flax.linen.LayerNorm doesn't have
    # when a bf16 input meets an f32-configured norm
    return y.astype(out_dtype)


def _ln_fwd(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((xf - mu) * rstd * scale + bias).astype(out_dtype)
    # residuals: input + per-row f32 stats (D-fold smaller than the tensor)
    return y, (x, mu, rstd, scale)


def _ln_bwd(eps, out_dtype, res, dy):
    x, mu, rstd, scale = res
    d = x.shape[-1]
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mu) * rstd
    dxhat = dyf * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    axes = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=axes)
    dbias = jnp.sum(dyf, axis=axes)
    return dx, dscale, dbias


_ln.defvjp(_ln_fwd, _ln_bwd)


class LayerNorm(nn.Module):
    """flax.linen.LayerNorm drop-in (same param tree: scale, bias) with the
    hand-derived two-reduce backward."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = (
            self.param("scale", nn.initializers.ones, (d,), jnp.float32)
            if self.use_scale
            else jnp.ones((d,), jnp.float32)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
            if self.use_bias
            else jnp.zeros((d,), jnp.float32)
        )
        return _ln(x, scale, bias, self.epsilon, jnp.dtype(self.dtype))
