"""BatchNorm with MXU-resident statistics (TPU redesign of the zoo's BN).

Motivation (profiled on v5e, docs/performance.md): in a UNet train step the
BN statistics/gradient reductions are ~37% of device time. Plain XLA reduces
over a (B*H*W, C) activation are VPU-issue-bound (~238 GB/s effective); an
augmented Gram matmul

    [x | 1]^T [x | 1]  ->  sum(x) (last column), sum(x^2) (diagonal)

computes BOTH statistics in one MXU pass at ~310 GB/s (measured), with the
same precision: the MXU multiplies bf16 exactly into an f32 accumulator,
which matches XLA's convert-then-add. The backward uses the same trick for
the two BN reductions (sum(dy), sum(dy*x) via a cross Gram of [dy|1] and
[x|1]) inside a custom VJP; dx is the standard elementwise expression that
XLA fuses into neighbors.

`GramBatchNorm` mirrors flax.linen.BatchNorm's parameter/stat tree exactly
(params: scale/bias; batch_stats: mean/var), so checkpoints and converters
are unaffected.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _aug_gram(a2d: jnp.ndarray, b2d: jnp.ndarray) -> jnp.ndarray:
    """([a|1]^T [b|1]): (C_a+1, C_b+1) with f32 accumulation on the MXU."""
    ones = jnp.ones((a2d.shape[0], 1), a2d.dtype)
    aa = jnp.concatenate([a2d, ones], axis=1)
    bb = aa if b2d is a2d else jnp.concatenate([b2d, ones], axis=1)
    return jax.lax.dot_general(
        aa, bb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stats(x2d):
    n = x2d.shape[0]
    g = _aug_gram(x2d, x2d)
    s = g[-1, :-1]
    q = jnp.diagonal(g)[:-1]
    mean = s / n
    var = q / n - mean * mean
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x2d, gamma, beta, eps):
    """(y, mean, var); mean/var are stop-gradient outputs for the running-
    stat update (their cotangents are ignored in bwd, matching flax BN's
    stop_gradient on the stat update)."""
    return _bn_train_impl(x2d, gamma, beta, eps)[0]


def _bn_train_impl(x2d, gamma, beta, eps):
    mean, var = _stats(x2d)
    inv = jax.lax.rsqrt(var + eps)
    scale = (gamma * inv).astype(x2d.dtype)
    shift = (beta - mean * gamma * inv).astype(x2d.dtype)
    y = x2d * scale + shift
    return (y, mean, var), (x2d, mean, inv, gamma)


def _bn_train_vjp_fwd(x2d, gamma, beta, eps):
    out, res = _bn_train_impl(x2d, gamma, beta, eps)
    return out, res


def _bn_train_bwd(eps, res, cot):
    dy, _dmean, _dvar = cot  # stat outputs feed stop_gradient -> zero cot
    x2d, mean, inv, gamma = res
    n = x2d.shape[0]
    g = _aug_gram(dy, x2d)  # [dy|1]^T [x|1] on the MXU
    sum_dy_x = jnp.diagonal(g)[:-1]
    sum_dy = g[:-1, -1]
    sum_dy_xhat = (sum_dy_x - mean * sum_dy) * inv
    dgamma = sum_dy_xhat
    dbeta = sum_dy
    # dx = gamma*inv * (dy - sum_dy/n - xhat * sum_dy_xhat/n); elementwise,
    # fused by XLA into neighboring ops
    coef = (gamma * inv).astype(x2d.dtype)
    mean_dy = (sum_dy / n).astype(x2d.dtype)
    a = inv * inv * sum_dy_xhat / n  # xhat = (x-mean)*inv folded in
    dx = coef * (dy - mean_dy) - (gamma * a).astype(x2d.dtype) * (
        x2d - mean.astype(x2d.dtype)
    )
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


_bn_train.defvjp(_bn_train_vjp_fwd, _bn_train_bwd)


class GramBatchNorm(nn.Module):
    """flax.linen.BatchNorm drop-in (feature axis -1, scale+bias) with
    MXU-based statistics. Same parameter/stat tree: params {scale, bias},
    batch_stats {mean, var}; torch-parity momentum convention (flax momentum
    0.9 == torch 0.1)."""

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        dt = self.dtype or x.dtype
        x = x.astype(dt)

        if use_ra:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            s = (scale * inv).astype(dt)
            t = (bias - ra_mean.value * scale * inv).astype(dt)
            return x * s + t

        shape = x.shape
        x2d = x.reshape(-1, c)
        y2d, mean, var = _bn_train(x2d, scale, bias, self.epsilon)
        mean, var = jax.lax.stop_gradient((mean, var))
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y2d.reshape(shape)
