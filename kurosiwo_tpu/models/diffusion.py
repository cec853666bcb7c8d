"""Unsupervised diffusion pretraining (task "diffusion-unsup").

Reference counterpart: `/root/reference/models/model_utilities.py:98-108` —
`GaussianDiffusion(Unet(dim=64, dim_mults=(1,2,4,8), channels=2),
channels=2, image_size=224, timesteps=1000, loss_type="l1")` from the
third-party denoising_diffusion_pytorch wheel. Rebuilt natively:

  * DDPMUnet: sinusoidal time embedding -> MLP; resnet blocks
    (GroupNorm + SiLU, time-emb scale/shift injection) over a
    dim_mults pyramid; linear-attention bottleneck; skip connections;
  * GaussianDiffusion: linear beta schedule, epsilon-prediction, L1 loss on
    uniformly-sampled timesteps; ancestral p_sample loop (lax.fori_loop)
    for generation.

The whole q_sample -> eps_pred -> loss path is one jitted function with an
explicit PRNG key; sampling runs the reverse chain under lax.fori_loop (a
single compiled program, not 1000 python-dispatched steps like the
reference's wheel).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResnetBlock(nn.Module):
    features: int
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        # time conditioning: scale/shift
        ts = nn.Dense(self.features * 2, dtype=self.dtype)(nn.silu(temb))
        scale, shift = jnp.split(ts[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(h)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        return x + h


class LinearAttention(nn.Module):
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * inner), 3, axis=-1)
        rs = lambda t: t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = rs(q), rs(k), rs(v)
        q = jax.nn.softmax(q, axis=-1) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype)(out)


class DDPMUnet(nn.Module):
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        temb = sinusoidal_time_embedding(t, self.dim)
        temb = nn.Dense(self.dim * 4, dtype=self.dtype)(temb)
        temb = nn.Dense(self.dim * 4, dtype=self.dtype)(nn.gelu(temb))

        h = nn.Conv(self.dim, (7, 7), padding=3, dtype=self.dtype)(x)
        skips = [h]
        dims = [self.dim * m for m in self.dim_mults]
        for i, d in enumerate(dims):
            h = ResnetBlock(d, dtype=self.dtype)(h, temb)
            h = ResnetBlock(d, dtype=self.dtype)(h, temb)
            skips.append(h)
            if i < len(dims) - 1:
                h = nn.Conv(d, (4, 4), strides=2, padding=1, dtype=self.dtype)(h)
        h = ResnetBlock(dims[-1], dtype=self.dtype)(h, temb)
        h = LinearAttention(dtype=self.dtype)(h)
        h = ResnetBlock(dims[-1], dtype=self.dtype)(h, temb)
        for i, d in reversed(list(enumerate(dims))):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = ResnetBlock(d, dtype=self.dtype)(h, temb)
            h = ResnetBlock(d, dtype=self.dtype)(h, temb)
            if i > 0:
                bh, hh, wh, ch = h.shape
                h = jax.image.resize(h, (bh, hh * 2, wh * 2, ch), "nearest")
                h = nn.Conv(dims[i - 1], (3, 3), padding=1, dtype=self.dtype)(h)
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = ResnetBlock(self.dim, dtype=self.dtype)(h, temb)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)


class GaussianDiffusion(nn.Module):
    model: DDPMUnet
    timesteps: int = 1000
    loss_type: str = "l1"
    beta_start: float = 1e-4
    beta_end: float = 0.02

    def _schedule(self):
        betas = jnp.linspace(self.beta_start, self.beta_end, self.timesteps)
        alphas = 1.0 - betas
        acp = jnp.cumprod(alphas)
        return betas, alphas, acp

    def __call__(self, x0: jnp.ndarray, rng: jax.Array | None = None):
        """Training loss: q_sample at uniform t, predict epsilon, L1/L2."""
        if rng is None:
            rng = self.make_rng("diffusion")
        b = x0.shape[0]
        kt, kn = jax.random.split(rng)
        _, _, acp = self._schedule()
        t = jax.random.randint(kt, (b,), 0, self.timesteps)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        sqrt_acp = jnp.sqrt(acp)[t][:, None, None, None]
        sqrt_om = jnp.sqrt(1.0 - acp)[t][:, None, None, None]
        xt = sqrt_acp * x0 + sqrt_om * noise
        eps = self.model(xt, t)
        err = eps.astype(jnp.float32) - noise.astype(jnp.float32)
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(err))
        return jnp.mean(err**2)

    def sample(self, rng: jax.Array, shape: tuple) -> jnp.ndarray:
        """Ancestral sampling under one lax.fori_loop."""
        betas, alphas, acp = self._schedule()
        k0, kloop = jax.random.split(rng)
        x = jax.random.normal(k0, shape)

        def body(i, carry):
            x, key = carry
            t = self.timesteps - 1 - i
            tb = jnp.full((shape[0],), t)
            eps = self.model(x, tb)
            coef = betas[t] / jnp.sqrt(1.0 - acp[t])
            mean = (x - coef * eps) / jnp.sqrt(alphas[t])
            key, kn = jax.random.split(key)
            noise = jax.random.normal(kn, shape)
            x = jnp.where(t > 0, mean + jnp.sqrt(betas[t]) * noise, mean)
            return (x, key)

        x, _ = jax.lax.fori_loop(0, self.timesteps, body, (x, kloop))
        return x
