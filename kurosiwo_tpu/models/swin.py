"""Swin Transformer backbone (tiny/small/base) for UperNet.

Reference counterpart: the `openmmlab/upernet-swin-*` HF checkpoints consumed
by `/root/reference/models/upernet.py:28-77`. Implemented from scratch,
TPU-first: window attention is batched as (B * num_windows) dense attention —
windows are 7x7=49 tokens, so everything rides the MXU as one big batched
matmul; shifted windows use jnp.roll (no host-side masks beyond a static
precomputed bias).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from einops import rearrange

from .upernet import SWIN_SPECS  # specs live beside the UperNet wrapper


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    return rearrange(x, "b (hn wh) (wn ww) c -> (b hn wn) (wh ww) c", wh=ws, ww=ws)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    return rearrange(
        x, "(b hn wn) (wh ww) c -> b (hn wh) (wn ww) c", hn=h // ws, wn=w // ws, wh=ws, ww=ws
    )


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask for shifted-window attention."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask == 0, 0.0, -100.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        bnw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        rpb = self.param(
            "relative_position_bias",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.num_heads)
        q, k, v = sp(q), sp(k), sp(v)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        scores = scores * (head_dim**-0.5)
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpb[idx]  # (N, N, heads)
        scores = scores + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(bnw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            scores = scores.reshape(bnw, self.num_heads, n, n)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    shift: int = 0
    window_size: int = 7
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws == self.window_size else 0
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = window_partition(y, ws)
        mask = jnp.asarray(_shift_mask(h, w, ws, shift)) if shift else None
        wins = WindowAttention(self.dim, self.num_heads, ws, self.dtype, name="attn")(wins, mask)
        y = window_reverse(wins, ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    backbone: str = "swin_tiny"
    window_size: int = 7
    dtype: Any = jnp.float32
    spec: Any = None  # optional (depths, embed, heads) override

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, embed, heads = self.spec or SWIN_SPECS[self.backbone]
        x = nn.Conv(embed, (4, 4), strides=4, dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        feats = []
        for s in range(4):
            dim = embed * (2**s)
            if s > 0:
                # patch merging: 2x2 neighborhood concat -> LN -> linear /2
                # (odd feature maps are edge-padded first, like torch Swin's F.pad)
                if x.shape[1] % 2 or x.shape[2] % 2:
                    x = jnp.pad(
                        x, ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, 0)), mode="edge"
                    )
                x = rearrange(x, "b (h p1) (w p2) c -> b h w (p1 p2 c)", p1=2, p2=2)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"merge_norm{s}")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype, name=f"merge{s}")(x)
            for b in range(depths[s]):
                x = SwinBlock(
                    dim, heads[s], shift=0 if b % 2 == 0 else self.window_size // 2,
                    window_size=self.window_size, dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x)
            feats.append(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{s}")(x))
        return feats
