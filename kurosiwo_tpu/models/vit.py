"""FloodViT: lucidrains-style ViT encoder (pre-norm, learned pos-emb + cls).

Structural parity with `/root/reference/models/vision_transformer.py:19-156`
for checkpoint conversion:
  to_patch_embedding = [rearrange p16, LayerNorm(patch_dim), Linear(->dim),
                        LayerNorm(dim)]
  pre-norm blocks: x = attn(LN(x)) + x ; x = ff(LN(x)) + x ; final LN.
  Attention: fused qkv Linear (no bias), out proj Linear.
  pool="cls" quirk: the forward RETURNS ALL PATCH TOKENS x[:, 1:] with no head
  (vision_transformer.py:150-153) — that is what FinetunerSegmentation and the
  MAE wrapper consume; pool="mean" applies the mlp_head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_ln import LayerNorm as FusedLayerNorm
from einops import rearrange

from ..ops.attention import attention_packed


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = FusedLayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class SelfAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32
    # context parallelism: when set, the module is running INSIDE a shard_map
    # with the token axis sharded over this mesh axis — attention becomes a
    # ring pass (ops/ring_attention.ring_attention_p) so each device only
    # ever holds its local q/k/v shard. Everything else in the block is
    # token-pointwise and needs no change. Param tree is unchanged, so
    # converted checkpoints load identically.
    ring_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        x = FusedLayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.ring_axis is not None:
            from ..ops.ring_attention import ring_attention_p

            q, k, v = (
                rearrange(t, "b n (h d) -> b h n d", h=self.heads) for t in (q, k, v)
            )
            out = ring_attention_p(q, k, v, self.ring_axis, scale=self.dim_head**-0.5)
            out = rearrange(out, "b h n d -> b n (h d)")
        else:
            out = attention_packed(q, k, v, self.heads, scale=self.dim_head**-0.5)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return out


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Any = jnp.float32
    ring_axis: str | None = None  # see SelfAttention.ring_axis

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = SelfAttention(self.dim, self.heads, self.dim_head, self.dtype,
                              ring_axis=self.ring_axis, name=f"attn_{i}")(x) + x
            x = FeedForward(self.dim, self.mlp_dim, self.dtype, name=f"ff_{i}")(x) + x
        return FusedLayerNorm(dtype=self.dtype, name="norm")(x)


def patchify(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC image -> (B, N, p*p*C) patches, matching the reference's NCHW
    Rearrange 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' element order."""
    return rearrange(img, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)", p1=patch, p2=patch)


def unpatchify(patches: jnp.ndarray, patch: int, h: int, w: int, c: int) -> jnp.ndarray:
    return rearrange(
        patches, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c", h=h // patch, w=w // patch, p1=patch, p2=patch
    )


class ViT(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_dim: int = 2048
    pool: str = "cls"
    channels: int = 6
    dim_head: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        num_patches = (self.image_size // self.patch_size) ** 2
        self.patch_norm1 = FusedLayerNorm(dtype=self.dtype)
        self.patch_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.patch_norm2 = FusedLayerNorm(dtype=self.dtype)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim), jnp.float32
        )
        self.cls_token = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim), jnp.float32)
        self.transformer = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim, self.dtype
        )
        self.mlp_head = nn.Dense(self.num_classes, dtype=self.dtype)

    def embed_patches(self, patches: jnp.ndarray) -> jnp.ndarray:
        """patch pixels -> tokens (LN -> Linear -> LN), no positions."""
        return self.patch_norm2(self.patch_proj(self.patch_norm1(patches)))

    def embed_image(self, img: jnp.ndarray) -> jnp.ndarray:
        """Tokens directly from the NHWC image — same math as
        ``embed_patches(patchify(img, p))`` without materializing the 6-D
        patch transpose (r3 MAE profile: ~16 ms/step of pure copies/reshapes
        at ViT-L b64, 17% of the step).

        * the per-patch LayerNorm statistics are strided reductions over the
          contiguous (B, h, p, w, p, C) *view* of the image — no transpose;
        * the LN scale folds into the projection kernel reshaped to an HWIO
          conv kernel (patchify element order (p1, p2, c) IS the reshape
          order), and the LN bias becomes a constant output offset;
        * one stride-p VALID convolution replaces transpose + matmul.

        Numerics match embed_patches up to reduction order / bf16 rounding
        placement (parity-tested at 1e-5 f32 in tests/test_models.py).
        """
        p = self.patch_size
        b, hh, ww, c = img.shape
        h, w = hh // p, ww // p
        d = p * p * c
        # materialize the submodule params without running the patch path
        # (the dummy results are dead code under XLA; param tree unchanged)
        _ = self.patch_norm1(jnp.zeros((1, d), jnp.float32))
        _ = self.patch_proj(jnp.zeros((1, d), jnp.float32))
        gamma = self.patch_norm1.variables["params"]["scale"]
        beta = self.patch_norm1.variables["params"]["bias"]
        kernel = self.patch_proj.variables["params"]["kernel"]  # (d, dim)
        dbias = self.patch_proj.variables["params"]["bias"]

        xf = img.astype(jnp.float32).reshape(b, h, p, w, p, c)
        mu = jnp.mean(xf, axis=(2, 4, 5))[:, :, None, :, None, None]  # (B,h,1,w,1,1)
        m2 = jnp.mean(jnp.square(xf), axis=(2, 4, 5))[:, :, None, :, None, None]
        rstd = jax.lax.rsqrt(m2 - jnp.square(mu) + self.patch_norm1.epsilon)
        dt = img.dtype if self.dtype is None else self.dtype
        xn = ((xf - mu) * rstd).astype(dt).reshape(b, hh, ww, c)

        kf = (kernel * gamma[:, None]).reshape(p, p, c, self.dim)
        offset = beta @ kernel + dbias  # (dim,) f32
        y = jax.lax.conv_general_dilated(
            xn, kf.astype(dt), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = (y + offset.astype(dt)).reshape(b, h * w, self.dim)
        return self.patch_norm2(y)

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        x = self.embed_image(img)
        b, n, _ = x.shape
        cls = jnp.tile(self.cls_token.astype(x.dtype), (b, 1, 1))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : n + 1].astype(x.dtype)
        x = self.transformer(x)
        if self.pool == "mean":
            x = jnp.mean(x, axis=1)
            return self.mlp_head(x)
        # pool == "cls": reference returns all patch tokens, no head.
        return x[:, 1:]
