"""TransUNet-CD: conv bottleneck encoder + ViT bottleneck + conv decoder,
bi-temporal features concatenated per level.

Parity with `/root/reference/models/transunet_cd.py`:
  * encoder: conv7x7/s2 -> 3 bottleneck stages (each /2) -> ViT over the /16
    grid (patch_dim=1) -> 3x3 conv to 512;
  * transformer is POST-norm (x+attn -> LN, x+mlp -> LN) with dropout 0.1;
  * attention quirk replicated: the reference MULTIPLIES scores by
    sqrt(head_dim) instead of dividing (transunet_cd.py:12,21) — kept for
    checkpoint-level parity;
  * decoder: bilinear(align_corners=True) 2x upsamples with skip concats;
  * `siamese` config selects shared vs per-frame encoders; levels are fused
    by concatenation before decoding (transunet_cd.py:279-291);
  * the reference factory's missing import makes this model unreachable
    (model_utilities.py:217-228 NameError) — fixed here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from einops import rearrange

from ..ops.attention import attention_packed
from ..ops.nn import ConvBNAct, resize_bilinear


class PostNormBlock(nn.Module):
    dim: int
    head_num: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        head_dim = self.dim // self.head_num
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="qkv")(x)
        # reference layout: 'b t (d k h)' -> last dim ordered (d, k, h)
        q, k, v = _split_ref_layout(qkv, self.head_num)
        # quirk: multiply by sqrt(head_dim) (reference dk usage)
        att = attention_packed(q, k, v, self.head_num, scale=float(head_dim) ** 0.5)
        att = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="out_attention")(att)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + att)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


def _split_ref_layout(qkv: jnp.ndarray, head_num: int):
    """The reference rearranges 'b t (d k h)' with k=3, h=heads: the fused
    projection's feature axis is ordered (d, k, h), NOT (k, h, d). Replicate
    so converted checkpoints score identically. Emits head-major packed
    (b, t, h*d) — one (d, h)->(h, d) transpose per tensor, the same count
    the old (b, h, t, d) layout paid, but the output merge is then free and
    the packed short-attention kernel applies."""
    b, t, dkh = qkv.shape
    d = dkh // (3 * head_num)
    x = qkv.reshape(b, t, d, 3, head_num)
    q, k, v = x[:, :, :, 0, :], x[:, :, :, 1, :], x[:, :, :, 2, :]
    pack = lambda z: jnp.transpose(z, (0, 1, 3, 2)).reshape(b, t, head_num * d)
    return pack(q), pack(k), pack(v)


class BottleneckViT(nn.Module):
    """ViT over the /16 feature grid (patch_dim=1, classification=False)."""

    embedding_dim: int
    head_num: int
    mlp_dim: int
    block_num: int
    num_tokens: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        tokens = rearrange(x, "b h w c -> b (h w) c")
        tokens = nn.Dense(self.embedding_dim, dtype=self.dtype, name="projection")(tokens)
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.embedding_dim), jnp.float32)
        emb = self.param(
            "embedding", nn.initializers.uniform(1.0), (self.num_tokens + 1, self.embedding_dim), jnp.float32
        )
        tokens = jnp.concatenate([jnp.tile(cls.astype(tokens.dtype), (b, 1, 1)), tokens], axis=1)
        tokens = tokens + emb[None, : tokens.shape[1]].astype(tokens.dtype)
        for i in range(self.block_num):
            tokens = PostNormBlock(
                self.embedding_dim, self.head_num, self.mlp_dim, self.dtype, name=f"block_{i}"
            )(tokens, deterministic)
        return rearrange(tokens[:, 1:], "b (h w) c -> b h w c", h=h)


class EncoderBottleneck(nn.Module):
    out_channels: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference width = out_channels * base_width/64 = out_channels
        # (transunet_cd.py:146) — the bottleneck does NOT narrow
        width = self.out_channels
        down = ConvBNAct(self.out_channels, 1, self.stride, act=None, padding=0, dtype=self.dtype, name="downsample")(x, train)
        y = ConvBNAct(width, 1, 1, padding=0, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(width, 3, 2, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBNAct(self.out_channels, 1, 1, act=None, padding=0, dtype=self.dtype, name="conv3")(y, train)
        return nn.relu(y + down)


class TransUNetEncoder(nn.Module):
    out_channels: int
    head_num: int
    mlp_dim: int
    block_num: int
    patch_dim: int
    img_dim: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        x = ConvBNAct(oc, 7, 2, padding=3, dtype=self.dtype, name="conv1")(x, train)
        x1 = x
        x2 = EncoderBottleneck(oc * 2, dtype=self.dtype, name="encoder1")(x1, train)
        x3 = EncoderBottleneck(oc * 4, dtype=self.dtype, name="encoder2")(x2, train)
        x4 = EncoderBottleneck(oc * 8, dtype=self.dtype, name="encoder3")(x3, train)
        vit_dim = self.img_dim // self.patch_dim
        x4 = BottleneckViT(
            oc * 8, self.head_num, self.mlp_dim, self.block_num,
            num_tokens=vit_dim * vit_dim, dtype=self.dtype, name="vit",
        )(x4, deterministic=not train)
        x4 = ConvBNAct(512, 3, 1, dtype=self.dtype, name="conv2")(x4, train)
        return x4, x1, x2, x3


class DecoderBottleneck(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        if skip is not None:
            x = jnp.concatenate([skip, x], axis=-1)
        x = ConvBNAct(self.out_channels, 3, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNAct(self.out_channels, 3, dtype=self.dtype, name="conv2")(x, train)
        return x


class TransUNetCD(nn.Module):
    out_channels: int = 128
    head_num: int = 4
    mlp_dim: int = 512
    block_num: int = 8
    patch_dim: int = 16
    num_classes: int = 3
    siamese: bool = False
    img_dim: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pre, post, train: bool = False):
        kw = dict(
            out_channels=self.out_channels, head_num=self.head_num, mlp_dim=self.mlp_dim,
            block_num=self.block_num, patch_dim=self.patch_dim, img_dim=pre.shape[1], dtype=self.dtype,
        )
        if self.siamese:
            enc = TransUNetEncoder(**kw, name="encoder")
            pre_feats, post_feats = enc(pre, train), enc(post, train)
        else:
            pre_feats = TransUNetEncoder(**kw, name="encoder1")(pre, train)
            post_feats = TransUNetEncoder(**kw, name="encoder2")(post, train)
        x, x1, x2, x3 = [jnp.concatenate([a, b], axis=-1) for a, b in zip(pre_feats, post_feats)]
        oc = self.out_channels * 2
        x = DecoderBottleneck(oc * 2, dtype=self.dtype, name="decoder1")(x, x3, train)
        x = DecoderBottleneck(oc, dtype=self.dtype, name="decoder2")(x, x2, train)
        x = DecoderBottleneck(oc // 2, dtype=self.dtype, name="decoder3")(x, x1, train)
        x = DecoderBottleneck(oc // 8, dtype=self.dtype, name="decoder4")(x, None, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(x)
        return out.astype(jnp.float32)
