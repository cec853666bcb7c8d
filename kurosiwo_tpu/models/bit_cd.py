"""BiT-CD: Bitemporal Image Transformer change detection (Chen et al. 2021).

Parity with `/root/reference/models/bit_cd.py`:
  * dilated resnet18 trunk (stages 3-4 replaced with dilation -> 1/8 output),
    2x nearest upsample, 3x3 conv to a 32-channel feature map
    (ResNet.forward_single, bit_cd.py:788-800);
  * spatial-attention semantic tokenizer: 1x1 conv -> softmax over pixels ->
    token = attention-weighted feature sum (bit_cd.py:854-862);
  * shared token transformer over cat(tokens1, tokens2) with learned pos-emb;
  * per-frame transformer decoder: pixels attend to the frame's tokens
    (cross attention, scale = dim**-0.5 with dim=32 — a reference quirk:
    the scale uses the MODEL dim, not dim_head; replicated);
  * abs feature differencing -> 4x bilinear upsample -> two-layer conv head;
  * `net_G="base_resnet18"` (the shipped config) skips the transformer
    entirely: diff of the 32-ch maps -> upsample -> head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from einops import rearrange

from ..ops.attention import attention_packed
from ..ops.nn import ConvBNAct, resize_bilinear, resize_nearest, upsample2x
from .resnet import ResNetEncoder


class TwoLayerConvHead(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = ConvBNAct(c, 3, dtype=self.dtype)(x, train)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)


class _Attention(nn.Module):
    """Self-attention with the reference's dim**-0.5 scaling (not dim_head)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # packed (B, N, H*D) path: head split/merge are free reshapes and the
        # short-sequence Pallas kernel applies on TPU (ops/attention.py)
        out = attention_packed(q, k, v, self.heads, scale=self.dim**-0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class _CrossAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, m):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(m)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(m)
        if self.softmax:
            out = attention_packed(q, k, v, self.heads, scale=self.dim**-0.5)
        else:
            # decoder_softmax=False path: raw (unnormalized) attention
            sp = lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads)
            dots = jnp.einsum("bhid,bhjd->bhij", sp(q), sp(k)) * (self.dim**-0.5)
            out = jnp.einsum("bhij,bhjd->bhid", dots, sp(v))
            out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class _FeedForward(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class TokenTransformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm_attn_{i}")(x)
            x = _Attention(self.dim, self.heads, self.dim_head, self.dtype, name=f"attn_{i}")(h) + x
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm_ff_{i}")(x)
            x = _FeedForward(self.dim, self.mlp_dim, self.dtype, name=f"ff_{i}")(h) + x
        return x


class TokenDecoder(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, m):
        # PreNorm2 normalizes query and memory with the SAME LayerNorm params
        for i in range(self.depth):
            ln = nn.LayerNorm(dtype=self.dtype, name=f"norm_attn_{i}")
            x = _CrossAttention(
                self.dim, self.heads, self.dim_head, self.softmax, self.dtype, name=f"attn_{i}"
            )(ln(x), ln(m)) + x
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm_ff_{i}")(x)
            x = _FeedForward(self.dim, self.mlp_dim, self.dtype, name=f"ff_{i}")(h) + x
        return x


class BiTBackbone(nn.Module):
    """Dilated resnet trunk -> 2x upsample -> 32-ch conv feature (1/4 res)."""

    backbone: str = "resnet18"
    resnet_stages_num: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetEncoder(
            self.backbone, dilations=(False, True, True), clamp_basic_dilation=True,
            dtype=self.dtype, name="resnet",
        )(x, train)
        # feats: [input, stem(/2), layer1(/4), layer2(/8), layer3(/8 dil),
        # layer4(/8 dil)]; resnet_stages_num selects how deep to go.
        y = feats[self.resnet_stages_num]  # /8 (stages 3-4 dilated)
        y = upsample2x(y, "nearest")
        y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conv_pred")(y)
        return y


class BiTResNet(nn.Module):
    """net_G='base_resnet18': plain siamese diff, no transformer."""

    num_classes: int = 3
    backbone: str = "resnet18"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        bb = BiTBackbone(self.backbone, dtype=self.dtype, name="backbone")
        f1, f2 = bb(x1, train), bb(x2, train)
        d = jnp.abs(f1 - f2)
        d = resize_bilinear(d, (d.shape[1] * 4, d.shape[2] * 4))
        out = TwoLayerConvHead(self.num_classes, dtype=self.dtype, name="classifier")(d, train)
        return out.astype(jnp.float32)


class BiTTransformer(nn.Module):
    """BASE_Transformer variants (token_len tokens, learned pos-emb)."""

    num_classes: int = 3
    token_len: int = 4
    enc_depth: int = 1
    dec_depth: int = 8
    dim_head: int = 64
    decoder_dim_head: int = 64
    resnet_stages_num: int = 4
    backbone: str = "resnet18"
    decoder_softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        dim = 32
        bb = BiTBackbone(self.backbone, self.resnet_stages_num, dtype=self.dtype, name="backbone")
        f1, f2 = bb(x1, train), bb(x2, train)

        conv_a = nn.Conv(self.token_len, (1, 1), use_bias=False, dtype=self.dtype, name="conv_a")

        def tokens_of(f):
            att = conv_a(f)  # (B, H, W, L)
            att = rearrange(att, "b h w l -> b l (h w)")
            att = jax.nn.softmax(att, axis=-1)
            flat = rearrange(f, "b h w c -> b (h w) c")
            return jnp.einsum("bln,bnc->blc", att, flat)

        t1, t2 = tokens_of(f1), tokens_of(f2)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, self.token_len * 2, dim), jnp.float32
        )
        tokens = jnp.concatenate([t1, t2], axis=1) + pos.astype(f1.dtype)
        tokens = TokenTransformer(
            dim, self.enc_depth, 8, self.dim_head, 2 * dim, self.dtype, name="transformer"
        )(tokens)
        t1, t2 = jnp.split(tokens, 2, axis=1)

        dec = TokenDecoder(
            dim, self.dec_depth, 8, self.decoder_dim_head, 2 * dim, self.decoder_softmax,
            self.dtype, name="transformer_decoder",
        )

        def decode(f, t):
            h = f.shape[1]
            x = rearrange(f, "b h w c -> b (h w) c")
            x = dec(x, t)
            return rearrange(x, "b (h w) c -> b h w c", h=h)

        f1, f2 = decode(f1, t1), decode(f2, t2)
        d = jnp.abs(f1 - f2)
        d = resize_bilinear(d, (d.shape[1] * 4, d.shape[2] * 4))
        out = TwoLayerConvHead(self.num_classes, dtype=self.dtype, name="classifier")(d, train)
        return out.astype(jnp.float32)


def build_bit_cd(model_config: dict, num_classes: int = 3, dtype=jnp.float32):
    """define_G parity (bit_cd.py:686-707)."""
    net_g = model_config.get("net_G", "base_resnet18")
    if net_g == "base_resnet18":
        return BiTResNet(num_classes=num_classes, dtype=dtype)
    if net_g == "base_transformer_pos_s4":
        # reference BASE_Transformer defaults: enc_depth=1, dec_depth=1
        return BiTTransformer(
            num_classes=num_classes, token_len=4, resnet_stages_num=4,
            enc_depth=1, dec_depth=1, dtype=dtype,
        )
    if net_g == "base_transformer_pos_s4_dd8":
        return BiTTransformer(
            num_classes=num_classes, token_len=4, resnet_stages_num=4, enc_depth=1, dec_depth=8, dtype=dtype
        )
    if net_g == "base_transformer_pos_s4_dd8_dedim8":
        return BiTTransformer(
            num_classes=num_classes, token_len=4, resnet_stages_num=4, enc_depth=1,
            dec_depth=8, decoder_dim_head=8, dtype=dtype,
        )
    raise NotImplementedError(f"Generator model name [{net_g}] is not recognized")
