"""ChangeFormerV6: SegFormer-style hierarchical siamese change detection
(Bandara & Patel, IGARSS 2022).

Parity with `/root/reference/models/changeformer.py:338-675`:
  * encoder: 4 stages, overlap patch embeds (k7/s4 then k3/s2), efficient
    attention with spatial-reduction ratios [8,4,2,1], Mix-FFN (MLP with a
    3x3 depthwise conv between fc1 and GELU), depths [3,3,4,3],
    dims [64,128,320,512], heads [1,2,4,8], LayerNorm eps 1e-6, stochastic
    depth (linear 0 -> 0.1), dropout 0.1;
  * decoder: per-stage linear embed to embed_dim, conv_diff on concatenated
    bi-temporal features with progressive 2x bilinear accumulation,
    per-stage prediction heads (deep supervision), linear fuse, 2x
    ConvTranspose(k4/s2/p1) + residual blocks, final 3x3 head;
  * returns a LIST of 5 multi-scale predictions (trainer consumes
    outputs[-1] or a weighted sum — steps._combine_multiscale);
  * decoder_softmax=True applies SIGMOID (the reference's `active` is
    nn.Sigmoid despite the flag name — replicated);
  * reference ResidualBlock computes conv1 twice and discards the first
    result (changeformer.py:469-474) — we keep the effective computation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_bn import BatchNorm as FusedBatchNorm
from einops import rearrange

from ..ops.attention import attention_packed
from ..ops.nn import TorchConvTranspose, resize_bilinear


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


class OverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size), strides=self.stride,
            padding=[(p, p), (p, p)], dtype=self.dtype, name="proj",
        )(x)
        h, w = x.shape[1:3]
        x = rearrange(x, "b h w c -> b (h w) c")
        # torch default eps (the 1e-6 partial applies only to block norms)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, h, w


class EfficientAttention(nn.Module):
    """Spatial-reduction attention: kv computed on an sr_ratio-downsampled map."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            xs = rearrange(x, "b (h w) c -> b h w c", h=h)
            xs = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio), strides=self.sr_ratio,
                dtype=self.dtype, name="sr",
            )(xs)
            xs = rearrange(xs, "b h w c -> b (h w) c")
            xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xs)
        else:
            xs = x
        kv = nn.Dense(self.dim * 2, use_bias=True, dtype=self.dtype, name="kv")(xs)
        k, v = jnp.split(kv, 2, axis=-1)
        # packed (B, N, H*D) path: no physical head transpose; the short
        # Pallas kernel applies on TPU where dim%128==0 (stages 2/4)
        out = attention_packed(q, k, v, self.num_heads, scale=head_dim**-0.5)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _tail_chunk_count(requested: int, batch: int) -> int:
    """Largest divisor of `batch` that is <= `requested` (>= 1).

    An explicitly requested chunk count that doesn't divide the batch
    degrades to the nearest usable divisor — exactness holds for any
    divisor, and silently falling all the way to 1 would reintroduce the
    b128 HBM OOM the chunked tail exists to fix (docs/performance.md r5)."""
    nc = max(1, min(requested, batch))
    while nc > 1 and batch % nc != 0:
        nc -= 1
    return nc


class MixFFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        xs = rearrange(x, "b (h w) c -> b h w c", h=h)
        xs = nn.Conv(
            self.hidden, (3, 3), padding=1, feature_group_count=self.hidden,
            dtype=self.dtype, name="dwconv",
        )(xs)
        x = rearrange(xs, "b h w c -> b (h w) c")
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class EncoderBlock(nn.Module):
    """remat_ffn: Mix-FFN's backward otherwise saves two (B, N, dim*ratio)
    hidden temps (fc1 out and the dwconv out feeding GELU) — at b128 stage 1
    that is 196 MB each across 3 blocks x 2 siamese passes, the dominant
    HBM term after the decoder-tail fix (docs/performance.md r5). Remat
    keeps only the (B, N, dim) input and recomputes the two cheap matmuls
    plus the depthwise conv in backward. "auto" enables it in training when
    the hidden tensor reaches ~51M elements (b >= 64 at stage 1 / b >= 128
    at stage 2); True/False force it (exactness pinned by test)."""

    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    drop_path: float
    remat_ffn: Any = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = EfficientAttention(self.dim, self.num_heads, self.sr_ratio, self.dtype, name="attn")(
            y, h, w, deterministic
        )
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        use_remat = self.remat_ffn
        if not isinstance(use_remat, bool):
            hidden_elems = x.shape[0] * x.shape[1] * self.dim * self.mlp_ratio
            use_remat = (not deterministic) and hidden_elems >= 51_000_000

        def ffn(mdl, y):
            return MixFFN(mdl.dim, mdl.dim * mdl.mlp_ratio, mdl.dtype, name="mlp")(
                y, h, w, deterministic
            )

        y = (nn.remat(ffn) if use_remat else ffn)(self, y)
        return x + dp(y, deterministic)


class EncoderTransformerV3(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 3, 4, 3)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    # ChangeFormerV6 passes patch_size=7 to EVERY stage's overlap embed
    # (changeformer.py:664: EncoderTransformer_v3(..., patch_size=7)), not
    # the encoder class's 3 default.
    patch_size: int = 7
    drop_path_rate: float = 0.1
    remat_ffn: Any = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        cur = 0
        for s in range(4):
            patch = 7 if s == 0 else self.patch_size
            stride = 4 if s == 0 else 2
            x_tok, h, w = OverlapPatchEmbed(
                patch, stride, self.embed_dims[s], self.dtype, name=f"patch_embed{s + 1}"
            )(x)
            for i in range(self.depths[s]):
                x_tok = EncoderBlock(
                    self.embed_dims[s], self.num_heads[s], self.mlp_ratios[s],
                    self.sr_ratios[s], dpr[cur + i], self.remat_ffn, self.dtype,
                    name=f"block{s + 1}_{i}",
                )(x_tok, h, w, det)
            cur += self.depths[s]
            x_tok = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{s + 1}")(x_tok)
            x = rearrange(x_tok, "b (h w) c -> b h w c", h=h)
            outs.append(x)
        return outs


class ConvDiff(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        return nn.relu(x)


class MakePrediction(nn.Module):
    """make_prediction (changeformer.py:41-47): the FIRST conv projects to
    out_channels; BN and the second conv operate at out_channels width."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = FusedBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)


class ResidualBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x))
        y = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y) * 0.1
        return x + y


class DecoderTransformerV3(nn.Module):
    """tail_chunks: the post-fuse_bn upsampling tail (convd2x -> dense_2x ->
    convd1x -> dense_1x -> change_probability) produces three bf16
    [B,224,224,256]-class temps (3.06 GB each at b128) whose saved residuals
    OOM the 16 GB chip in training (measured 16.83G vs 15.75G,
    docs/performance.md r5). The tail has no BatchNorm and no
    train-dependent op, so it is exactly per-sample: we scan it over
    `tail_chunks` batch chunks with per-chunk remat, capping live tail
    memory at one chunk plus the 56^2 input. 0 = auto (8 chunks when
    training with batch >= 64 and divisible by 8). A single nn.remat over
    the whole tail is WORSE (19.37G): one backward scope holds all three
    224^2 recomputes live at once. Param names are unchanged (function-level
    lifted scan with variable_broadcast), so converted checkpoints load
    identically either way."""

    embedding_dim: int = 256
    num_classes: int = 3
    decoder_softmax: bool = True
    tail_chunks: int = 0
    dtype: Any = jnp.float32

    def _tail(self, x):
        ed = self.embedding_dim
        x = TorchConvTranspose(ed, 4, 2, 1, dtype=self.dtype, name="convd2x")(x)
        x = ResidualBlock(self.dtype, name="dense_2x")(x)
        x = TorchConvTranspose(ed, 4, 2, 1, dtype=self.dtype, name="convd1x")(x)
        x = ResidualBlock(self.dtype, name="dense_1x")(x)
        return nn.Conv(
            self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="change_probability"
        )(x)

    @nn.compact
    def __call__(self, f1, f2, train: bool = False):
        ed = self.embedding_dim
        outputs = []
        c1_size = f1[0].shape[1:3]
        acc = None
        ups = []
        for s in (3, 2, 1, 0):
            lin = nn.Dense(ed, dtype=self.dtype, name=f"linear_c{s + 1}")
            a, b = lin(f1[s]), lin(f2[s])
            d = ConvDiff(ed, self.dtype, name=f"diff_c{s + 1}")(
                jnp.concatenate([a, b], axis=-1), train
            )
            if acc is not None:
                acc2x = resize_bilinear(acc, (acc.shape[1] * 2, acc.shape[2] * 2))
                d = d + acc2x
            acc = d
            p = MakePrediction(self.num_classes, self.dtype, name=f"make_pred_c{s + 1}")(d, train)
            outputs.append(p)
            ups.append(resize_bilinear(d, c1_size) if d.shape[1:3] != c1_size else d)
        # ups was appended in s = 3..0 order, which IS the reference's
        # cat((_c4_up, _c3_up, _c2_up, _c1)) order (changeformer.py:601)
        fused = jnp.concatenate(ups, axis=-1)
        fused = nn.Conv(ed, (1, 1), dtype=self.dtype, name="linear_fuse")(fused)
        fused = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="fuse_bn"
        )(fused)
        b = fused.shape[0]
        nc = self.tail_chunks
        if nc == 0:
            nc = 8 if (train and b >= 64 and b % 8 == 0) else 1
        nc = _tail_chunk_count(nc, b)
        if nc > 1:
            xs = fused.reshape(nc, b // nc, *fused.shape[1:])

            def tail_step(mdl, carry, xc):
                return carry, DecoderTransformerV3._tail(mdl, xc)

            scanned = nn.scan(
                nn.remat(tail_step, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            _, cp = scanned(self, (), xs)
            cp = cp.reshape(b, *cp.shape[2:])
        else:
            cp = self._tail(fused)
        outputs.append(cp)
        outputs = [o.astype(jnp.float32) for o in outputs]
        if self.decoder_softmax:
            outputs = [nn.sigmoid(o) for o in outputs]
        return outputs


class ChangeFormerV6(nn.Module):
    embed_dim: int = 256
    num_classes: int = 3
    decoder_softmax: bool = True
    tail_chunks: int = 0
    remat_ffn: Any = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        enc = EncoderTransformerV3(remat_ffn=self.remat_ffn, dtype=self.dtype, name="Tenc_x2")
        f1, f2 = enc(x1, train), enc(x2, train)
        return DecoderTransformerV3(
            self.embed_dim, self.num_classes, self.decoder_softmax,
            self.tail_chunks, self.dtype, name="TDec_x2"
        )(f1, f2, train)
