"""MAE wrapper over the ViT encoder (FloodViT pretraining).

Semantics parity with `/root/reference/models/mae.py:9-124` (lucidrains MAE):
  * masking: per-sample argsort of uniform noise; first `num_masked` indices
    masked (num_masked = int(ratio * num_patches));
  * encoder runs on KEPT tokens only (75% compute saving — this is what makes
    MAE fast, preserved here with static shapes: num_masked is a Python int);
  * linear enc->dec projection, learned mask token, decoder pos-emb as an
    Embedding table indexed by patch position;
  * small decoder transformer over the FULL token grid (scatter of encoded +
    mask tokens by position);
  * MSE on masked patches only.

TPU-native notes: gathers use jnp.take_along_axis (static shapes); the
scatter into the decoder grid is a one_hot matmul-free scatter via
`.at[].set` with batched indices, which XLA lowers to an efficient
dynamic-update; everything is jit/pjit-compatible with an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_ln import LayerNorm as FusedLayerNorm

from .vit import Transformer, ViT, patchify


class MAE(nn.Module):
    encoder: ViT
    decoder_dim: int = 512
    masking_ratio: float = 0.75
    decoder_depth: int = 8
    decoder_heads: int = 16
    decoder_dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, rng: jax.Array | None = None):
        if rng is None:
            rng = self.make_rng("mask")
        enc = self.encoder
        patch = enc.patch_size
        tokens = enc.embed_image(img)  # (B, N, dim) — no 6-D patch transpose
        b, num_patches, _ = tokens.shape
        patch_dim = patch * patch * img.shape[-1]
        num_masked = int(self.masking_ratio * num_patches)
        # reconstruction TARGETS: patchify in the compute dtype (identity
        # data movement — casting before or after yields the same values,
        # and take() already cast to tokens.dtype); forward-only, no params
        patches = patchify(img.astype(tokens.dtype), patch)
        if enc.pool == "cls":
            tokens = tokens + enc.pos_embedding[:, 1 : num_patches + 1].astype(tokens.dtype)
        else:
            tokens = tokens + enc.pos_embedding.astype(tokens.dtype)

        # argsort-of-uniform masking (mae.py:72-77)
        noise = jax.random.uniform(rng, (b, num_patches))
        rand_indices = jnp.argsort(noise, axis=-1)
        masked_indices = rand_indices[:, :num_masked]
        unmasked_indices = rand_indices[:, num_masked:]

        # token select/scatter as one-hot matmuls: take_along_axis/.at[].set
        # lower to serial gathers/scatters on TPU; the one-hot contraction is
        # a small MXU matmul (selection matrices are (k, N) with N=196)
        masked_sel = jax.nn.one_hot(masked_indices, num_patches, dtype=tokens.dtype)  # (B, M, N)
        unmasked_sel = jax.nn.one_hot(unmasked_indices, num_patches, dtype=tokens.dtype)  # (B, K, N)
        take = lambda t, sel: jnp.einsum("bkn,bnd->bkd", sel, t)
        kept_tokens = take(tokens, unmasked_sel)
        masked_patches = take(patches.astype(tokens.dtype), masked_sel)

        encoded = enc.transformer(kept_tokens)

        if enc.dim != self.decoder_dim:
            decoder_tokens_kept = nn.Dense(self.decoder_dim, dtype=self.dtype, name="enc_to_dec")(encoded)
        else:
            decoder_tokens_kept = encoded

        decoder_pos_emb = nn.Embed(
            num_patches, self.decoder_dim, dtype=self.dtype, name="decoder_pos_emb"
        )
        mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (self.decoder_dim,), jnp.float32
        )

        # position lookups via the SAME one-hot selections: an Embed gather's
        # backward is a scatter-add (serial dynamic-update-slice loops on TPU,
        # ~1.9 ms/step in the r3 profile); the einsum's backward is an MXU
        # matmul. decoder_pos_emb stays an nn.Embed so the checkpoint path
        # (decoder_pos_emb/embedding) is unchanged.
        pos_table = decoder_pos_emb.embedding.astype(self.dtype)  # (N, dec_dim)
        pos_for = lambda sel: jnp.einsum("bkn,nd->bkd", sel.astype(self.dtype), pos_table)
        decoder_tokens_kept = decoder_tokens_kept + pos_for(unmasked_sel)
        mask_tokens = (
            jnp.broadcast_to(mask_token.astype(self.dtype), (b, num_masked, self.decoder_dim))
            + pos_for(masked_sel)
        )

        # scatter back to grid positions via the transposed selections
        # (each grid slot receives exactly one token, so the sum IS the scatter)
        grid = jnp.einsum("bkn,bkd->bnd", unmasked_sel.astype(decoder_tokens_kept.dtype), decoder_tokens_kept)
        grid = grid + jnp.einsum("bkn,bkd->bnd", masked_sel.astype(mask_tokens.dtype), mask_tokens)

        decoded = Transformer(
            self.decoder_dim,
            self.decoder_depth,
            self.decoder_heads,
            self.decoder_dim_head,
            self.decoder_dim * 4,
            self.dtype,
            name="decoder",
        )(grid)

        decoded_masked = take(decoded, masked_sel.astype(decoded.dtype))
        pred_pixels = nn.Dense(patch_dim, dtype=self.dtype, name="to_pixels")(decoded_masked)

        recon_loss = jnp.mean(
            (pred_pixels.astype(jnp.float32) - masked_patches.astype(jnp.float32)) ** 2
        )
        return recon_loss
