"""Attention for the transformer zoo.

One attention implementation is written once and reused by ViT/MAE, BiT-CD,
ChangeFormer and TransUNet-CD (the reference re-implements it in each file).

Three execution paths, selected by sequence length and shape:
  * short sequences on TPU (ViT's 49-197 tokens, BiT/ChangeFormer grids)
    with D in {32,64,128} and (H*D)%128==0: the packed-layout Pallas kernel
    (pallas_attention.short_attention) — no head transpose ever
    materializes, softmax stays in VMEM; measured +19.3% on MAE ViT-L b64.
  * other short shapes / non-TPU backends: plain XLA einsum attention.
  * long sequences (whole-scene SAR mosaics, thousands of patches): a Pallas
    flash-attention kernel (kurosiwo_tpu.ops.pallas_attention) that never
    materializes the (N, N) score matrix in HBM.

Reference counterparts: /root/reference/models/vision_transformer.py:35-66,
models/bit_cd.py:476-604, models/changeformer.py:148-209.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 1024


def _use_short_kernel() -> bool:
    """Packed-layout short-sequence Pallas attention (pallas_attention.py):
    TPU-only, default ON (kill switch KUROSIWO_SHORT_ATTN=0 for A/B);
    measured +19.3% on MAE ViT-L b64. Multi-device meshes go through the
    kernel's batch-dim custom_partitioning rule (each shard runs the local
    grid; mesh-tested on the virtual 8-device CPU mesh)."""
    import os

    if os.environ.get("KUROSIWO_SHORT_ATTN") == "0":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


def _pick_block(n: int, want: int = 256) -> int | None:
    """Largest 128-multiple block <= want that divides n (TPU lane tiling);
    None when n has no such divisor — caller falls back to XLA attention."""
    b = min(want, n)
    b -= b % 128
    while b >= 128:
        if n % b == 0:
            return b
        b -= 128
    return None


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention on (B, H, N, D) tensors; returns (B, H, N, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_flash is None:
        use_flash = (
            q.shape[-2] >= _FLASH_MIN_SEQ
            and k.shape[-2] >= _FLASH_MIN_SEQ
            and _pick_block(q.shape[-2]) is not None
            and _pick_block(k.shape[-2]) is not None
        )
    if use_flash:
        from .pallas_attention import flash_attention

        # block sweep on v5e (N=4096, d=64): (256, 1024) is fastest of the
        # VMEM-fitting configs (35.8 TF/s vs 29.8 at (256, 512))
        bq = _pick_block(q.shape[-2])
        bk = _pick_block(k.shape[-2], want=1024)
        return flash_attention(q, k, v, scale, bq, bk)
    acc_dtype = jnp.float32
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=acc_dtype) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(q.dtype), v, preferred_element_type=acc_dtype)
    return out.astype(q.dtype)


def attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention on packed (B, N, H*D) tensors -> (B, N, H*D).

    Head split/merge are free reshapes of the qkv projection's output —
    the einsums carry the head axis as a non-major batch dimension, so the
    physical ``b n (h d) -> b h n d`` transposes (one per q/k/v/out per
    layer, standalone relayout fusions in the r3 ViT-L b64 profile) never
    materialize. Long sequences still route to the flash kernel, which
    needs the (B, H, N, D) layout — there the transpose is amortized over
    an O(N^2) kernel and irrelevant.
    """
    b, n, inner = q.shape
    d = inner // heads
    if scale is None:
        scale = d**-0.5
    if use_flash is None:
        use_flash = (
            n >= _FLASH_MIN_SEQ
            and k.shape[1] >= _FLASH_MIN_SEQ
            and _pick_block(n) is not None
            and _pick_block(k.shape[1]) is not None
        )
    split = lambda t: t.reshape(b, t.shape[1], heads, d)
    if use_flash:
        to_bhnd = lambda t: split(t).transpose(0, 2, 1, 3)
        out = attention(to_bhnd(q), to_bhnd(k), to_bhnd(v), scale, use_flash=True)
        return out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    if d in (32, 64, 128) and inner % 128 == 0 and _use_short_kernel():
        from .pallas_attention import short_attention

        return short_attention(q, k, v, heads, scale)
    acc_dtype = jnp.float32
    scores = jnp.einsum("bnhd,bmhd->bhnm", split(q), split(k), preferred_element_type=acc_dtype) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(q.dtype), split(v), preferred_element_type=acc_dtype)
    return out.astype(q.dtype).reshape(b, n, inner)
