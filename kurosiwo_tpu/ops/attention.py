"""Attention for the transformer zoo.

One attention implementation is written once and reused by ViT/MAE, BiT-CD,
ChangeFormer and TransUNet-CD (the reference re-implements it in each file).

Two execution paths, selected by sequence length:
  * short sequences (ViT's 197 tokens, BiT's 4+HW tokens): plain XLA einsum
    attention — at these sizes XLA fuses QK^T -> softmax -> PV efficiently and
    a Pallas kernel adds nothing.
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
