"""Ring attention: context-parallel attention over a mesh axis.

SURVEY.md §5.7 / §2.10 (SP row): the reference's max sequence is 197 tokens,
so it has no long-context mechanism at all. For whole-scene SAR mosaics the
patch-token sequence grows with scene area (a 3584x3584 scene is 50k tokens
— beyond one chip's comfortable attention footprint), so the TPU-native
design shards the SEQUENCE over a mesh axis and rotates key/value blocks
around the ring with `jax.lax.ppermute` (XLA lowers neighbor permutes onto
ICI links):

  * each device holds its (B, H, N/P, D) query shard and a rotating k/v
    block; P steps of blockwise attention with a running online-softmax
    (max, sum, acc) carry merge partial results exactly;
  * per-step block attention runs the Pallas flash kernel whenever the
    local shards are >= 1024 tokens and 128-tiled (the (n, m) score matrix
    never materializes in HBM — dense per-step scores at 50k tokens / 8
    devices would be ~2.5 GB); shorter or unaligned shards use a dense
    einsum block;
  * communication is P-1 neighbor permutes of the k/v block — bandwidth
    2*N*D per device total, independent of P, riding ICI not HBM.

`ring_attention` is the shard_map-wrapped public entry; `ring_attention_p`
is the per-device collective body for embedding in larger shard_map programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _rotate(x, axis_name, p):
    perm = [(j, (j + 1) % p) for j in range(p)]
    return jax.lax.ppermute(x, axis_name, perm)


def _flash_blocks(n: int, m: int) -> tuple[int, int] | None:
    """Flash block sizes for the per-ring-step attention, or None when the
    local shards don't satisfy the kernel's 128-tiling (fall back to the
    dense-block path). Flash only pays — and only avoids the O(n*m) score
    materialization that matters — at long local sequences."""
    from .attention import _FLASH_MIN_SEQ, _pick_block
    from .backend import is_tpu_backend

    if not is_tpu_backend():
        return None
    if n < _FLASH_MIN_SEQ or m < _FLASH_MIN_SEQ:
        return None
    bq, bk = _pick_block(n), _pick_block(m, want=1024)
    # third element: interpret mode (False on hardware; tests pass True to
    # drive the flash ring path on the CPU mesh)
    return (bq, bk, False) if bq and bk else None


def _ring_impl(q, k, v, axis_name: str, scale: float, blocks=None):
    """Forward online-softmax ring pass. Returns (out, lse) where lse is the
    per-query log-sum-exp (B, H, n, 1) — the flash-attention residual that
    makes the O(n_local)-memory backward pass possible.

    When the local shards are long enough (see _flash_blocks), each ring
    step runs the Pallas flash kernel — the (n, m) score matrix never
    materializes in HBM (at 50k tokens over 8 devices a dense block scores
    buffer would be ~2.5 GB per step) — and normalized partials are merged
    via logaddexp. Short/unaligned shards keep the dense einsum block."""
    p = jax.lax.psum(1, axis_name)

    if blocks is not None:
        from .pallas_attention import _flash_fwd

        bq, bk, interp = blocks

        def step(i, carry):
            acc, lse_run, kb, vb = carry
            o_blk, lse_blk = _flash_fwd(q, kb, vb, scale, bq, bk, interp)
            lse_blk = lse_blk[..., None]  # (B,H,n,1)
            lse_new = jnp.logaddexp(lse_run, lse_blk)
            acc = acc * jnp.exp(lse_run - lse_new) + o_blk.astype(jnp.float32) * jnp.exp(
                lse_blk - lse_new
            )
            kb = _rotate(kb, axis_name, p)
            vb = _rotate(vb, axis_name, p)
            return acc, lse_new, kb, vb

        acc0 = jnp.zeros(q.shape, jnp.float32) + q[..., :1].astype(jnp.float32) * 0.0
        lse0 = q[..., :1].astype(jnp.float32) * 0.0 - 1e30
        acc, lse, _, _ = jax.lax.fori_loop(0, p, step, (acc0, lse0, k, v))
        return acc.astype(q.dtype), lse

    qf = q.astype(jnp.float32) * scale

    def block(qf, kb, vb):
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kb.astype(jnp.float32))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.einsum("bhnm,bhmd->bhnd", e, vb.astype(jnp.float32))
        return m, l, o

    def step(i, carry):
        acc, m_run, l_run, kb, vb = carry
        m_blk, l_blk, o_blk = block(qf, kb, vb)
        m_new = jnp.maximum(m_run, m_blk)
        a = jnp.exp(m_run - m_new)
        b = jnp.exp(m_blk - m_new)
        acc = acc * a + o_blk * b
        l_new = l_run * a + l_blk * b
        # rotate k/v to the next device in the ring; after p steps each block
        # is back on its home device
        kb = _rotate(kb, axis_name, p)
        vb = _rotate(vb, axis_name, p)
        return acc, m_new, l_new, kb, vb

    # carries derived from qf so they carry the same device-varying type
    # annotation under shard_map (plain zeros are "unvarying" and fail the
    # scan carry type check)
    acc0 = jnp.zeros_like(qf)
    m0 = qf[..., :1] * 0.0 - 1e30
    l0 = qf[..., :1] * 0.0
    acc, m_run, l_run, _, _ = jax.lax.fori_loop(0, p, step, (acc0, m0, l0, k, v))
    l_safe = jnp.maximum(l_run, 1e-30)
    out = (acc / l_safe).astype(q.dtype)
    lse = m_run + jnp.log(l_safe)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ring_p(q, k, v, axis_name: str, scale: float, blocks=None):
    return _ring_impl(q, k, v, axis_name, scale, blocks)[0]


def _ring_p_fwd(q, k, v, axis_name, scale, blocks):
    out, lse = _ring_impl(q, k, v, axis_name, scale, blocks)
    return out, (q, k, v, out, lse)


def _ring_p_bwd(axis_name, scale, blocks, res, do):
    if blocks is not None:
        return _ring_bwd_flash(axis_name, scale, blocks, res, do)
    return _ring_bwd_dense(axis_name, scale, res, do)


def _ring_bwd_flash(axis_name, scale, blocks, res, do):
    """Flash-kernel ring backward: lse/delta are GLOBAL (merged over the
    whole ring in the forward), so each rotating k/v block's gradients come
    straight from the flash backward kernels with those residuals — the
    (n, m) probability matrix never materializes."""
    from .pallas_attention import flash_bwd

    q, k, v, o, lse = res
    bq, bk, interp = blocks
    p = jax.lax.psum(1, axis_name)
    dof = do.astype(jnp.float32)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (B,H,n)
    lse3 = lse[..., 0]

    def step(i, carry):
        dq, dkb, dvb, kb, vb = carry
        dq_blk, dk_blk, dv_blk = flash_bwd(q, kb, vb, do, lse3, delta, scale, bq, bk, interp)
        dq = dq + dq_blk.astype(jnp.float32)
        dkb = dkb + dk_blk.astype(jnp.float32)
        dvb = dvb + dv_blk.astype(jnp.float32)
        dkb = _rotate(dkb, axis_name, p)
        dvb = _rotate(dvb, axis_name, p)
        kb = _rotate(kb, axis_name, p)
        vb = _rotate(vb, axis_name, p)
        return dq, dkb, dvb, kb, vb

    dq0 = jnp.zeros(q.shape, jnp.float32) + q[..., :1].astype(jnp.float32) * 0.0
    dk0 = jnp.zeros(k.shape, jnp.float32) + q[..., :1, :1].astype(jnp.float32) * 0.0
    dv0 = jnp.zeros(v.shape, jnp.float32) + q[..., :1, :1].astype(jnp.float32) * 0.0
    dq, dk, dv, _, _ = jax.lax.fori_loop(0, p, step, (dq0, dk0, dv0, k, v))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _ring_bwd_dense(axis_name, scale, res, do):
    """Second ring pass (flash-attention backward): probabilities are
    recomputed from the saved log-sum-exp, and each k/v block's gradient
    rotates along with the block so it arrives home after p steps. Residual
    memory is O(n_local) per device — autodiff through the forward loop
    would instead save every rotated k/v block (O(N) per device, defeating
    context parallelism for training)."""
    q, k, v, o, lse = res
    p = jax.lax.psum(1, axis_name)
    qf = q.astype(jnp.float32) * scale
    dof = do.astype(jnp.float32)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)

    def step(i, carry):
        dq, dkb, dvb, kb, vb = carry
        kf = kb.astype(jnp.float32)
        vf = vb.astype(jnp.float32)
        s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
        pij = jnp.exp(s - lse)
        dvb = dvb + jnp.einsum("bhnm,bhnd->bhmd", pij, dof)
        dp = jnp.einsum("bhnd,bhmd->bhnm", dof, vf)
        ds = pij * (dp - delta)
        dq = dq + jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
        dkb = dkb + jnp.einsum("bhnm,bhnd->bhmd", ds, qf)  # qf carries scale
        dkb = _rotate(dkb, axis_name, p)
        dvb = _rotate(dvb, axis_name, p)
        kb = _rotate(kb, axis_name, p)
        vb = _rotate(vb, axis_name, p)
        return dq, dkb, dvb, kb, vb

    dq0 = jnp.zeros_like(qf)
    dk0 = jnp.zeros(k.shape, jnp.float32) + qf[..., :1, :1] * 0.0  # device-varying zero
    dv0 = jnp.zeros(v.shape, jnp.float32) + qf[..., :1, :1] * 0.0
    dq, dk, dv, _, _ = jax.lax.fori_loop(0, p, step, (dq0, dk0, dv0, k, v))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_p.defvjp(_ring_p_fwd, _ring_p_bwd)


def ring_attention_p(q, k, v, axis_name: str, scale: float | None = None):
    """Per-device body (inside shard_map): q/k/v are the LOCAL sequence
    shards (B, H, n, D). Returns the local (B, H, n, D) output shard.
    Differentiable with O(n_local) residuals (custom two-pass ring vjp)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    blocks = _flash_blocks(q.shape[-2], k.shape[-2])
    return _ring_p(q, k, v, axis_name, scale, blocks)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
    scale: float | None = None,
) -> jnp.ndarray:
    """Context-parallel attention: (B, H, N, D) with N sharded over
    `axis_name`. N must divide by the axis size."""
    from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(ring_attention_p, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        # the flash-block pallas_call cannot annotate varying-mesh-axes on
        # its outputs; correctness is covered by the dense-vs-flash parity
        # test on the 8-device mesh
        check_rep=False,
    )
    return fn(q, k, v)
