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
  * per-step block attention runs through ops.attention, so on-device blocks
    that are themselves long use the Pallas flash kernel;
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


def ring_attention_p(q, k, v, axis_name: str, scale: float | None = None):
    """Per-device body (inside shard_map): q/k/v are the LOCAL sequence
    shards (B, H, n, D). Returns the local (B, H, n, D) output shard."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

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
        # rotate k/v to the next device in the ring (skipped after last use)
        perm = [(j, (j + 1) % p) for j in range(p)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return acc, m_new, l_new, kb, vb

    # carries derived from qf so they carry the same device-varying type
    # annotation under shard_map (plain zeros are "unvarying" and fail the
    # scan carry type check)
    acc0 = jnp.zeros_like(qf)
    m0 = qf[..., :1] * 0.0 - 1e30
    l0 = qf[..., :1] * 0.0
    acc, m_run, l_run, _, _ = jax.lax.fori_loop(0, p, step, (acc0, m0, l0, k, v))
    return (acc / jnp.maximum(l_run, 1e-30)).astype(q.dtype)


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
    )
    return fn(q, k, v)
