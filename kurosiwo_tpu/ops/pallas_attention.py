"""Pallas TPU flash attention (non-causal, fwd + bwd).

The long-sequence path for whole-scene SAR inference (SURVEY.md §5.7): the
reference tiles scenes into 224x224 patches because its attention
materializes (N, N) scores; this kernel never does, so a ViT can attend over
thousands of patch tokens (a full Sentinel-1 scene mosaic) in one pass.

Design (per (batch*heads, q-block) grid cell):
  * q block (block_q, d) resident in VMEM; k/v streamed block-by-block by
    the Pallas pipeline (block_k rows at a time);
  * online softmax with running (max, sum) in f32 scratch; accumulation in
    f32; output cast back to the input dtype;
  * backward = two kernels with the standard flash recomputation:
    dq from (do, k, v, lse, delta); dk/dv from streaming q blocks.

Short sequences (ViT's 197 tokens) stay on the XLA einsum path
(kurosiwo_tpu.ops.attention) — at that size a kernel buys nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k):
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    n = k_ref.shape[1]
    bq, d = q.shape
    num_kv = pl.cdiv(n, block_k)

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)
    lse_ref[0, 0] = (m_i + jnp.log(l_i))[:, 0]


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale, block_k):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    n = k_ref.shape[1]
    bq, d = q.shape
    num_kv = pl.cdiv(n, block_k)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq_ref[0] = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, d), jnp.float32)).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale, block_q):
    k = k_ref[0].astype(jnp.float32)  # (bk, d)
    v = v_ref[0].astype(jnp.float32)
    n = q_ref.shape[1]
    bk, d = k.shape
    num_q = pl.cdiv(n, block_q)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        p = jnp.exp(s - lse)
        dv_new = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(
        0, num_q, body, (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32))
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    nk = k.shape[2]
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, nk, d)
    vf = v.reshape(bh, nk, d)
    grid = (bh, pl.cdiv(n, block_q))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d), lse.reshape(b, h, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head flash attention on (B, H, N, D); returns (B, H, N, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_vjp_bwd(scale, block_q, block_k, interpret, residuals, do):
    q, k, v, out, lse = residuals
    if scale is None:
        scale = q.shape[-1] ** -0.5
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (b,h,n)
    return flash_bwd(q, k, v, do, lse, delta, scale, block_q, block_k, interpret)


def flash_bwd(q, k, v, do, lse, delta, scale, block_q, block_k, interpret=False):
    """Flash backward with caller-supplied (lse, delta) — reused by ring
    attention, where both are GLOBAL (merged over the whole ring) while each
    call sees one rotating k/v block."""
    b, h, n, d = q.shape
    nk = k.shape[2]
    bh = b * h
    qf, kf, vf = (t.reshape(bh, -1, d) for t in (q, k, v))
    dof = do.reshape(bh, n, d)
    lsef = lse.reshape(bh, 1, n)
    deltaf = delta.reshape(bh, 1, n)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k),
        grid=(bh, pl.cdiv(n, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, pl.cdiv(nk, block_k)),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    return dq.reshape(b, h, n, d), dk.reshape(b, h, nk, d), dv.reshape(b, h, nk, d)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Short-sequence attention on the PACKED (B, N, H*D) layout (round 3).
#
# The r3 ViT-L b64 MAE profile attributes ~16 ms/step to decoder attention
# overhead that is structural to XLA's lowering: physical head transposes
# (b n (h d) <-> b h n d, ~6 ms — XLA canonicalizes dot batch dims the same
# way however the einsum is written), materialized (B,H,N,N) softmax
# round-trips (~5.5 ms fwd+bwd), and score/PV relayout fusions. This kernel
# reads q/k/v directly in the packed layout the qkv projection produces —
# each grid cell holds ONE batch element's full (N, H*D) rows and loops the
# heads in-kernel — and keeps scores + softmax in VMEM. No transpose of the
# (B, N, H*D) activations ever materializes in HBM, and the (N, N)
# probabilities never leave VMEM.
#
# Grid sizing matters more than dot sizing here: the first landed version
# used (B, H*D/128) cells (512 for ViT-L b64) and the per-cell pipeline
# overhead swamped the tiny dots — the profiled kernels ran at 8-16 TF/s
# and attention still totalled ~35 ms/step. One cell per batch element
# amortizes that overhead 8x while every dot stays the same shape.
#
# Scope: N small enough that an (N, H*D) row block + (N, N) f32 score tile
# fit VMEM (the ViT/MAE/BiT/ChangeFormer sequences: 49-3136 tokens), D
# dividing 128. Long sequences stay on the flash kernel above.
# ---------------------------------------------------------------------------


def _short_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, d):
    heads = q_ref.shape[-1] // d
    outs, lses = [], []
    for t in range(heads):
        sl = slice(t * d, (t + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (nq, nk) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
        lses.append((m + jnp.log(l))[:, 0][None, :])
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=0)


def _short_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, *, scale, d
):
    heads = q_ref.shape[-1] // d
    dqs, dks, dvs = [], [], []
    for t in range(heads):
        sl = slice(t * d, (t + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        lse = lse_ref[0, t, :][:, None]
        delta = delta_ref[0, t, :][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)  # (nq, nk) f32
        pc = p.astype(do.dtype)
        dv = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (nk, d)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (nq, nk)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


def _short_fwd(q, k, v, heads, scale, interpret):
    """Route to the local pallas call (one device) or the batch-sharded
    custom_partitioning wrapper (multi-device mesh). The wrapper is NOT used
    single-device: an opaque partitioning boundary blocks fusion there for
    no benefit (the r2 BN wrapper measured a large one-device regression)."""
    if len(jax.devices()) > 1:
        return _short_fwd_partitioned(heads, scale, interpret)(q, k, v)
    return _short_fwd_local(q, k, v, heads, scale, interpret)


def _short_fwd_local(q, k, v, heads, scale, interpret):
    b, n, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    out, lse = pl.pallas_call(
        functools.partial(_short_fwd_kernel, scale=scale, d=d),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            # block last-two dims (heads, n) equal the array dims — Mosaic's
            # divisibility rule is satisfied whatever heads/n are
            pl.BlockSpec((1, heads, n), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, heads, n), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def short_attention(q, k, v, heads: int, scale: float | None = None, interpret: bool = False):
    """Multi-head attention on packed (B, N, H*D) tensors -> (B, N, H*D).

    Requires 128 % D == 0 and (H*D) % 128 == 0; N/Nk arbitrary (whole rows
    resident in VMEM — short-sequence regime)."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    out, _ = _short_fwd(q, k, v, heads, scale, interpret)
    return out


def _short_vjp_fwd(q, k, v, heads, scale, interpret):
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    out, lse = _short_fwd(q, k, v, heads, scale, interpret)
    return out, (q, k, v, out, lse)


def _short_vjp_bwd(heads, scale, interpret, residuals, do):
    q, k, v, out, lse = residuals
    b, n, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    # delta_h = sum_d(do * out) per head, laid out (B, H, N) like lse
    delta = (do.astype(jnp.float32) * out.astype(jnp.float32)).reshape(b, n, heads, d)
    delta = jnp.sum(delta, axis=-1).transpose(0, 2, 1)  # (B, H, N) — tiny
    if len(jax.devices()) > 1:
        return _short_bwd_partitioned(heads, scale, interpret)(q, k, v, do, lse, delta)
    return _short_bwd_local(q, k, v, do, lse, delta, heads, scale, interpret)


def _short_bwd_local(q, k, v, do, lse, delta, heads, scale, interpret):
    b, n, hd = q.shape
    nk = k.shape[1]
    d = hd // heads
    dq, dk, dv = pl.pallas_call(
        functools.partial(_short_bwd_kernel, scale=scale, d=d),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, heads, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, heads, n), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, hd), q.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


short_attention.defvjp(_short_vjp_fwd, _short_vjp_bwd)


# ---------------------------------------------------------------------------
# GSPMD rules: the kernel is a pure per-batch-element map, so under a
# multi-device mesh each shard runs it on its local batch rows (SURVEY
# §2.10 DP). Any non-batch sharding of the operands is re-sharded to
# batch-only first (never hit by the zoo's batch-sharded activations).
# Same custom_partitioning pattern as ops/pallas_bn.py.
# ---------------------------------------------------------------------------


def _batch_shardings(mesh, arg_infos, n_out):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = ()
    if arg_infos[0].sharding is not None:
        spec = tuple(arg_infos[0].sharding.spec)
    b_axes = spec[0] if spec else None
    sh = NamedSharding(mesh, PartitionSpec(b_axes))
    return tuple(sh for _ in arg_infos), tuple(sh for _ in range(n_out))


def _make_partitioned(local_fn, operand_maps, result_maps):
    """custom_partitioning wrapper for a pure per-batch-element kernel:
    everything shards on dim 0 only. All non-batch factors are declared
    need_replication so Shardy steers propagation to batch-only shardings
    up front, instead of letting seq/feature shardings reach partition()
    and be silently undone with hidden reshard collectives."""
    from jax.experimental.custom_partitioning import (
        ArrayMapping,
        SdyShardingRule,
        custom_partitioning,
    )

    f = custom_partitioning(local_fn)
    n_out = len(result_maps)

    def infer(mesh, arg_infos, result_infos):
        _, out_sh = _batch_shardings(mesh, arg_infos, n_out)
        return out_sh

    def partition(mesh, arg_infos, result_infos):
        arg_sh, out_sh = _batch_shardings(mesh, arg_infos, n_out)
        return mesh, local_fn, out_sh, arg_sh

    # Shardy requires special-factor lists sorted by factor INDEX, which is
    # assigned by first appearance across the mappings
    factors, seen = [], set()
    for m in operand_maps + result_maps:
        for x in m:
            if x != "b" and x not in seen:
                seen.add(x)
                factors.append(x)
    rule = SdyShardingRule(
        tuple(ArrayMapping(*m) for m in operand_maps),
        tuple(ArrayMapping(*m) for m in result_maps),
        need_replication_factors=tuple(factors),
    )
    f.def_partition(partition, infer_sharding_from_operands=infer, sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def _short_fwd_partitioned(heads, scale, interpret):
    return _make_partitioned(
        lambda q, k, v: _short_fwd_local(q, k, v, heads, scale, interpret),
        (("b", "n", "f"), ("b", "m", "f"), ("b", "m", "f")),
        (("b", "n", "f"), ("b", "h", "n")),
    )


@functools.lru_cache(maxsize=None)
def _short_bwd_partitioned(heads, scale, interpret):
    return _make_partitioned(
        lambda q, k, v, do, lse, delta: _short_bwd_local(
            q, k, v, do, lse, delta, heads, scale, interpret
        ),
        (
            ("b", "n", "f"), ("b", "m", "f"), ("b", "m", "f"),
            ("b", "n", "f"), ("b", "h", "n"), ("b", "h", "n"),
        ),
        (("b", "n", "f"), ("b", "m", "f"), ("b", "m", "f")),
    )
