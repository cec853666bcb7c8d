"""Pallas TPU BatchNorm: fused per-channel (sum, sum-of-products) reductions.

Why this exists (docs/performance.md, round-2 profile): BatchNorm statistic
and gradient reductions are ~37% of the UNet train step. XLA lowers each
reduce over a (B, H, W, C) activation to a VPU pass measured at ~238 GB/s
(issue-bound), and the forward and backward of every BN need two such
reduced quantities each. This kernel computes BOTH quantities of a pass in
one stream over the data:

  forward:  sum(x),  sum(x*x)      -> mean / var
  backward: sum(dy), sum(dy*x)     -> dbeta / dgamma (and dx elementwise)

reading the tensor once as flat (rows, 128) vregs — convert + two FMAs per
vreg — so the pass runs at streaming speed instead of two separate
reduce passes. The reference's equivalent is torch's cuDNN batch norm
(`/root/reference/models/snunet.py`, `model_utilities.py` — every zoo CNN);
numerics here match flax.linen.BatchNorm (use_fast_variance) bit-for-bit in
f32 accumulation.

The channel axis is folded into the 128-lane dimension: a (N, C) view with
C | 128 becomes (N*C/128, 128), each lane accumulating one channel modulo
C; lanes are regrouped to per-channel sums on the host side of the call.
This keeps every load a full (sublane, 128) vreg regardless of C — the
C=16/32/64 decoder channels that pad an XLA reduce's lanes cost nothing.

MEASURED RESULT (docs/performance.md round 2): in-step this is a 3.5x
REGRESSION (923 vs 3,234 patches/s on the UNet b128 train step). The
(B, H, W, C)->(N*C/128, 128) view is not a relayout on TPU — for C<128 it
shuffles spatial positions into the lane dimension across tile boundaries,
and the opaque pallas_call additionally blocks producer/consumer fusion
around every BN. Same failure mode as the Gram-matmul attempt
(ops/fused_bn.py). Kept as tested, partition-aware infrastructure; the
model zoo stays on flax BatchNorm + XLA reduces, which read the conv
output in its native layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_kernel(a_ref, b_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    acc_ref[0, :] += jnp.sum(a, axis=0)
    acc_ref[1, :] += jnp.sum(a * b, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _pick_block(m: int) -> int:
    for blk in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % blk == 0:
            return blk
    return 0


def _pair_call(av, bv, blk, lanes, interpret):
    return pl.pallas_call(
        _pair_kernel,
        grid=(av.shape[0] // blk,),
        in_specs=[
            pl.BlockSpec((blk, lanes), lambda i: (i, 0)),
            pl.BlockSpec((blk, lanes), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=interpret,
    )(av, bv)


def _pair_sums_local(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Single-shard implementation of `pair_sums` (kernel or XLA fallback)."""
    c = a.shape[-1]
    n = a.size // c
    kernel_ok = interpret or _use_pallas()
    if kernel_ok and c <= 128 and 128 % c == 0 and a.size % 128 == 0:
        # narrow channels: fold into full 128-lane rows; lane l accumulates
        # channel l % c (row stride 128 is a multiple of c)
        blk = _pick_block(a.size // 128)
        if blk:
            out = _pair_call(a.reshape(-1, 128), b.reshape(-1, 128), blk, 128, interpret)
            fold = out.reshape(2, 128 // c, c).sum(axis=1)
            return fold[0], fold[1]
    elif kernel_ok and c % 128 == 0:
        blk = _pick_block(n)
        if blk:
            out = _pair_call(a.reshape(n, c), b.reshape(n, c), blk, c, interpret)
            return out[0], out[1]
    # XLA path: reduce over the native shape — a reshape to (N, C) here
    # forces a relayout copy of custom conv-output layouts (measured 1.75x
    # step regression); axis-reduces fuse convert+multiply into one pass
    axes = tuple(range(a.ndim - 1))
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    return jnp.sum(af, axis=axes), jnp.sum(af * bf, axis=axes)


@functools.lru_cache(maxsize=None)
def _partitioned_pair_sums(ndim: int, interpret: bool):
    """custom_partitioning wrapper: under a >1-device mesh the SPMD
    partitioner has no rule for the opaque pallas_call, so we provide one —
    each shard runs the kernel on its local block and partial sums are
    psum'ed over every mesh axis the operands are sharded on. Channel-dim
    sharding is handled by replicating the operands first (never hit by the
    zoo's batch-sharded activations)."""
    from jax.experimental.custom_partitioning import (
        ArrayMapping,
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def f(a, b):
        return _pair_sums_local(a, b, interpret)

    def infer(mesh, arg_infos, result_infos):
        rep = NamedSharding(mesh, PartitionSpec())
        return (rep, rep)

    def partition(mesh, arg_infos, result_infos):
        a_info = arg_infos[0]
        spec = tuple(a_info.sharding.spec) if a_info.sharding is not None else ()
        spec = spec + (None,) * (ndim - len(spec))
        axes: list = []
        last_sharded = False
        for d, entry in enumerate(spec):
            if entry is None:
                continue
            names = entry if isinstance(entry, tuple) else (entry,)
            axes.extend(n for n in names if n)
            if d == ndim - 1:
                last_sharded = True
        rep = NamedSharding(mesh, PartitionSpec())
        if last_sharded:
            arg_sh = (rep, rep)
            axes = []
        else:
            arg_sh = (a_info.sharding, a_info.sharding)
        sum_axes = tuple(axes)

        def lower(a, b):
            s1, s2 = _pair_sums_local(a, b, interpret)
            if sum_axes:
                s1 = jax.lax.psum(s1, sum_axes)
                s2 = jax.lax.psum(s2, sum_axes)
            return s1, s2

        return mesh, lower, (rep, rep), arg_sh

    lead = tuple(f"d{i}" for i in range(ndim - 1))
    rule = SdyShardingRule(
        (ArrayMapping(*lead, "c"), ArrayMapping(*lead, "c")),
        (ArrayMapping("c"), ArrayMapping("c")),
        reduction_factors=lead,
    )
    f.def_partition(partition, infer_sharding_from_operands=infer, sharding_rule=rule)
    return f


def pair_sums(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Per-channel (sum(a), sum(a*b)) over all leading axes; channel = last
    axis. f32 accumulation. Kernel or XLA reduces per `_use_pallas`.

    The custom_partitioning wrapper is used ONLY when the opaque Pallas
    kernel must be sharded over a >1-device mesh (or interpret-mode tests
    exercise the rule): plain XLA reduces partition natively under GSPMD,
    and the wrapper's custom-call boundary measurably fences fusion.

    Deliberately NOT wrapped in jax.jit: an inner jit lowers to a separate
    XLA computation whose call boundary forces operands into default
    layouts — every conv output would be relayout-copied before its BN."""
    kernel_path = interpret or _use_pallas()
    if len(jax.devices()) == 1 or not kernel_path:
        return _pair_sums_local(a, b, interpret)
    return _partitioned_pair_sums(a.ndim, interpret)(a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_apply(x, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """Training-mode batch norm over all-but-last axes. Returns
    (y, mean, var) with y in x.dtype and f32 (mean, var) — flax
    use_fast_variance numerics, Pallas-fused statistics."""
    y, mean, var, _ = _bn_fwd_core(x, scale, bias, eps, interpret)
    return y, mean, var


def _bn_fwd_core(x, scale, bias, eps, interpret):
    n = x.size // x.shape[-1]
    s1, s2 = pair_sums(x, x, interpret=interpret)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # elementwise pass in x.dtype (flax semantics): per-channel factors are
    # folded in f32 then cast once, the big tensor never upcasts
    dt = x.dtype
    y = x * (inv * scale).astype(dt) + (bias - mean * inv * scale).astype(dt)
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, eps, interpret):
    y, mean, var, inv = _bn_fwd_core(x, scale, bias, eps, interpret)
    return (y, mean, var), (x, mean, inv, scale)


def _bn_bwd(eps, interpret, res, cts):
    dy, _dmean, _dvar = cts  # stats are used for running averages only
    x, mean, inv, scale = res
    n = x.size // x.shape[-1]
    sum_dy, sum_dyx = pair_sums(dy, x, interpret=interpret)
    dbeta = sum_dy
    dgamma = inv * (sum_dyx - mean * sum_dy)
    # dx = (scale*inv) * (dy - (dbeta + xhat*dgamma)/n) with
    # xhat = (x - mean)*inv, regrouped so the big-tensor arithmetic stays in
    # x.dtype with per-channel f32 factors folded and cast once:
    # dx = A*dy + B*x + C
    dt = x.dtype
    a_f = scale * inv
    b_f = -a_f * inv * dgamma / n
    c_f = -a_f * (dbeta / n) - b_f * mean
    dx = dy * a_f.astype(dt) + x * b_f.astype(dt) + c_f.astype(dt)
    return dx, dgamma, dbeta


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)


# ---------------------------------------------------------------------------
# Phase-group variant (round 3): BatchNorm over a PHASE-SPACE tensor
# (B, H, W, g*C) whose canonical channels repeat phase-major. The original
# path reshaped to (B, H, g*W, C) first (phase_batch_view) — at the decoder
# finale that is a 16-LANE tensor, so every stats/normalize/backward pass ran
# at 1/8 lane utilization (~3.7 ms of the r3 profile). Here all passes stay
# on the native g*C-wide layout; the per-phase partial sums are folded to
# canonical channels afterwards (a (g, C) reduce of a vector — free).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_train_apply_phase(x, scale, bias, eps: float, groups: int, interpret: bool = False):
    """Training-mode BN of the interleaved full-res map, computed on its
    phase tensor: x (..., groups*C), scale/bias (C,). Returns (y, mean, var)
    with canonical (C,) statistics — numerically identical to BN after
    depth_to_space."""
    y, mean, var, _ = _bn_phase_fwd_core(x, scale, bias, eps, groups, interpret)
    return y, mean, var


def _fold_groups(v, groups):
    return v.reshape(groups, -1).sum(axis=0)


def _bn_phase_fwd_core(x, scale, bias, eps, groups, interpret):
    c = x.shape[-1] // groups
    n = x.size // c  # elements per CANONICAL channel
    s1f, s2f = pair_sums(x, x, interpret=interpret)
    mean = _fold_groups(s1f, groups) / n
    var = _fold_groups(s2f, groups) / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    dt = x.dtype
    a = jnp.tile(inv * scale, groups).astype(dt)
    b = jnp.tile(bias - mean * inv * scale, groups).astype(dt)
    y = x * a + b
    return y, mean, var, inv


def _bn_phase_fwd(x, scale, bias, eps, groups, interpret):
    y, mean, var, inv = _bn_phase_fwd_core(x, scale, bias, eps, groups, interpret)
    return (y, mean, var), (x, mean, inv, scale)


def _bn_phase_bwd(eps, groups, interpret, res, cts):
    dy, _dmean, _dvar = cts
    x, mean, inv, scale = res
    c = x.shape[-1] // groups
    n = x.size // c
    sum_dy_f, sum_dyx_f = pair_sums(dy, x, interpret=interpret)
    dbeta = _fold_groups(sum_dy_f, groups)
    dgamma = inv * (_fold_groups(sum_dyx_f, groups) - mean * dbeta)
    dt = x.dtype
    a_f = scale * inv
    b_f = -a_f * inv * dgamma / n
    c_f = -a_f * (dbeta / n) - b_f * mean
    dx = dy * jnp.tile(a_f, groups).astype(dt) + x * jnp.tile(b_f, groups).astype(dt) \
        + jnp.tile(c_f, groups).astype(dt)
    return dx, dgamma, dbeta


bn_train_apply_phase.defvjp(_bn_phase_fwd, _bn_phase_bwd)


class PhaseGroupBatchNorm(nn.Module):
    """BatchNorm for phase-space tensors (B, H, W, groups*C): canonical (C,)
    params/stats, all tensor passes on the native wide layout. Drop-in for
    `FusedBatchNorm(phase_batch_view(z))` (same BatchNorm_N param subtree —
    pass name="BatchNorm_0" explicitly where auto-naming differs)."""

    use_running_average: bool
    groups: int = 4
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        out_dtype = self.dtype or x.dtype
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = jnp.tile(inv * scale, self.groups)
            b = jnp.tile(bias - ra_mean.value * inv * scale, self.groups)
            return (x.astype(jnp.float32) * a + b).astype(out_dtype)
        y, mean, var = bn_train_apply_phase(
            x.astype(out_dtype), scale, bias, self.epsilon, self.groups, self.interpret
        )
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        return y


def _use_pallas() -> bool:
    """Mosaic kernel path is OPT-IN (KUROSIWO_PALLAS_BN=1) and TPU-only:
    in-step it measured 3.5x slower than the XLA reduces (see module
    docstring), so the default everywhere is the XLA path — which still
    wins over flax autodiff by running the hand-derived two-reduce
    backward instead of autodiff's three.

    Multi-device meshes are fine either way: `_partitioned_pair_sums`
    supplies the partitioning rule (per-shard partials + psum)."""
    import os

    if os.environ.get("KUROSIWO_PALLAS_BN") != "1":
        return False
    from .backend import is_tpu_backend

    return is_tpu_backend()


class BatchNorm(nn.Module):  # noqa: N801 — named so flax auto-naming yields
    """Drop-in replacement for flax.linen.BatchNorm (use_fast_variance
    semantics, f32 params/stats) whose training-mode statistic and gradient
    reductions run through the fused Pallas kernel above on TPU. The class
    is deliberately named `BatchNorm` so `nn.compact` auto-naming produces
    the same `BatchNorm_N` variable subtrees as the flax module it replaces
    — checkpoints and converters are unaffected."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        out_dtype = self.dtype or x.dtype
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * (inv * scale) + bias
            return y.astype(out_dtype)
        y, mean, var = bn_train_apply(
            x.astype(out_dtype), scale, bias, self.epsilon, self.interpret
        )
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        return y
