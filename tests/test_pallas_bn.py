"""Fused Pallas BatchNorm (ops/pallas_bn.py): kernel correctness in interpret
mode and module parity against flax.linen.BatchNorm (fwd, bwd, running
stats)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kurosiwo_tpu.ops import pallas_bn


def test_pair_sums_interpret_matches_numpy():
    rs = np.random.RandomState(0)
    for shape in [(4, 8, 8, 16), (2, 16, 16, 64), (8, 4, 4, 128), (2, 8, 8, 256)]:
        a = rs.randn(*shape).astype(np.float32)
        b = rs.randn(*shape).astype(np.float32)
        s1, s2 = pallas_bn.pair_sums(jnp.asarray(a), jnp.asarray(b), interpret=True)
        c = shape[-1]
        ref1 = a.reshape(-1, c).sum(0)
        ref2 = (a.reshape(-1, c) * b.reshape(-1, c)).sum(0)
        np.testing.assert_allclose(np.asarray(s1), ref1, rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(np.asarray(s2), ref2, rtol=2e-5, atol=2e-4)


def test_bn_module_matches_flax():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 8, 8, 32).astype(np.float32))

    ours = pallas_bn.BatchNorm(use_running_average=False, interpret=True)
    flax_bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)

    v0 = ours.init(jax.random.PRNGKey(0), x)
    vf = flax_bn.init(jax.random.PRNGKey(0), x)
    # same variable tree
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(vf)

    # non-trivial affine params
    params = {
        "scale": jnp.asarray(rs.rand(32).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rs.randn(32).astype(np.float32)),
    }
    v0 = {"params": params, "batch_stats": v0["batch_stats"]}
    vf = {"params": params, "batch_stats": vf["batch_stats"]}

    y_ours, m_ours = ours.apply(v0, x, mutable=["batch_stats"])
    y_flax, m_flax = flax_bn.apply(vf, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_flax), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_ours["batch_stats"][k]),
            np.asarray(m_flax["batch_stats"][k]),
            atol=1e-5,
        )

    # gradients (the custom_vjp path) vs flax autodiff
    def loss(mod, v):
        def f(p):
            y, _ = mod.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                             mutable=["batch_stats"])
            return jnp.sum(y * y + 0.3 * y)
        return jax.grad(f)

    g_ours = loss(ours, v0)(params)
    g_flax = loss(flax_bn, vf)(params)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g_ours[k]), np.asarray(g_flax[k]),
                                   rtol=1e-4, atol=1e-4)

    def loss_x(mod, v):
        def f(xx):
            y, _ = mod.apply(v, xx, mutable=["batch_stats"])
            return jnp.sum(y * y + 0.3 * y)
        return jax.grad(f)

    dx_ours = loss_x(ours, v0)(x)
    dx_flax = loss_x(flax_bn, vf)(x)
    np.testing.assert_allclose(np.asarray(dx_ours), np.asarray(dx_flax),
                               rtol=1e-4, atol=1e-4)


def test_bn_eval_mode_matches_flax():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 4, 4, 16).astype(np.float32))
    stats = {
        "mean": jnp.asarray(rs.randn(16).astype(np.float32)),
        "var": jnp.asarray(rs.rand(16).astype(np.float32) + 0.1),
    }
    params = {
        "scale": jnp.asarray(rs.rand(16).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rs.randn(16).astype(np.float32)),
    }
    v = {"params": params, "batch_stats": stats}
    y_ours = pallas_bn.BatchNorm(use_running_average=True).apply(v, x)
    y_flax = nn.BatchNorm(use_running_average=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_flax), atol=1e-5)


def test_pair_sums_partitions_on_mesh():
    """The custom_partitioning rule: batch-sharded operands on a 4x2 mesh,
    per-shard kernel (interpret) + psum of partials == global sums."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    rs = np.random.RandomState(3)
    x = rs.randn(8, 4, 4, 16).astype(np.float32)
    xa = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    out = jax.jit(lambda a: pallas_bn.pair_sums(a, a, interpret=True))(xa)
    ref1 = x.reshape(-1, 16).sum(0)
    ref2 = (x.reshape(-1, 16) ** 2).sum(0)
    np.testing.assert_allclose(np.asarray(out[0]), ref1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), ref2, rtol=1e-5, atol=1e-4)


def test_phase_group_bn_matches_interleaved_bn():
    """PhaseGroupBatchNorm on a phase tensor == flax BatchNorm on its
    depth_to_space interleave (values, stats, grads)."""
    import flax.linen as nn_

    from kurosiwo_tpu.ops.pallas_bn import PhaseGroupBatchNorm
    from kurosiwo_tpu.ops.phase import depth_to_space, space_to_depth

    rs = np.random.RandomState(0)
    full = jnp.asarray(rs.randn(2, 16, 16, 8) * 2 + 1, jnp.float32)
    z = space_to_depth(full)  # (2, 8, 8, 32)

    ref = nn_.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    ours = PhaseGroupBatchNorm(use_running_average=False, groups=4)
    v_ref = ref.init(jax.random.PRNGKey(0), full)
    v = ours.init(jax.random.PRNGKey(0), z)
    sc = jnp.asarray(rs.rand(8) + 0.5, jnp.float32)
    bi = jnp.asarray(rs.randn(8) * 0.2, jnp.float32)
    params = {"scale": sc, "bias": bi}
    stats = {"mean": jnp.zeros(8), "var": jnp.ones(8)}

    y_ref, mut_ref = ref.apply(
        {"params": params, "batch_stats": stats}, full, mutable=["batch_stats"]
    )
    y, mut = ours.apply(
        {"params": params, "batch_stats": stats}, z, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(depth_to_space(y)), np.asarray(y_ref), atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"][k]), np.asarray(mut_ref["batch_stats"][k]),
            rtol=2e-5,
        )

    t = jnp.asarray(rs.randn(*full.shape), jnp.float32)

    def loss_ours(p, zz):
        y, _ = ours.apply({"params": p, "batch_stats": stats}, zz, mutable=["batch_stats"])
        return jnp.sum((depth_to_space(y) - t) ** 2)

    def loss_ref(p, ff):
        y, _ = ref.apply({"params": p, "batch_stats": stats}, ff, mutable=["batch_stats"])
        return jnp.sum((y - t) ** 2)

    gp, gz = jax.grad(loss_ours, argnums=(0, 1))(params, z)
    gpr, gfr = jax.grad(loss_ref, argnums=(0, 1))(params, full)
    np.testing.assert_allclose(np.asarray(gp["scale"]), np.asarray(gpr["scale"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp["bias"]), np.asarray(gpr["bias"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(gz)), np.asarray(gfr), atol=1e-4
    )
