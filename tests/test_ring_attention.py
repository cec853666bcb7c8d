"""Ring attention on the 8-device CPU mesh: exact parity with full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kurosiwo_tpu.ops.ring_attention import ring_attention


def _ref(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("axis_size", [4, 8])
def test_ring_matches_full_attention(axis_size):
    devices = np.asarray(jax.devices()[:axis_size]).reshape(axis_size)
    mesh = Mesh(devices, ("seq",))
    rs = np.random.RandomState(0)
    B, H, N, D = 2, 2, 8 * axis_size, 16
    q = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)
    scale = D**-0.5
    out = ring_attention(q, k, v, mesh, axis_name="seq", scale=scale)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_sharded_inputs():
    """Inputs pre-sharded over the ring axis stay sharded; result matches."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))
    rs = np.random.RandomState(1)
    B, H, N, D = 1, 4, 64, 8
    sh = NamedSharding(mesh, P(None, None, "seq", None))
    q = jax.device_put(jnp.asarray(rs.randn(B, H, N, D), jnp.float32), sh)
    k = jax.device_put(jnp.asarray(rs.randn(B, H, N, D), jnp.float32), sh)
    v = jax.device_put(jnp.asarray(rs.randn(B, H, N, D), jnp.float32), sh)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, "seq"))(q, k, v)
    ref = _ref(q, k, v, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_flow():
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    rs = np.random.RandomState(2)
    B, H, N, D = 1, 1, 16, 8
    q = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, "seq") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, D**-0.5) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=n)


def test_ring_gradient_parity_8dev_custom_vjp():
    """Training-mode contract (SURVEY §5.7): jax.grad through ring_attention
    on the full 8-device mesh matches single-device attention grads at f32
    tolerance. The custom two-pass vjp keeps residuals O(n_local) — autodiff
    through the forward loop would store every rotated k/v block."""
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))
    rs = np.random.RandomState(5)
    B, H, N, D = 2, 2, 64, 16
    q, k, v = (jnp.asarray(rs.randn(B, H, N, D), jnp.float32) for _ in range(3))
    t = jnp.asarray(rs.randn(B, H, N, D), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum((ring_attention(q, k, v, mesh, "seq") - t) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_ref(q, k, v, D**-0.5) - t) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=n)


def test_ring_bf16_grads_finite():
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    rs = np.random.RandomState(6)
    B, H, N, D = 1, 2, 32, 8
    q, k, v = (jnp.asarray(rs.randn(B, H, N, D), jnp.bfloat16) for _ in range(3))
    g = jax.grad(lambda q, k, v: jnp.sum(ring_attention(q, k, v, mesh, "seq").astype(jnp.float32)),
                 argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert a.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_ring_flash_blocks_match_dense():
    """Flash-kernel ring steps (interpret mode on the CPU mesh) == the dense
    ring path, forward and gradients — the long-shard path used on hardware."""
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from kurosiwo_tpu.ops.ring_attention import _ring_p

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("sp",))
    b, h, npp, d = 1, 2, 128, 64  # 128 tokens per device x 8 = 1024 global
    n = npp * len(devs)
    rng = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32) * 0.3 for _ in range(3))
    scale = d**-0.5
    spec = P(None, None, "sp", None)

    def run(blocks):
        fn = shard_map(
            functools.partial(_ring_p, axis_name="sp", scale=scale, blocks=blocks),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )
        return fn

    out_flash = run((128, 128, True))(q, k, v)
    out_dense = run(None)(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_dense), atol=2e-5)

    g_flash = jax.grad(lambda *a: jnp.sum(run((128, 128, True))(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(lambda *a: jnp.sum(run(None)(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_flash, g_dense, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, err_msg=name)
