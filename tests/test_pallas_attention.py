"""Flash-attention kernel: numeric parity with reference XLA attention,
forward and gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.ops.pallas_attention import flash_attention


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("n,d", [(256, 64), (512, 32)])
def test_forward_matches_reference(n, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    scale = d**-0.5
    out = flash_attention(q, k, v, scale, 128, 128, True)  # interpret mode
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.RandomState(1)
    n, d = 256, 32
    q = jnp.asarray(rng.randn(1, 1, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, n, d), jnp.float32)
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)


def test_attention_router_uses_flash_for_long_seq():
    from kurosiwo_tpu.ops.attention import _pick_block

    assert _pick_block(2048) == 256
    assert _pick_block(197) is None  # ViT's 197 tokens stay on XLA path
    assert _pick_block(1280, want=512) == 256


def test_attention_packed_matches_split():
    """attention_packed on (B, N, H*D) == head-split attention on (B, H, N, D)
    (same math, no physical head transpose in the packed path)."""
    from kurosiwo_tpu.ops.attention import attention, attention_packed

    rng = np.random.RandomState(7)
    b, n, h, d = 2, 50, 4, 16
    q, k, v = (jnp.asarray(rng.randn(b, n, h * d), jnp.float32) for _ in range(3))
    split = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    ref = attention(split(q), split(k), split(v), use_flash=False)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    out = attention_packed(q, k, v, heads=h, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g_ref = jax.grad(lambda t: jnp.sum(attention_packed(t, k, v, heads=h) ** 2))(q)
    assert np.isfinite(np.asarray(g_ref)).all()


def test_attention_packed_flash_route():
    """Long sequences route through the flash kernel (transposed internally)."""
    from kurosiwo_tpu.ops.attention import attention_packed

    rng = np.random.RandomState(8)
    b, n, h, d = 1, 1024, 2, 32
    q, k, v = (jnp.asarray(rng.randn(b, n, h * d), jnp.float32) for _ in range(3))
    packed_xla = attention_packed(q, k, v, heads=h, use_flash=False)
    split = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    ref = _ref_attention(split(q), split(k), split(v), d**-0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(packed_xla), np.asarray(ref), atol=2e-5)


def _packed_ref(q, k, v, heads, scale):
    b, n, hd = q.shape
    d = hd // heads
    split = lambda t: t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)
    out = _ref_attention(split(q), split(k), split(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


@pytest.mark.parametrize("n,heads,d", [(196, 2, 64), (49, 4, 32), (197, 1, 128)])
def test_short_attention_forward(n, heads, d):
    from kurosiwo_tpu.ops.pallas_attention import short_attention

    rng = np.random.RandomState(5)
    b, hd = 2, heads * d
    q, k, v = (jnp.asarray(rng.randn(b, n, hd), jnp.float32) for _ in range(3))
    scale = d**-0.5
    out = short_attention(q, k, v, heads, scale, True)  # interpret
    ref = _packed_ref(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_short_attention_gradients():
    from kurosiwo_tpu.ops.pallas_attention import short_attention

    rng = np.random.RandomState(6)
    b, n, heads, d = 2, 50, 2, 64
    hd = heads * d
    q, k, v = (jnp.asarray(rng.randn(b, n, hd), jnp.float32) for _ in range(3))
    scale = d**-0.5

    def loss_kernel(q, k, v):
        return jnp.sum(short_attention(q, k, v, heads, scale, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_packed_ref(q, k, v, heads, scale) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gk, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4, err_msg=name
        )


def test_short_attention_cross_lengths():
    """nq != nk (cross-attention shapes used by BiT-CD's decoder)."""
    from kurosiwo_tpu.ops.pallas_attention import short_attention

    rng = np.random.RandomState(9)
    b, nq, nk, heads, d = 1, 60, 4, 2, 64
    hd = heads * d
    q = jnp.asarray(rng.randn(b, nq, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, nk, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, nk, hd), jnp.float32)
    out = short_attention(q, k, v, heads, None, True)
    ref = _packed_ref(q, k, v, heads, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)



def test_short_attention_mesh_partitioning():
    """Batch-sharded short attention on the 8-device mesh: the
    custom_partitioning rule runs the local grid per shard; fwd + grads
    match the single-device reference."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from kurosiwo_tpu.ops.pallas_attention import short_attention

    devs = jax.devices()
    assert len(devs) == 8, "conftest provisions the 8-device CPU mesh"
    mesh = Mesh(np.array(devs), ("data",))
    bsh = NamedSharding(mesh, PartitionSpec("data"))

    rng = np.random.RandomState(21)
    b, n, heads, d = 16, 49, 4, 64
    hd = heads * d
    scale = d**-0.5
    qh, kh, vh = (rng.randn(b, n, hd).astype(np.float32) for _ in range(3))
    q, k, v = (jax.device_put(t, bsh) for t in (qh, kh, vh))

    fn = jax.jit(
        lambda q, k, v: short_attention(q, k, v, heads, scale, True),
        in_shardings=(bsh, bsh, bsh), out_shardings=bsh,
    )
    out = fn(q, k, v)
    ref = _packed_ref(jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh), heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    grad_fn = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(short_attention(q, k, v, heads, scale, True) ** 2),
                 argnums=(0, 1, 2)),
        in_shardings=(bsh, bsh, bsh),
    )
    gk = grad_fn(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(_packed_ref(q, k, v, heads, scale) ** 2),
                  argnums=(0, 1, 2))(jnp.asarray(qh), jnp.asarray(kh), jnp.asarray(vh))
    for a, b_, name in zip(gk, gr, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4,
                                   err_msg=name)
