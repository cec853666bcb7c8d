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
