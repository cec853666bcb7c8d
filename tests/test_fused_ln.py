"""Custom-vjp LayerNorm (ops/fused_ln.py) vs flax nn.LayerNorm: values and
gradients, f32 and bf16 — it replaces every LN in the ViT/MAE stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from kurosiwo_tpu.ops.fused_ln import LayerNorm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_value_and_grad_parity(dtype):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(6, 50, 256) * 2 + 0.5, dtype)
    ref = nn.LayerNorm(dtype=dtype)
    ours = LayerNorm(dtype=dtype)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v = ours.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v_ref)
    # non-trivial scale/bias
    v = {"params": {"scale": jnp.asarray(rs.rand(256) + 0.5, jnp.float32),
                    "bias": jnp.asarray(rs.randn(256) * 0.3, jnp.float32)}}
    y_ref = ref.apply(v, x)
    y = ours.apply(v, x)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=tol)

    t = jnp.asarray(rs.randn(*x.shape), jnp.float32)

    def loss(fn):
        def inner(params, xx):
            return jnp.sum((fn.apply({"params": params}, xx).astype(jnp.float32) - t) ** 2)
        return inner

    g = jax.grad(loss(ours), argnums=(0, 1))(v["params"], x)
    g_ref = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=(1e-3 if dtype == jnp.float32 else 1.0), rtol=2e-2,
        )


def test_ln_no_scale_bias():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.float32)
    ref = nn.LayerNorm(use_scale=False, use_bias=False)
    ours = LayerNorm(use_scale=False, use_bias=False)
    y_ref = ref.apply({"params": {}}, x)
    y = ours.apply({"params": {}}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
