"""Interpret-mode parity for the Pallas GEMM-formulated conv dW kernel
(ops/pallas_dw.py) against jax.grad's conv weight gradient. Hardware A/B
lives in scripts/bench_dw.py (VERDICT r3 item 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.ops.pallas_dw import conv3x3_dw, xla_dw


@pytest.mark.parametrize("shape,cout", [
    ((8, 14, 14, 128), 128),   # layer4-like geometry, reduced channels
    ((4, 28, 28, 128), 256),   # layer3 geometry, rectangular channels
    ((8, 12, 10, 128), 128),   # W needing 8-alignment padding (10+2 -> 16)
])
def test_dw_matches_xla(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    dy = jnp.asarray(rng.randn(*shape[:3], cout).astype(np.float32))
    got = conv3x3_dw(x, dy, batch_block=4, interpret=True)
    ref = xla_dw(x, dy)
    assert got.shape == (3, 3, shape[-1], cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-5)


def test_dw_bf16_inputs():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 14, 14, 128).astype(np.float32), dtype=jnp.bfloat16)
    dy = jnp.asarray(rng.randn(4, 14, 14, 128).astype(np.float32), dtype=jnp.bfloat16)
    got = conv3x3_dw(x, dy, batch_block=4, interpret=True)
    ref = xla_dw(x, dy)
    denom = float(jnp.max(jnp.abs(ref))) or 1.0
    assert float(jnp.max(jnp.abs(got - ref))) / denom < 2e-2


def test_convbnact_pallas_dw_grads_match(monkeypatch):
    """KUROSIWO_PALLAS_DW=interpret routes ConvBNAct's weight grad through
    the Pallas kernel; grads must match the default XLA path (f32)."""
    import jax
    import jax.numpy as jnp

    from kurosiwo_tpu.ops import nn as knn

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 8, 8, 128).astype(np.float32))

    class Two(knn.nn.Module):
        @knn.nn.compact
        def __call__(self, x, train=True):
            x = knn.ConvBNAct(128, dtype=jnp.float32)(x, train=train)
            return knn.ConvBNAct(128, dtype=jnp.float32)(x, train=train)

    def grads():
        m = Two()
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out * out)

        return m, v, jax.grad(loss)(v["params"])

    monkeypatch.delenv("KUROSIWO_PALLAS_DW", raising=False)
    _, v_ref, g_ref = grads()
    monkeypatch.setenv("KUROSIWO_PALLAS_DW", "interpret")
    _, v_dw, g_dw = grads()

    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    dw_leaves = dict(jax.tree_util.tree_leaves_with_path(g_dw))
    assert len(ref_leaves) == len(dw_leaves)
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(dw_leaves[path]), np.asarray(leaf), atol=2e-3, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
