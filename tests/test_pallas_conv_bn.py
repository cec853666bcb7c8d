"""Fused conv3x3 + BN-stats epilogue kernel (ops/pallas_conv_bn.py) vs the
XLA formulation: conv output, batch statistics, and the affine+ReLU
prologue. Interpret mode (CPU); hardware timing lives in docs/performance.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.ops.pallas_conv_bn import conv3x3_bn_stats


def _ref(x, w, scale=None, bias=None):
    if scale is not None:
        x = jnp.maximum(x.astype(jnp.float32) * scale + bias, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s = jnp.sum(y, axis=(0, 1, 2))
    sq = jnp.sum(y * y, axis=(0, 1, 2))
    return y, jnp.stack([s, sq])


@pytest.mark.parametrize("shape", [(2, 16, 28, 128), (1, 8, 14, 256)])
def test_conv_stats_parity(shape):
    b, h, wd, c = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, c, 128) * 0.05, jnp.float32)
    y, st = conv3x3_bn_stats(x, w, rows_per_block=8, interpret=True)
    yr, str_ = _ref(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(str_), rtol=5e-4, atol=1e-3)


def test_conv_stats_prologue():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 16, 28, 128), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    scale = jnp.asarray(rs.rand(128) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    y, st = conv3x3_bn_stats(x, w, scale, bias, rows_per_block=8, interpret=True)
    yr, str_ = _ref(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(str_), rtol=5e-4, atol=1e-3)


def test_bf16_path():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 16, 28, 128), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3, 3, 128, 128) * 0.05, jnp.bfloat16)
    y, st = conv3x3_bn_stats(x, w, rows_per_block=8, interpret=True)
    yr, str_ = _ref(x, w)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), atol=0.15, rtol=0.05
    )


def test_conv3x3_bn_vjp_parity():
    """conv3x3_bn (fused fwd, custom bwd) == conv_same + bn_train_apply:
    forward outputs, batch stats, and all four gradients."""
    from functools import partial

    from kurosiwo_tpu.ops.pallas_conv_bn import conv3x3_bn
    from kurosiwo_tpu.ops.pallas_bn import bn_train_apply
    from kurosiwo_tpu.ops.nn import conv_same

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 6, 128), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(128) * 0.1, jnp.float32)

    def ref(x, w, scale, bias):
        y = conv_same(x, w)
        out, mean, var = bn_train_apply(y, scale, bias)
        return out, mean, var

    fused = partial(conv3x3_bn, eps=1e-5, interpret=True)
    out_f, mean_f, var_f = fused(x, w, scale, bias)
    out_r, mean_r, var_r = ref(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_r), atol=1e-4)

    def loss_fused(x, w, s, b):
        out, _, _ = fused(x, w, s, b)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(x, w, s, b):
        out, _, _ = ref(x, w, s, b)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_, name in zip(gf, gr, ["dx", "dw", "dgamma", "dbeta"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-3, rtol=1e-3, err_msg=name
        )


def test_convbnact_fused_path_parity(monkeypatch):
    """ConvBNAct with KUROSIWO_PALLAS_CONV=interpret: identical param/stat
    tree to the standard path, matching outputs, grads, and running stats."""
    from kurosiwo_tpu.ops.nn import ConvBNAct

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 8, 256) * 0.5, jnp.float32)
    mod = ConvBNAct(256, 3, 1)

    monkeypatch.delenv("KUROSIWO_PALLAS_CONV", raising=False)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    out_std, mut_std = mod.apply(variables, x, True, mutable=["batch_stats"])

    def loss_std(p):
        out, _ = mod.apply({**variables, "params": p}, x, True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    g_std = jax.grad(loss_std)(variables["params"])

    monkeypatch.setenv("KUROSIWO_PALLAS_CONV", "interpret")
    variables_f = mod.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree_util.tree_structure(variables_f) == jax.tree_util.tree_structure(variables)
    out_fused, mut_fused = mod.apply(variables, x, True, mutable=["batch_stats"])

    def loss_fused(p):
        out, _ = mod.apply({**variables, "params": p}, x, True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused)(variables["params"])

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_std), atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
        mut_fused["batch_stats"], mut_std["batch_stats"],
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=2e-3),
        g_fused, g_std,
    )
