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
