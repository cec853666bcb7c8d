"""Experimental fused conv3x3 kernel: interpret-mode parity with XLA conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from kurosiwo_tpu.ops.pallas_conv import conv3x3_fused


@pytest.mark.parametrize("shape,cout", [((2, 32, 16, 8), 4), ((1, 16, 17, 6), 6)])
def test_conv3x3_matches_xla(shape, cout):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, shape[-1], cout), jnp.float32)
    b = jnp.asarray(rs.randn(cout), jnp.float32)
    out = conv3x3_fused(x, w, b, relu=True, rows_per_block=8, interpret=True)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = jnp.maximum(ref, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3x3_no_relu():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 16, 8, 4), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 4, 4), jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    out = conv3x3_fused(x, w, b, relu=False, rows_per_block=8, interpret=True)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert float(jnp.min(out)) < 0  # relu really off
