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
