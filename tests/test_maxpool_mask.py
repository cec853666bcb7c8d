"""Mask-backward max pooling (KUROSIWO_MAXPOOL_MASK) — forward identity and
gradient parity with XLA's select_and_scatter on tie-free inputs, plus the
documented all-ties subgradient semantics.

Reference geometry sources: the ResNet stem pool (3x3/s2 pad 1,
/root/reference/models/bit_cd.py:241) and the 2x2/s2 VALID pools of
siam/snunet/hfanet/adhr (/root/reference/models/siam_diff.py:40 etc.).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kurosiwo_tpu.ops import nn as knn


def _unique_input(shape, seed=0):
    """Values are a shuffled arange — globally distinct, so every pooling
    window has a unique argmax and the subgradient is unique (mask backward
    and select_and_scatter must agree exactly)."""
    rng = np.random.RandomState(seed)
    vals = rng.permutation(int(np.prod(shape))).astype(np.float32)
    return jnp.asarray(vals.reshape(shape) / 7.0 - 3.0)


def _loss_weights(y_shape, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*y_shape).astype(np.float32))


@pytest.mark.parametrize(
    "window,stride,padding,shape",
    [
        (2, 2, "VALID", (2, 8, 12, 5)),
        (3, 2, [(1, 1), (1, 1)], (2, 12, 8, 5)),
        (3, 2, [(1, 1), (1, 1)], (1, 112, 112, 3)),
    ],
)
def test_mask_pool_matches_xla_pool_fwd_and_grad(window, stride, padding, shape, monkeypatch):
    x = _unique_input(shape)

    def run(flagged):
        if flagged:
            monkeypatch.setenv("KUROSIWO_MAXPOOL_MASK", "1")
        else:
            monkeypatch.delenv("KUROSIWO_MAXPOOL_MASK", raising=False)

        def loss(x):
            y = knn.max_pool(x, window, stride, padding=padding)
            return jnp.sum(y * _loss_weights(y.shape)), y

        (l, y), g = jax.value_and_grad(loss, has_aux=True)(x)
        return l, y, g

    l0, y0, g0 = run(False)
    l1, y1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_mask_pool_unsupported_geometry_falls_through(monkeypatch):
    monkeypatch.setenv("KUROSIWO_MAXPOOL_MASK", "1")
    # odd spatial dim: must route to the flax pool, shapes/fwd still correct
    x = _unique_input((1, 7, 9, 4))
    y = knn.max_pool(x, 2, 2, padding="VALID")
    assert y.shape == (1, 3, 4, 4)
    g = jax.grad(lambda x: jnp.sum(knn.max_pool(x, 2, 2, padding="VALID")))(x)
    assert g.shape == x.shape


def test_mask_pool_tie_semantics_all_argmax(monkeypatch):
    """Documented divergence from select_and_scatter: a within-window tie
    routes dy to EVERY tied position (sum-over-argmax-set subgradient),
    where XLA picks one. Constant window -> all 4 positions get dy."""
    monkeypatch.setenv("KUROSIWO_MAXPOOL_MASK", "1")
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(knn.max_pool(x, 2, 2, padding="VALID")))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones((1, 2, 2, 1), np.float32))


def test_mask_pool_bf16_dtype_and_batch_shapes(monkeypatch):
    monkeypatch.setenv("KUROSIWO_MAXPOOL_MASK", "1")
    # bf16's 8-bit mantissa would alias globally-unique values into
    # within-window ties; (i%4, j%4) codes are distinct inside every 3x3
    # window (3 < 4) and exactly representable, so each window has a
    # unique argmax
    i = jnp.arange(16) % 4
    j = jnp.arange(16) % 4
    x = (i[:, None] * 4 + j[None, :]).astype(jnp.bfloat16)
    x = jnp.broadcast_to(x[None, :, :, None], (4, 16, 16, 8))

    def loss(x):
        return jnp.sum(knn.max_pool(x, 3, 2, padding=[(1, 1), (1, 1)]).astype(jnp.float32))

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16
    assert g.shape == x.shape
    # every window contributes its dy exactly once on tie-free input
    assert float(jnp.sum(g.astype(jnp.float32))) == 8 * 8 * 8 * 4
