"""Phase-space (space-to-depth) decoder transforms: exactness tests.

The phase finale is a pure reparameterization — same parameters, same math —
so outputs and BatchNorm batch statistics must match the standard path to
float tolerance (ops/phase.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kurosiwo_tpu.models.unet import UNet
from kurosiwo_tpu.ops.phase import (
    depth_to_space,
    fold_up2_kernel,
    phase_conv_kernel,
    space_to_depth,
    space_to_depth_mask,
)


def _conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_fold_up2_kernel_exact():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 10, 5).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 5, 7).astype(np.float32))
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (2, 8, 2, 10, 2, 5)).reshape(2, 16, 20, 5)
    ref = _conv(up, w)
    got = depth_to_space(_conv(x, fold_up2_kernel(w)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_phase_conv_kernel_exact():
    rs = np.random.RandomState(1)
    big = jnp.asarray(rs.randn(2, 16, 20, 5).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 5, 7).astype(np.float32))
    ref = _conv(big, w)
    got = depth_to_space(_conv(space_to_depth(big), phase_conv_kernel(w)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_s2d_mask_roundtrip():
    rs = np.random.RandomState(2)
    m = jnp.asarray(rs.randint(0, 4, (2, 16, 20)))
    ms = space_to_depth_mask(m)
    assert ms.shape == (2, 8, 10, 4)
    # interleave back: out[2i+a, 2j+b] == ms[i, j, 2a+b]
    back = ms.reshape(2, 8, 10, 2, 2).transpose(0, 1, 3, 2, 4).reshape(2, 16, 20)
    assert (back == m).all()


def test_unet_phase_finale_matches_standard():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 6).astype(np.float32))
    fast = UNet(num_classes=3, backbone="resnet18", phase_finale=True)
    slow = UNet(num_classes=3, backbone="resnet18", phase_finale=False)
    variables = fast.init(rng, x, train=False)
    # identical param trees by construction
    chex_equal = jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        slow.init(rng, x, train=False)
    )
    assert chex_equal

    out_fast = fast.apply(variables, x, train=False)
    out_slow = slow.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow), atol=2e-4)

    # train mode: outputs and mutated batch stats must agree
    yf, mf = fast.apply(variables, x, train=True, mutable=["batch_stats"])
    ys, ms = slow.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys), atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4), mf, ms
    )


def test_compact_kernels_match_3x3_folds():
    """The 2x2-tap compact forms (ops/phase.py) equal the 3x3 folded kernels
    applied with SAME padding — same math minus the structural-zero taps."""
    from kurosiwo_tpu.ops.phase import (
        conv2x2_shifted,
        fold_up2_kernel_c,
        phase_conv_kernel_c,
    )

    rs = np.random.RandomState(2)
    w = jnp.asarray(rs.randn(3, 3, 5, 7).astype(np.float32))
    x = jnp.asarray(rs.randn(2, 8, 10, 5).astype(np.float32))
    ref = _conv(x, fold_up2_kernel(w))
    got = conv2x2_shifted(x, fold_up2_kernel_c(w))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    z = space_to_depth(jnp.asarray(rs.randn(2, 16, 20, 5).astype(np.float32)))
    ref = _conv(z, phase_conv_kernel(w))
    got = conv2x2_shifted(z, phase_conv_kernel_c(w))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_unetplusplus_fold_up_matches_standard():
    from kurosiwo_tpu.models.unet import UNetPlusPlus

    rng = jax.random.PRNGKey(4)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 64, 6).astype(np.float32))
    fast = UNetPlusPlus(num_classes=3, backbone="resnet18", fold_up=True)
    slow = UNetPlusPlus(num_classes=3, backbone="resnet18", fold_up=False)
    variables = fast.init(rng, x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        slow.init(rng, x, train=False)
    )
    yf, mf = fast.apply(variables, x, train=True, mutable=["batch_stats"])
    ys, ms = slow.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys), atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4), mf, ms
    )


def test_conv_transpose2x_via_phase_matches_dilated():
    """ConvTranspose2x default (conv1x1-to-phase + depth_to_space) must be
    exact vs the lhs-dilated-conv formulation, values and grads."""
    import numpy as np

    from kurosiwo_tpu.ops.nn import ConvTranspose2x

    x = jnp.asarray(np.random.RandomState(7).randn(2, 7, 5, 6), jnp.float32)
    a = ConvTranspose2x(4, via_phase=False)
    b = ConvTranspose2x(4, via_phase=True)
    v = a.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(a.apply(v, x)), np.asarray(b.apply(v, x)), atol=1e-5, rtol=1e-5
    )
    ga = jax.grad(lambda p: jnp.sum(a.apply(p, x) ** 2))(v)
    gb = jax.grad(lambda p: jnp.sum(b.apply(p, x) ** 2))(v)
    for p, q in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=2e-4, rtol=1e-4)


def test_fold_stem_s2d_kernel_exact():
    """conv7x7/s2/p3(x, W) == conv4x4/s1/p(2,1)(space_to_depth(x), fold(W))."""
    from kurosiwo_tpu.ops.phase import fold_stem_s2d_kernel, space_to_depth

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 14, 20, 3), jnp.float32)
    w = jnp.asarray(rs.randn(7, 7, 3, 5), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = lax.conv_general_dilated(
        space_to_depth(x), fold_stem_s2d_kernel(w), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == ref.shape == (2, 7, 10, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_stem_s2d_module_path_matches_standard(monkeypatch):
    """KUROSIWO_STEM_S2D=1 ConvBNAct stem: identical param tree (checkpoints
    interchangeable), matching outputs, batch stats and parameter grads."""
    from kurosiwo_tpu.ops.nn import ConvBNAct

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 16, 16, 6), jnp.float32)
    m = ConvBNAct(8, 7, 2, padding=3)
    monkeypatch.delenv("KUROSIWO_STEM_S2D", raising=False)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y_std, bs_std = m.apply(v, x, train=True, mutable=["batch_stats"])
    g_std = jax.grad(lambda p: jnp.sum(m.apply({**v, "params": p["params"]}, x, train=True,
                                               mutable=["batch_stats"])[0] ** 2))(v)

    monkeypatch.setenv("KUROSIWO_STEM_S2D", "1")
    v2 = m.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v, v2)
    y_s2d, bs_s2d = m.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_std), atol=2e-4, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        bs_s2d, bs_std,
    )
    g_s2d = jax.grad(lambda p: jnp.sum(m.apply({**v, "params": p["params"]}, x, train=True,
                                               mutable=["batch_stats"])[0] ** 2))(v)
    for p, q in zip(jax.tree.leaves(g_s2d), jax.tree.leaves(g_std)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=3e-3, rtol=1e-3)
