"""Parity: fused Pallas CE+confusion-matrix tail vs the XLA formulations
(ops/losses.cross_entropy_loss, ops/metrics.confusion_matrix) — loss value,
cm counts, and gradients. Reference semantics being reproduced:
utilities/utilities.py:307-347 (weighted CE, ignore_index=3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kurosiwo_tpu.ops.losses import cross_entropy_loss
from kurosiwo_tpu.ops.metrics import confusion_matrix
from kurosiwo_tpu.ops.pallas_tail import fused_ce_cm

CW = [0.3715753140309927, 14.009780283125977, 8.20405370357821]


def _data(b=2, h=64, w=64, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, h, w, 3), dtype)
    labels = jnp.asarray(rng.randint(0, 4, size=(b, h, w)), jnp.int32)
    return logits, labels


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("weighted", [True, False])
def test_loss_and_cm_parity(dtype, weighted):
    logits, labels = _data(dtype=dtype)
    cw = jnp.asarray(CW if weighted else [1.0, 1.0, 1.0], jnp.float32)
    loss, cm = fused_ce_cm(logits, labels, cw, True)
    ref_loss = cross_entropy_loss(logits, labels, cw)
    ref_cm = confusion_matrix(jnp.argmax(logits, axis=-1), labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm, np.int64), np.asarray(ref_cm, np.int64))


def test_padding_path():
    # B*H*W not divisible by the 512*128 block: exercises ignore-padding
    logits, labels = _data(b=1, h=48, w=40)
    loss, cm = fused_ce_cm(logits, labels, jnp.asarray(CW), True)
    ref_loss = cross_entropy_loss(logits, labels, jnp.asarray(CW))
    ref_cm = confusion_matrix(jnp.argmax(logits, axis=-1), labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm, np.int64), np.asarray(ref_cm, np.int64))


def test_all_ignored():
    logits, _ = _data(b=1, h=64, w=64)
    labels = jnp.full((1, 64, 64), 3, jnp.int32)
    loss, cm = fused_ce_cm(logits, labels, jnp.asarray(CW), True)
    assert float(loss) == 0.0
    assert int(np.asarray(cm).sum()) == 0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_parity(dtype):
    logits, labels = _data(dtype=dtype, seed=3)
    cw = jnp.asarray(CW, jnp.float32)

    g_fused = jax.grad(lambda l: fused_ce_cm(l, labels, cw, True)[0] * 3.0)(logits)
    g_ref = jax.grad(lambda l: cross_entropy_loss(l, labels, cw) * 3.0)(logits)
    tol = 1e-6 if dtype == jnp.float32 else 2e-3
    np.testing.assert_allclose(
        np.asarray(g_fused, np.float32), np.asarray(g_ref, np.float32), atol=tol
    )


def test_argmax_tie_semantics():
    # equal logits: argmax picks the first class; cm must agree
    logits = jnp.zeros((1, 64, 64, 3), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, (1, 64, 64)), jnp.int32)
    _, cm = fused_ce_cm(logits, labels, jnp.ones((3,)), True)
    ref_cm = confusion_matrix(jnp.argmax(logits, axis=-1), labels)
    np.testing.assert_array_equal(np.asarray(cm, np.int64), np.asarray(ref_cm, np.int64))


def test_train_step_fused_vs_xla_tail():
    """The fused tail wired through make_train_step produces the same loss,
    confusion matrix, and parameter update as the XLA tail (single device,
    plain jit — no mesh)."""
    import flax.linen as nn
    import optax

    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.ops.metrics import MetricState
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_train_step

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Conv(3, (3, 3))(x)

    cfg = {
        "task": "segmentation", "method": "tiny", "num_classes": 3,
        "inputs": ["post_event"], "channels": ["vv", "vh"],
        "class_weights": CW, "weighted": True, "loss_function": "cross_entropy",
        "batch_size": 2, "optimizer": "adam", "learning_rate": 1e-3,
    }
    model = Tiny()
    tx = optim.create_optimizer(cfg, {"learning_rate": 1e-3}, "segmentation")
    criterion = create_loss(cfg, mode="train")
    rng = np.random.RandomState(0)
    batch = {
        "post": jnp.asarray(rng.randn(2, 64, 64, 2), jnp.float32),
        "mask": jnp.asarray(rng.randint(0, 4, (2, 64, 64)), jnp.int32),
    }
    results = {}
    for fused in (True, False):
        c = dict(cfg, fused_tail=fused)
        state, _ = create_train_state(model, tx, jax.random.PRNGKey(0), (batch["post"],))
        if fused:
            # eligibility requires 1 device (resolve_fused_tail raises on an
            # explicit-but-ineligible flag); tests run on the virtual
            # 8-device mesh, so pin to single-device via a monkeypatched count
            real = jax.device_count
            jax.device_count = lambda *a, **k: 1
            try:
                step = make_train_step(model, tx, criterion, c, {}, "segmentation")
            finally:
                jax.device_count = real
        else:
            step = make_train_step(model, tx, criterion, c, {}, "segmentation")
        ms = MetricState.create()
        new_state, ms, loss = jax.jit(step)(
            state, batch, ms, jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(1)
        )
        results[fused] = (float(loss), np.asarray(ms.cm), new_state.params)
    lf, cmf, pf = results[True]
    lr_, cmr, pr = results[False]
    np.testing.assert_allclose(lf, lr_, rtol=2e-5)
    np.testing.assert_array_equal(cmf, cmr)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_phase_variant_parity():
    """fused_ce_cm_phase on phase logits == XLA loss/cm on the interleaved
    logits; gradients equal the space-to-depth of the full-res gradient."""
    from kurosiwo_tpu.ops.pallas_tail import fused_ce_cm_phase
    from kurosiwo_tpu.ops.phase import depth_to_space, space_to_depth

    rs = np.random.RandomState(7)
    B, H, W = 2, 32, 32  # phase grid; full res 64x64
    z = jnp.asarray(rs.randn(B, H, W, 12), jnp.float32)
    labels = jnp.asarray(rs.randint(0, 4, (B, 2 * H, 2 * W)), jnp.int32)
    cw = jnp.asarray(CW, jnp.float32)

    full = depth_to_space(z)
    ref_loss = cross_entropy_loss(full, labels, cw)
    ref_cm = confusion_matrix(jnp.argmax(full, axis=-1), labels)
    loss, cm = fused_ce_cm_phase(z, labels, cw, True)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm, np.int64), np.asarray(ref_cm, np.int64))

    g_phase = jax.grad(lambda zz: fused_ce_cm_phase(zz, labels, cw, True)[0] * 2.0)(z)
    g_full = jax.grad(lambda ff: cross_entropy_loss(ff, labels, cw) * 2.0)(full)
    np.testing.assert_allclose(
        np.asarray(g_phase), np.asarray(space_to_depth(g_full)), atol=1e-6
    )


def test_phase_variant_bf16_and_padding():
    from kurosiwo_tpu.ops.pallas_tail import fused_ce_cm_phase
    from kurosiwo_tpu.ops.phase import depth_to_space

    rs = np.random.RandomState(8)
    B, H, W = 1, 24, 16  # rows B*H=24 not a multiple of ROWS: padding path
    z = jnp.asarray(rs.randn(B, H, W, 12), jnp.bfloat16)
    labels = jnp.asarray(rs.randint(0, 4, (B, 2 * H, 2 * W)), jnp.int32)
    cw = jnp.asarray(CW, jnp.float32)
    loss, cm = fused_ce_cm_phase(z, labels, cw, True)
    full = depth_to_space(z)
    ref_loss = cross_entropy_loss(full, labels, cw)
    ref_cm = confusion_matrix(jnp.argmax(full, axis=-1), labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(cm, np.int64), np.asarray(ref_cm, np.int64))


def test_train_step_phase_tail_vs_xla():
    """fused_tail='phase' through make_train_step with the real UNet (phase
    logits emitted by the model) == the XLA-tail step: same loss, cm, and
    updated params."""
    import optax

    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.ops.metrics import MetricState
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_train_step

    cfg0 = {
        "task": "segmentation", "method": "unet", "num_classes": 3,
        "inputs": ["post_event"], "channels": ["vv", "vh"], "num_channels": 2,
        "class_weights": CW, "weighted": True, "loss_function": "cross_entropy",
        "batch_size": 2, "optimizer": "adam", "learning_rate": 1e-3,
        "mixed_precision": False,
    }
    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3}
    rng = np.random.RandomState(0)
    batch = {
        "post": jnp.asarray(rng.randn(2, 64, 64, 2), jnp.float32),
        "mask": jnp.asarray(rng.randint(0, 4, (2, 64, 64)), jnp.int32),
    }
    results = {}
    import kurosiwo_tpu.training.steps as steps_mod

    real = jax.device_count
    jax.device_count = lambda *a, **k: 1
    try:
        for mode in ("phase", None):
            c = dict(cfg0)
            if mode:
                c["fused_tail"] = mode
            model = initialize_segmentation_model(c, mcfg)
            tx = optim.create_optimizer(c, mcfg, "segmentation")
            state, _ = create_train_state(model, tx, jax.random.PRNGKey(0), (batch["post"],))
            step = make_train_step(model, tx, create_loss(c, "train"), c, mcfg, "segmentation")
            ms = MetricState.create()
            new_state, ms, loss = jax.jit(step)(
                state, batch, ms, jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(1)
            )
            results[mode] = (float(loss), np.asarray(ms.cm), new_state.params)
    finally:
        jax.device_count = real
    lf, cmf, pf = results["phase"]
    lr_, cmr, pr = results[None]
    np.testing.assert_allclose(lf, lr_, rtol=2e-5)
    np.testing.assert_array_equal(cmf, cmr)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pr)):
        # adam's first step is ~lr*sign(g); near-zero grads flip sign under
        # reduction-order noise, so tolerance is a fraction of lr=1e-3
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_resolve_fused_tail_auto():
    """Auto default: phase-native kernel only for unet/seg/CE/3-class on ONE
    TPU chip; explicit config always wins; CPU (this suite) resolves None."""
    from kurosiwo_tpu.ops.pallas_tail import resolve_fused_tail

    base = {"method": "unet", "loss_function": "cross_entropy", "num_classes": 3}
    # this suite runs on the virtual CPU mesh -> auto resolves to the XLA tail
    assert resolve_fused_tail(base) is None
    # False coerces to None = XLA tail, always allowed
    assert resolve_fused_tail({**base, "fused_tail": False}) is None
    # an explicit fused request on the 8-device mesh names its blocker...
    with pytest.raises(ValueError, match="single device"):
        resolve_fused_tail({**base, "fused_tail": "phase"})
    # ...but non-strict resolution (model factory / eval step: they only
    # need the phase-logits fact) still honors it — a phase-trained
    # checkpoint stays loadable for multi-device eval
    assert resolve_fused_tail({**base, "fused_tail": "phase"}, strict=False) == "phase"
    # "phase" on a model whose head can't emit phase logits is a blocker
    with pytest.raises(ValueError, match="unet segmentation head"):
        resolve_fused_tail({**base, "method": "unetplusplus", "fused_tail": "phase"})

    # on a single TPU chip the auto default turns on exactly for the
    # unet segmentation config (simulate backend/device count)
    import jax

    real_count, real_backend = jax.device_count, jax.default_backend
    jax.device_count = lambda: 1
    jax.default_backend = lambda: "tpu"
    try:
        # explicit values are honored when eligible
        assert resolve_fused_tail({**base, "fused_tail": "phase"}) == "phase"
        assert resolve_fused_tail({**base, "fused_tail": True}) is True
        assert resolve_fused_tail(base) == "phase"
        assert resolve_fused_tail(base, task="cd") is None
        assert resolve_fused_tail({**base, "method": "snunet"}) is None
        assert resolve_fused_tail({**base, "num_classes": 2}) is None
        assert resolve_fused_tail({**base, "loss_function": "dice"}) is None
        assert resolve_fused_tail({**base, "log_zone_metrics": True}) is None
        # explicit + ineligible raises rather than silently falling back
        with pytest.raises(ValueError, match="multi_scale_train"):
            resolve_fused_tail({**base, "fused_tail": True},
                               model_config={"multi_scale_train": True})
        jax.device_count = lambda: 8
        assert resolve_fused_tail(base) is None
    finally:
        jax.device_count, jax.default_backend = real_count, real_backend
