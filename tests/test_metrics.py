"""Metric-bank tests: confusion-matrix derivations vs hand-computed values
and torchmetrics semantics (per-class with ignore_index=3)."""

import jax.numpy as jnp
import numpy as np

from kurosiwo_tpu.ops import metrics


def test_confusion_matrix_ignores_class3():
    labels = jnp.asarray([[0, 1, 2, 3], [1, 1, 3, 0]])
    preds = jnp.asarray([[0, 2, 2, 0], [1, 0, 1, 0]])
    cm = np.asarray(metrics.confusion_matrix(preds, labels))
    assert cm.sum() == 6  # two ignored pixels dropped
    assert cm[0, 0] == 2 and cm[1, 1] == 1 and cm[1, 2] == 1 and cm[2, 2] == 1 and cm[1, 0] == 1


def test_derive_miou_and_f1():
    cm = np.array(
        [[50, 5, 5, 0], [2, 30, 8, 0], [3, 2, 40, 0], [0, 0, 0, 0]], np.float64
    )
    d = metrics.derive(cm)
    for c in range(3):
        tp = cm[c, c]
        iou = tp / (cm[c].sum() + cm[:, c].sum() - tp)
        np.testing.assert_allclose(d["iou"][c], iou)
    np.testing.assert_allclose(d["mean_iou"], np.mean([d["iou"][c] for c in range(3)]))
    assert 0 < d["mean_f1"] <= 1


def test_water_collapse():
    labels = jnp.asarray([[1, 2, 0, 3]])
    preds = jnp.asarray([[2, 1, 0, 1]])
    cm = np.asarray(metrics.water_confusion_matrix(preds, labels))
    # classes {1,2} -> 1: preds (1,1,0), labels (1,1,0) -> all correct
    assert cm[1, 1] == 2 and cm[0, 0] == 1 and cm.sum() == 3


def test_metric_state_accumulates_and_summarizes():
    state = metrics.MetricState.create()
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 16, 16)))
    preds = jnp.asarray(np.random.RandomState(1).randint(0, 3, (2, 16, 16)))
    state = state.update(preds, labels, jnp.asarray(0.5), 2.0, clz=jnp.asarray([1, 2]))
    state = state.update(preds, labels, jnp.asarray(0.7), 2.0, clz=jnp.asarray([1, 3]))
    s = state.summarize()
    assert np.isclose(s["val_loss"], (0.5 * 2 + 0.7 * 2) / 4)
    assert s["support"].sum() == 2 * int(np.asarray((labels != 3).sum()))
    # zone banks: zone 1 saw 3 samples, zone 2 one, zone 3 one
    assert len(s["zones"]) == 3


def test_per_sample_confusion_shapes():
    labels = jnp.zeros((4, 8, 8), jnp.int32)
    preds = jnp.zeros((4, 8, 8), jnp.int32)
    cms = metrics.per_sample_confusion(preds, labels)
    assert cms.shape == (4, 4, 4)
    assert int(cms[0, 0, 0]) == 64


def test_aoi_host_bank():
    bank = metrics.HostAOIMetrics()
    cms = np.zeros((2, 4, 4), np.int64)
    cms[0, 0, 0] = 10
    cms[1, 1, 1] = 5
    bank.update(cms, np.asarray([130, 470]))
    bank.update(cms, np.asarray([130, 130]))
    out = bank.summarize()
    assert set(out.keys()) == {130, 470}
    assert out[130]["support"].sum() == 25


def test_derive_f1_low_precision_recall_regime():
    """Regression (round 3): derive()'s zero-guard used np.maximum(d, 1) which
    silently deflated F1 whenever precision+recall < 1 (caught by the parity
    round-trip test). f1 = 2pr/(p+r) must hold at small p, r."""
    from kurosiwo_tpu.ops.metrics import derive

    cm = np.zeros((4, 4), np.int64)
    cm[0, 0], cm[0, 1] = 2, 8   # class0: tp=2, support=10
    cm[1, 0], cm[1, 1] = 8, 2   # class1: tp=2, support=10; predicted0=10, predicted1=10
    out = derive(cm)
    # p = r = 0.2 -> f1 = 2*0.2*0.2/0.4 = 0.2 (the old clamp gave 0.08)
    np.testing.assert_allclose(out["fscore"][0], 0.2, rtol=1e-12)
    np.testing.assert_allclose(out["fscore"][1], 0.2, rtol=1e-12)


def test_zone_bank_single_pass_equivalence():
    """The (Z,B) one-hot contraction of per-sample cms equals the per-zone
    masked confusion matrices it replaced."""
    from kurosiwo_tpu.ops.metrics import MetricState, masked_confusion_matrix

    rng = np.random.RandomState(4)
    preds = jnp.asarray(rng.randint(0, 3, (6, 16, 16)))
    labels = jnp.asarray(rng.randint(0, 4, (6, 16, 16)))
    clz = jnp.asarray(rng.randint(1, 4, (6,)))

    ms = MetricState.create().update(preds, labels, jnp.float32(0.0), 1.0, clz=clz)
    for z in range(3):
        want = masked_confusion_matrix(preds, labels, clz == z + 1)
        np.testing.assert_array_equal(np.asarray(ms.zones[z]), np.asarray(want))
    # the main cm is the zone banks' total (clz ids cover every sample here)
    np.testing.assert_array_equal(np.asarray(ms.cm), np.asarray(ms.zones.sum(0)))


def test_metric_bank_epoch_scale_counts():
    """Epoch-scale accumulation must not wrap: int32 banks overflowed after
    ~2^31 counts in one cell (a real KuroSiwo epoch); f32 banks keep going."""
    from kurosiwo_tpu.ops.metrics import MetricState

    big = jnp.full((4, 4), 2.0**28, jnp.float32)
    ms = MetricState.create()
    for _ in range(16):  # 16 * 2^28 = 2^32 > int32 range
        ms = ms.update_from_cm(big, jnp.float32(0.0), 1.0)
    assert float(ms.cm[0, 0]) == 2.0**32
