"""eval_microbatch: scan-of-chunks eval step (memory-fit knob for eval
configs with no remat escape hatch — ChangeFormer's f32 twin at batch 128
keeps five full-res deep-supervision heads live and OOMs a 16 GB chip).

Chunking must be invisible to the metric banks: confusion-matrix/count
accumulation is associative, and per-sample aux rows (preds, per-sample cm)
concatenate back in batch order. Only the logged eval loss changes
definition (batch-pixel-mean -> mean of chunk-pixel-means)."""

import jax
import jax.numpy as jnp
import numpy as np


def _build(cfg):
    from kurosiwo_tpu.models.factory import initialize_segmentation_model
    from kurosiwo_tpu.ops import optim
    from kurosiwo_tpu.ops.losses import create_loss
    from kurosiwo_tpu.training.state import create_train_state
    from kurosiwo_tpu.training.steps import make_eval_step

    mcfg = {"backbone": "resnet18", "learning_rate": 1e-3, "optimizer": "adam"}
    model = initialize_segmentation_model(cfg, mcfg)
    tx = optim.create_optimizer(cfg, mcfg, "segmentation")
    state, _ = create_train_state(
        model, tx, jax.random.PRNGKey(0), (jnp.zeros((2, 64, 64, 2)),)
    )
    criterion = create_loss(cfg, mode="val")
    step = make_eval_step(model, criterion, cfg, mcfg, "segmentation",
                          with_aoi=True, with_preds=True)
    return state, jax.jit(step)


def test_chunked_eval_matches_full_batch():
    from kurosiwo_tpu.ops.metrics import MetricState, derive

    cfg = {
        "task": "segmentation", "method": "unet", "num_classes": 3,
        "mixed_precision": False, "num_channels": 2, "inputs": ["post_event"],
        "weighted": False, "loss_function": "cross_entropy",
        "log_zone_metrics": False, "log_AOI_metrics": False,
    }
    rs = np.random.RandomState(0)
    batch = {
        "post": jnp.asarray(rs.randn(8, 64, 64, 2), jnp.float32),
        "mask": jnp.asarray(rs.randint(0, 4, (8, 64, 64)), jnp.int32),
        "sample_weight": jnp.ones((8,), jnp.float32),
    }
    state, full_step = _build(cfg)
    state_c, chunk_step = _build(dict(cfg, eval_microbatch=2))

    ms_f, loss_f, aux_f = full_step(state, batch, MetricState.create())
    ms_c, loss_c, aux_c = chunk_step(state_c, batch, MetricState.create())

    # confusion-matrix banks: count accumulation is associative -> exact
    np.testing.assert_allclose(np.asarray(ms_f.cm), np.asarray(ms_c.cm), atol=0)
    assert float(ms_f.count) == float(ms_c.count)
    # derived metrics identical
    df, dc = derive(ms_f.cm), derive(ms_c.cm)
    for k in df:
        np.testing.assert_allclose(np.asarray(df[k]), np.asarray(dc[k]), rtol=0, atol=0)
    # per-sample aux concatenates back in batch order
    np.testing.assert_allclose(
        np.asarray(aux_f["per_sample_cm"]), np.asarray(aux_c["per_sample_cm"]), atol=0
    )
    np.testing.assert_array_equal(np.asarray(aux_f["preds"]), np.asarray(aux_c["preds"]))
    # logged loss: mean-of-chunk-means vs batch-pixel-mean — close, not equal
    np.testing.assert_allclose(float(loss_f), float(loss_c), rtol=0.05)


def test_ragged_or_small_batch_falls_back_to_full():
    """batch <= microbatch or non-divisible batch runs the plain step."""
    from kurosiwo_tpu.ops.metrics import MetricState

    cfg = {
        "task": "segmentation", "method": "unet", "num_classes": 3,
        "mixed_precision": False, "num_channels": 2, "inputs": ["post_event"],
        "weighted": False, "loss_function": "cross_entropy",
        "log_zone_metrics": False, "log_AOI_metrics": False,
        "eval_microbatch": 3,  # does not divide 8
    }
    rs = np.random.RandomState(1)
    batch = {
        "post": jnp.asarray(rs.randn(8, 64, 64, 2), jnp.float32),
        "mask": jnp.asarray(rs.randint(0, 4, (8, 64, 64)), jnp.int32),
        "sample_weight": jnp.ones((8,), jnp.float32),
    }
    state, step = _build(cfg)
    ms, loss, aux = step(state, batch, MetricState.create())
    assert np.isfinite(float(loss))
    assert aux["preds"].shape == (8, 64, 64)
