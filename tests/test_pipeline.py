"""Input-pipeline tests: determinism, batch structure, padding, scaling."""

import numpy as np
import pytest

from kurosiwo_tpu.data import normalize
from kurosiwo_tpu.data.pipeline import Loader


def test_train_loader_batches(base_config):
    loader = Loader("train", base_config, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == base_config["synthetic_size"] // base_config["batch_size"]
    b = batches[0]
    bs = base_config["batch_size"]
    assert b["post"].shape == (bs, 224, 224, 2)
    assert b["pre1"].shape == (bs, 224, 224, 2)
    assert b["mask"].shape == (bs, 224, 224)
    assert b["mask"].dtype == np.int32
    assert set(np.unique(b["mask"])) <= {0, 1, 2, 3}
    assert b["flood_sv1"].shape[0] == bs  # scale vars present (scale_input=normalize)


def test_loader_determinism(base_config):
    a = list(Loader("train", base_config, seed=7))
    b = list(Loader("train", base_config, seed=7))
    np.testing.assert_array_equal(a[0]["post"], b[0]["post"])
    np.testing.assert_array_equal(a[0]["mask"], b[0]["mask"])
    c = list(Loader("train", base_config, seed=8))
    assert not np.array_equal(a[0]["post"], c[0]["post"])


def test_eval_loader_pads_last_batch(base_config):
    cfg = dict(base_config, synthetic_size=10, batch_size=4)
    loader = Loader("val", cfg, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    last = batches[-1]
    assert last["post"].shape[0] == 4
    assert last["sample_weight"].sum() == 2  # 10 = 4+4+2 real samples
    assert (last["mask"][last["sample_weight"] == 0] == 3).all()  # padding all-ignore


def test_dem_channel(base_config):
    cfg = dict(base_config, dem=True)
    loader = Loader("train", cfg, seed=1)
    b = next(iter(loader))
    assert b["dem"].shape == (cfg["batch_size"], 224, 224, 1)


def test_normalize_mode():
    img = np.random.RandomState(0).rand(8, 8, 2).astype(np.float32)
    cfg = {"scale_input": "normalize", "channels": ["vv", "vh"], "clamp_input": 0.15,
           "data_mean": [0.1, 0.02], "data_std": [0.04, 0.02]}
    v1, v2, out = normalize.scale_img(img, np.ones((8, 8)), "flood", 130, cfg, None)
    np.testing.assert_allclose(out[..., 0], (img[..., 0] - 0.1) / 0.04, rtol=1e-5)
    assert v1 == [0.1, 0.02]


def test_min_max_mode_uses_stats_and_clamp():
    img = np.random.RandomState(0).rand(8, 8, 2).astype(np.float32)
    stats = {130: {"flood_vv": (0.01, 0.5), "flood_vh": (0.005, 0.3)}}
    cfg = {"scale_input": "min-max", "channels": ["vv", "vh"], "clamp_input": 0.15}
    v1, v2, out = normalize.scale_img(img, np.ones((8, 8)), "flood", 130, cfg, stats)
    assert v2 == [0.15, 0.15]  # max replaced by clamp
    np.testing.assert_allclose(out[..., 0], (img[..., 0] - 0.01) / (0.15 - 0.01), rtol=1e-5)


def test_reverse_scale_roundtrip_normalize():
    img = np.random.RandomState(0).rand(8, 8, 2).astype(np.float32)
    cfg = {"scale_input": "normalize", "channels": ["vv", "vh"], "clamp_input": None,
           "data_mean": [0.1, 0.02], "data_std": [0.04, 0.02]}
    v1, v2, scaled = normalize.scale_img(img, np.ones((8, 8)), "flood", 130, cfg, None)
    back = normalize.reverse_scale_img(scaled, v1, v2, cfg)
    np.testing.assert_allclose(back, img, atol=1e-5)


def test_oversampling_draws_fifty_fifty(base_config):
    cfg = dict(base_config, oversampling=True, synthetic_size=64)
    loader = Loader("train", cfg, seed=3)
    # synthetic records alternate positive/negative; with oversampling the
    # epoch index list should draw from both partitions
    idx = loader._epoch_indices()
    recs = [loader.records[i] for i in idx]
    pos = sum(r.positive for r in recs)
    assert 0.3 < pos / len(recs) < 0.7


def test_horn_slope_flat_and_ramp():
    from kurosiwo_tpu.data.tiles import horn_slope

    flat = np.full((16, 16), 7.0, np.float32)
    np.testing.assert_allclose(horn_slope(flat), 0.0, atol=1e-6)
    ramp = np.tile(np.arange(16, dtype=np.float32), (16, 1)) * 2.0
    s = horn_slope(ramp)[2:-2, 2:-2]
    np.testing.assert_allclose(s, 2.0, rtol=1e-5)  # rise/run of the ramp


def test_stack_channels_clamp_and_ratio():
    from kurosiwo_tpu.data.tiles import stack_channels

    vv = np.array([[0.1, np.nan], [0.5, 0.02]], np.float32)
    vh = np.array([[0.05, 0.01], [np.nan, 0.3]], np.float32)
    out = stack_channels(vv, vh, ["vv", "vh"], 0.15)
    assert out.shape == (2, 2, 2)
    assert out.max() <= 0.15 and not np.isnan(out).any()
    assert out[0, 1, 0] == 0.15  # nan -> clamp value


def test_loader_decode_error_propagates(base_config):
    """A decode failure mid-epoch must raise in the consumer, not silently
    truncate the epoch (the feeder thread used to swallow it)."""
    loader = Loader("train", base_config, seed=1)
    boom = RuntimeError("corrupted tile")

    orig = loader._process
    calls = {"n": 0}

    def exploding(record):
        calls["n"] += 1
        if calls["n"] > 5:
            raise boom
        return orig(record)

    loader._process = exploding
    with pytest.raises(RuntimeError, match="corrupted tile"):
        list(loader)


def test_loader_abandoned_iterator_stops_feeder(base_config):
    """Breaking out of the batch loop early must not leave the feeder thread
    blocked on the full prefetch queue."""
    import threading

    before = threading.active_count()
    loader = Loader("train", base_config, seed=1)
    it = iter(loader)
    next(it)
    it.close()  # generator finally: sets abandoned, drains, joins
    # feeder should exit promptly
    deadline = 50
    while threading.active_count() > before and deadline:
        deadline -= 1
        import time

        time.sleep(0.1)
    assert threading.active_count() <= before, "feeder thread leaked"


def test_oversampling_single_sided_split_falls_back(base_config):
    """All-negative (or all-positive) splits shuffle instead of crashing on
    rng.integers(0, 0)."""
    cfg = dict(base_config, oversampling=True)
    loader = Loader("train", cfg, seed=1)
    loader.positive_records = []
    idx = loader._epoch_indices()
    assert len(idx) == len(loader.records)


def test_diffusion_eval_padding(base_config):
    """diffusion-unsup typed records have no 'mask' key; eval padding must
    not KeyError on the filler."""
    cfg = dict(base_config, task="diffusion-unsup", batch_size=4, synthetic_size=6)
    loader = Loader("val", cfg, seed=1)
    batches = list(loader)
    # 6 records x 3 observation types = 18 samples -> 5 batches, last padded
    assert all(b["image"].shape[0] == 4 for b in batches)
    assert batches[-1]["sample_weight"].min() == 0.0


def test_synthetic_with_stats_scaling_rejected_loudly(base_config):
    """min-max/custom scaling needs the per-activation stats table, which the
    synthetic source cannot have — must fail at construction, not as a
    TypeError inside a decode worker thread."""
    import pytest

    for mode in ("min-max", "custom", [0.0, 1.0]):
        cfg = dict(base_config, scale_input=mode)
        with pytest.raises(ValueError, match="stats"):
            Loader("train", cfg, seed=1, synthetic=True,
                   process_index=0, process_count=1)


def test_grd_uint8_nan_and_range_hardened():
    """GRD _to_uint8 mirrors slc._maybe_uint8: NaNs and out-of-range values
    must never reach the C-undefined float->uint8 cast."""
    from kurosiwo_tpu.data.tiles import _to_uint8

    img = np.array([[0.5, np.nan], [-0.25, 1.0]], np.float32)
    out = _to_uint8(img)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, [[127.0, 0.0], [0.0, 255.0]])
    # all-NaN and all-negative rasters: deterministic, no scale blowup
    assert np.all(_to_uint8(np.full((2, 2), np.nan, np.float32)) == 0.0)
    assert np.all(_to_uint8(np.full((2, 2), -3.0, np.float32)) == 0.0)
