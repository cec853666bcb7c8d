"""SLC loader against a real on-disk 4-band corpus (not the synthetic path)."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def slc_corpus(tmp_path):
    """Miniature SLC tree: JSON index + 4-band rasters + masks, incl. one
    ragged (non-224) tile that must be padded."""
    rs = np.random.RandomState(0)
    index = {}
    for i, (act, size) in enumerate([(130, 224), (130, 224), (470, 200), (514, 224)]):
        gdir = tmp_path / str(act) / "01" / f"g{i:04d}"
        gdir.mkdir(parents=True)
        for prefix in ("MS1", "SL1", "SL2"):
            bands = [rs.rand(size, size).astype(np.float32) for _ in range(4)]
            assert cv2.imwritemulti(str(gdir / f"{prefix}_slc.tif"), bands)
        cv2.imwrite(str(gdir / "MK0_MLU_mask.tif"), rs.randint(0, 4, (size, size)).astype(np.uint8))
        cv2.imwrite(str(gdir / "MK0_MNA_valid.tif"), np.ones((size, size), np.uint8))
        index[f"g{i:04d}"] = {"actid": act, "path": f"{act}/01/g{i:04d}", "aoiid": 1, "clz": 1 + i % 3}
    jpath = tmp_path / "slc_index.json"
    jpath.write_text(json.dumps(index))
    return tmp_path, jpath


def _cfg(root, jpath):
    return {
        "slc": True, "slc_root_path": str(root), "track": "RandomEvents",
        "train_json": str(jpath), "test_json": str(jpath),
        "batch_size": 2, "num_workers": 2, "channels": ["vv", "vh"],
        "scale_input": "normalize",
        "slc_mean": [2.2367e-02, 3.9242e01, 8.1130e01, 4.3526e-02],
        "slc_std": [1.2843, 25.6152, 58.0151, 1.2844],
        "slc_dem_mean": 82.96, "slc_dem_std": 153.71,
        "slc_slope_mean": 0.3977, "slc_slope_std": 0.4946,
        "dem": False, "slope": False, "uint8": False, "task": "segmentation",
        "data_augmentations": False, "synthetic_data": False, "oversampling": False,
        "train_acts": [130, 470], "val_acts": [514], "test_acts": [514],
        "clamp_input": 0.15,
    }


def test_read_multiband(slc_corpus):
    from kurosiwo_tpu.data.slc import read_multiband

    root, _ = slc_corpus
    p = next(root.rglob("MS1_slc.tif"))
    arr = read_multiband(str(p))
    assert arr.shape[-1] == 4 and arr.dtype == np.float32


def test_slc_loader_real_files(slc_corpus):
    from kurosiwo_tpu.data.slc import SLCLoader

    root, jpath = slc_corpus
    loader = SLCLoader("train", _cfg(root, jpath), seed=1, synthetic=False)
    assert len(loader.records) == 3  # acts 130, 130, 470
    batch = next(iter(loader))
    assert batch["post"].shape == (2, 224, 224, 4)  # ragged tile padded
    assert batch["mask"].shape == (2, 224, 224)
    assert np.isfinite(batch["post"]).all()
    # normalized with the slc stats -> not raw [0,1] anymore
    assert batch["post"].min() < -0.5


def test_slc_ragged_tile_padding(slc_corpus):
    from kurosiwo_tpu.data.slc import SLCLoader

    root, jpath = slc_corpus
    cfg = _cfg(root, jpath)
    loader = SLCLoader("train", cfg, seed=1, synthetic=False)
    ragged = [r for r in loader.records if r.activation == 470][0]
    raw = loader._read(ragged)
    assert raw.post.shape[:2] == (224, 224)
    # pad region of the mask is 3 (invalid)
    assert (raw.mask == 3).sum() >= 224 * 224 - 200 * 200


def test_maybe_uint8_nan_and_negative_pixels():
    """ADVICE r4 (medium): NaNs propagate through np.clip, so scattered-NaN
    rasters hit C-undefined NaN->uint8 conversion unless replaced first.
    Pin the deterministic quantization: NaN->0, negative->0, max->255."""
    from kurosiwo_tpu.data.slc import _maybe_uint8

    img = np.array([[np.nan, -5.0], [127.5, 255.0]], np.float32)
    out = _maybe_uint8(img, {"uint8": True})
    assert out.dtype == np.float32
    assert out[0, 0] == 0.0      # NaN fill, not platform-dependent garbage
    assert out[0, 1] == 0.0      # negative clipped before the cast
    assert out[1, 1] == 255.0
    # all-NaN raster: scale falls back to 1.0 and everything quantizes to 0
    out2 = _maybe_uint8(np.full((4, 4), np.nan, np.float32), {"uint8": True})
    assert (out2 == 0).all()
