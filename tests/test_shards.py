"""Packed-shard store (data/shards.py): pack -> memmap read round-trip and
Loader integration (identical batches from shards vs direct decode)."""

import numpy as np

from kurosiwo_tpu.data.pipeline import Loader
from kurosiwo_tpu.data.shards import ShardReader, pack_split


def _cfg(**over):
    cfg = {
        "task": "cd",
        "batch_size": 4,
        "synthetic_data": True,
        "synthetic_size": 10,
        "num_workers": 0,
        "track": "RandomEvents",
        "inputs": ["pre_event_1", "post_event"],
        "channels": ["vv", "vh"],
        "dem": True,
        "oversampling": False,
        "synthetic_patch_size": 32,
    }
    cfg.update(over)
    return cfg


def test_pack_and_read_roundtrip(tmp_path):
    cfg = _cfg()
    loader = Loader("train", cfg, seed=3, synthetic=True,
                    process_index=0, process_count=1)
    n = pack_split(loader, tmp_path / "train", img_dtype="float32",
                   records_per_shard=4)
    assert n == len(loader.records)

    reader = ShardReader(tmp_path / "train")
    assert len(reader) == n
    for rec in loader.records:
        direct = loader._read(rec)
        packed = reader.read(rec.id)
        np.testing.assert_array_equal(packed.post, direct.post)
        np.testing.assert_array_equal(packed.pre1, direct.pre1)
        np.testing.assert_array_equal(packed.mask, direct.mask)
        np.testing.assert_array_equal(packed.valid, direct.valid)
        np.testing.assert_array_equal(packed.dem, direct.dem)
        assert packed.clz == direct.clz and packed.activation == direct.activation


def test_loader_uses_packed_shards(tmp_path):
    cfg = _cfg()
    src = Loader("train", cfg, seed=3, synthetic=True,
                 process_index=0, process_count=1)
    pack_split(src, tmp_path / "train", img_dtype="float32", records_per_shard=8)

    cfg_packed = _cfg(packed_shards=str(tmp_path))
    a = Loader("train", cfg_packed, seed=3, synthetic=True,
               process_index=0, process_count=1)
    assert a.shard_reader is not None
    b = Loader("train", _cfg(), seed=3, synthetic=True,
               process_index=0, process_count=1)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
        break  # one batch is enough; decode paths differ only at _read

    # float16 pack: loader still runs, values within half-precision error
    # (fresh direct loader: iterating `b` above advanced its epoch shuffle)
    pack_split(src, tmp_path / "train", img_dtype="float16", records_per_shard=8)
    c = Loader("train", cfg_packed, seed=3, synthetic=True,
               process_index=0, process_count=1)
    b2 = Loader("train", _cfg(), seed=3, synthetic=True,
                process_index=0, process_count=1)
    for bc, bb in zip(c, b2):
        np.testing.assert_allclose(bc["post"], bb["post"], atol=2e-3, rtol=2e-3)
        break


def test_pack_without_dem(tmp_path):
    """Optional-field layout: a corpus packed with dem=False omits the dem
    field and reads back with dem=None."""
    cfg = _cfg(dem=False)
    loader = Loader("val", cfg, seed=5, synthetic=True,
                    process_index=0, process_count=1)
    pack_split(loader, tmp_path / "val", img_dtype="float32", records_per_shard=4)
    reader = ShardReader(tmp_path / "val")
    rec = loader.records[0]
    packed = reader.read(rec.id)
    direct = loader._read(rec)
    assert "dem" not in reader.fields
    assert packed.dem is None
    np.testing.assert_array_equal(packed.post, direct.post)
    np.testing.assert_array_equal(packed.mask, direct.mask)


def test_stale_pack_decode_config_mismatch_raises(tmp_path):
    """A pack made under one decode config must not silently serve data to a
    loader configured differently (clamp/uint8 changes don't even fail on
    shape) — the manifest fingerprint makes it loud."""
    import pytest

    src = Loader("train", _cfg(), seed=3, synthetic=True,
                 process_index=0, process_count=1)
    pack_split(src, tmp_path / "train", img_dtype="float32", records_per_shard=8)

    with pytest.raises(ValueError, match="decode config"):
        Loader("train", _cfg(packed_shards=str(tmp_path), clamp_input=0.3),
               seed=3, synthetic=True, process_index=0, process_count=1)
    with pytest.raises(ValueError, match="decode config"):
        Loader("train", _cfg(packed_shards=str(tmp_path), uint8=True),
               seed=3, synthetic=True, process_index=0, process_count=1)
    # same config still loads
    ok = Loader("train", _cfg(packed_shards=str(tmp_path)),
                seed=3, synthetic=True, process_index=0, process_count=1)
    assert ok.shard_reader is not None


def test_legacy_pack_without_fingerprint_accepted(tmp_path):
    """Packs written before the fingerprint existed load as-is."""
    import json

    src = Loader("train", _cfg(), seed=3, synthetic=True,
                 process_index=0, process_count=1)
    pack_split(src, tmp_path / "train", img_dtype="float32", records_per_shard=8)
    mpath = tmp_path / "train" / "manifest.json"
    m = json.loads(mpath.read_text())
    del m["decode_config"]
    mpath.write_text(json.dumps(m))
    ok = Loader("train", _cfg(packed_shards=str(tmp_path), clamp_input=0.3),
                seed=3, synthetic=True, process_index=0, process_count=1)
    assert ok.shard_reader is not None
