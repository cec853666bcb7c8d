"""Packed-shard sample store: the TPU-native answer to the reference's
host-bound tile decode.

The reference opens 7-9 small GeoTIFFs per sample through cv2 on every
epoch (`/root/reference/dataset/Dataset.py:824-860` via `read_tif_pair`),
which SURVEY.md §7 names as the input-pipeline bottleneck for ≥4k
patches/sec/chip. This module converts a corpus once into fixed-record
binary shards (TFRecord/array-record style, but with O(1) random access by
row) that the Loader memory-maps: one `memmap` slice per sample instead of
~9 file opens + decodes, no decompression on the hot path, and the OS page
cache does the prefetching.

Layout of a packed split directory:

  manifest.json   field table {name: {shape, dtype, offset, nbytes}},
                  record_nbytes, records_per_shard, shard list, key list
  shard_00000.bin records_per_shard fixed-size records, concatenated

Keys are `Record.id` strings; the manifest maps key -> global row. Images
default to float16 (half the disk/read bandwidth of the f32 decode; SAR
backscatter magnitudes lose <1e-3 relative precision) — pass
`dtype="float32"` to `pack_split` for bit-exact storage.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from .tiles import RawSample

_IMG_FIELDS = ("post", "pre1", "pre2")


def _field_table(sample: RawSample, img_dtype: str) -> tuple[dict, int]:
    fields = {}
    offset = 0
    for name in _IMG_FIELDS:
        arr = getattr(sample, name)
        fields[name] = {"shape": list(arr.shape), "dtype": img_dtype, "offset": offset}
        offset += int(np.prod(arr.shape)) * np.dtype(img_dtype).itemsize
    for name, arr in (("mask", sample.mask), ("valid", sample.valid)):
        fields[name] = {"shape": list(arr.shape), "dtype": "int8", "offset": offset}
        offset += int(np.prod(arr.shape))
    if sample.dem is not None:
        fields["dem"] = {"shape": list(sample.dem.shape), "dtype": "float32", "offset": offset}
        offset += int(np.prod(sample.dem.shape)) * 4
    fields["clz"] = {"shape": [], "dtype": "int32", "offset": offset}
    offset += 4
    fields["activation"] = {"shape": [], "dtype": "int32", "offset": offset}
    offset += 4
    return fields, offset


class ShardWriter:
    """Streams RawSamples into fixed-record shards + manifest."""

    def __init__(self, out_dir: str | os.PathLike, img_dtype: str = "float16",
                 records_per_shard: int = 512, decode_config: dict | None = None):
        self.dir = Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.img_dtype = img_dtype
        self.records_per_shard = records_per_shard
        self.decode_config = decode_config
        self.fields = None
        self.record_nbytes = 0
        self.keys: list[str] = []
        self._fh = None
        self._shards: list[dict] = []

    def add(self, key: str, sample: RawSample) -> None:
        if self.fields is None:
            self.fields, self.record_nbytes = _field_table(sample, self.img_dtype)
        if len(self.keys) % self.records_per_shard == 0:
            if self._fh:
                self._fh.close()
            name = f"shard_{len(self._shards):05d}.bin"
            self._shards.append({"file": name, "count": 0})
            self._fh = open(self.dir / name, "wb")
        buf = bytearray(self.record_nbytes)
        for name, spec in self.fields.items():
            if name == "dem":
                arr = sample.dem
            elif name in ("clz", "activation"):
                arr = np.asarray(getattr(sample, name))
            else:
                arr = getattr(sample, name)
            flat = np.ascontiguousarray(arr, dtype=np.dtype(spec["dtype"])).tobytes()
            buf[spec["offset"] : spec["offset"] + len(flat)] = flat
        self._fh.write(bytes(buf))
        self._shards[-1]["count"] += 1
        self.keys.append(key)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        manifest = {
            "record_nbytes": self.record_nbytes,
            "records_per_shard": self.records_per_shard,
            "img_dtype": self.img_dtype,
            "fields": self.fields,
            "shards": self._shards,
            "keys": self.keys,
        }
        if self.decode_config is not None:
            manifest["decode_config"] = self.decode_config
        with open(self.dir / "manifest.json", "w") as f:
            json.dump(manifest, f)


class ShardReader:
    """Memory-mapped random access to a packed split. Thread-safe for reads
    (numpy memmap slices); maps are created lazily per shard."""

    def __init__(self, split_dir: str | os.PathLike):
        self.dir = Path(split_dir)
        with open(self.dir / "manifest.json") as f:
            m = json.load(f)
        self.fields = m["fields"]
        self.record_nbytes = m["record_nbytes"]
        self.per_shard = m["records_per_shard"]
        self.shards = m["shards"]
        self.decode_config = m.get("decode_config")  # None on legacy packs
        self.rows = {k: i for i, k in enumerate(m["keys"])}
        self._maps: dict[int, np.memmap] = {}

    def check_decode_config(self, config: dict) -> None:
        """Raise if this pack was written under a different decode config —
        a stale pack otherwise silently serves data decoded under old
        channels/clamp/uint8/DEM settings (channel-count changes at least
        fail on shape; clamp/uint8 changes do not). Legacy packs without a
        fingerprint are accepted as-is."""
        if self.decode_config is None:
            return
        want = decode_fingerprint(config)
        if want != self.decode_config:
            diff = {
                k: (self.decode_config.get(k), want.get(k))
                for k in set(want) | set(self.decode_config)
                if self.decode_config.get(k) != want.get(k)
            }
            raise ValueError(
                f"packed shards at {self.dir} were written under a different "
                f"decode config (packed vs current): {diff}; re-pack the split "
                "or align the config"
            )

    def __contains__(self, key: str) -> bool:
        return key in self.rows

    def __len__(self) -> int:
        return len(self.rows)

    def _map(self, shard_idx: int) -> np.memmap:
        mm = self._maps.get(shard_idx)
        if mm is None:
            spec = self.shards[shard_idx]
            mm = np.memmap(self.dir / spec["file"], dtype=np.uint8, mode="r",
                           shape=(spec["count"] * self.record_nbytes,))
            self._maps[shard_idx] = mm
        return mm

    def read(self, key: str) -> RawSample:
        row = self.rows[key]
        mm = self._map(row // self.per_shard)
        base = (row % self.per_shard) * self.record_nbytes

        def field(name, cast=None):
            spec = self.fields.get(name)
            if spec is None:
                return None
            dt = np.dtype(spec["dtype"])
            n = int(np.prod(spec["shape"])) if spec["shape"] else 1
            # zero-copy view of the memmap; the astype/copy below is the
            # ONLY pass over the bytes (a bytes() staging copy of the whole
            # ~1 MB record measured ~2x slower in scripts/bench_loader.py)
            arr = np.frombuffer(mm, dtype=dt, count=n, offset=base + spec["offset"])
            arr = arr.reshape(spec["shape"]) if spec["shape"] else arr[0]
            if cast is not None:
                return arr.astype(cast)
            # no-cast fields leave the read-only view — copy so downstream
            # augmentation may write in place
            return arr.copy() if isinstance(arr, np.ndarray) else arr

        return RawSample(
            post=field("post", np.float32),
            pre1=field("pre1", np.float32),
            pre2=field("pre2", np.float32),
            mask=field("mask", np.int32),
            valid=field("valid", np.int32),
            dem=field("dem"),
            clz=int(field("clz")),
            activation=int(field("activation")),
        )


def decode_fingerprint(config: dict) -> dict:
    """The config keys that change what a decoded RawSample CONTAINS (not
    how it is normalized on device — that runs per-step from the live
    config). A pack made under one fingerprint silently serves wrong data
    under another: channel stack, clamping, uint8 quantization and the DEM
    band's host-side standardization are all baked into the shard bytes."""
    fp = {
        "channels": list(config.get("channels", [])),
        "clamp_input": config.get("clamp_input"),
        "uint8": bool(config.get("uint8")),
        "dem": bool(config.get("dem")),
        "slope": bool(config.get("slope")),
        "slc": bool(config.get("slc")),
        # read_dem standardizes host-side iff scale_input is set
        "dem_standardized": config.get("scale_input") is not None,
    }
    if fp["dem"] and fp["dem_standardized"]:
        for k in ("dem_mean", "dem_std", "slope_mean", "slope_std"):
            if k in config:
                fp[k] = config[k]
    return fp


def pack_split(loader, out_dir: str | os.PathLike, img_dtype: str = "float16",
               records_per_shard: int = 512, workers: int = 8) -> int:
    """Pack every record a Loader can decode into `out_dir`. Returns the
    number of packed samples. `loader` is a kurosiwo_tpu Loader (its _read
    does the GeoTIFF/native decode once, here, instead of every epoch).

    Decodes run on a thread pool (IO/GIL-releasing tile reads) while the
    single writer thread appends in deterministic record order — shard
    layout is identical to a serial pack."""
    from concurrent.futures import ThreadPoolExecutor

    w = ShardWriter(out_dir, img_dtype=img_dtype, records_per_shard=records_per_shard,
                    decode_config=decode_fingerprint(loader.config))
    if workers <= 1:
        for rec in loader.records:
            w.add(rec.id, loader._read(rec))
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            # chunked so pending futures/results stay bounded on huge corpora
            chunk = 1024
            for i in range(0, len(loader.records), chunk):
                block = loader.records[i : i + chunk]
                for rec, sample in zip(block, pool.map(loader._read, block)):
                    w.add(rec.id, sample)
    w.close()
    return len(w.keys)
