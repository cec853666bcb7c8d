"""Input-pipeline decode benchmark: GeoTIFF decode paths vs packed shards.

SURVEY.md §7 names the reference's per-sample tile decode (7-9 cv2 GeoTIFF
opens per sample, /root/reference/dataset/Dataset.py:824-860) as the input
bottleneck for >=4k patches/sec/chip. This script pins the repo's three
host-side answers with numbers on a synthetic on-disk corpus:

  * cv2           — per-tile imread (what the reference does, Dataset.py:824)
  * native pool   — native/tile_decoder.cpp libtiff thread pool
  * packed shards — data/shards.py memmap records (one read per SAMPLE,
                    not per tile)

Warm rows measure decode + page-cache memcpy (all paths converge to
memcpy-class there). Cold rows (--cold, default on) evict the corpus from
the page cache with posix_fadvise(POSIX_FADV_DONTNEED) before every timed
repeat, exposing the per-OPEN cost the packed shards exist to kill: the
reference pays 7-9 open+read+decode round-trips per sample
(/root/reference/dataset/Dataset.py:660-768); the shards pay exactly one.

Usage: python scripts/bench_loader.py [--samples N] [--repeats K]
Prints one JSON line per path: tiles/s (or samples/s) and MB/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, n_samples: int, size: int = 224) -> list[list[str]]:
    """n_samples x 7 single-band float32 GeoTIFF tiles (vv/vh x 3 events + dem),
    mirroring the reference's per-sample file layout."""
    import cv2

    rng = np.random.RandomState(0)
    sample_paths = []
    for s in range(n_samples):
        paths = []
        for t in range(7):
            p = os.path.join(root, f"s{s:04d}_t{t}.tif")
            assert cv2.imwrite(p, rng.rand(size, size).astype(np.float32))
            paths.append(p)
        sample_paths.append(paths)
    return sample_paths


def drop_page_cache(paths: list[str]) -> None:
    """Evict `paths` from the page cache (ext4; no-op on tmpfs).

    Dirty pages survive DONTNEED, so sync first. This is per-file fadvise,
    not a global drop_caches — nothing outside the bench corpus is touched.
    """
    os.sync()
    for p in paths:
        fd = os.open(p, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)


def bench(label: str, fn, total_tiles: int, total_bytes: int, repeats: int,
          cold_paths: list[str] | None = None):
    fn()  # warm-up (pool spin-up, lazy imports); cold mode re-evicts below
    times = []
    for _ in range(repeats):
        if cold_paths is not None:
            drop_page_cache(cold_paths)
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(json.dumps({
        "path": label,
        "tiles_per_s": round(total_tiles / dt, 1),
        "MB_per_s": round(total_bytes / dt / 1e6, 1),
        "median_s": round(dt, 4),
        "repeats": repeats,
    }))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from kurosiwo_tpu.data import native

    with tempfile.TemporaryDirectory() as root:
        sample_paths = build_corpus(root, args.samples, args.size)
        flat = [p for ps in sample_paths for p in ps]
        tile_bytes = args.size * args.size * 4
        total_bytes = len(flat) * tile_bytes

        import cv2

        cv2_fn = lambda: [cv2.imread(p, cv2.IMREAD_ANYDEPTH) for p in flat]
        bench("cv2 per-tile imread (reference path)",
              cv2_fn, len(flat), total_bytes, args.repeats)
        bench("cv2 per-tile imread (reference path, COLD cache)",
              cv2_fn, len(flat), total_bytes, args.repeats, cold_paths=flat)

        if native.available():
            native_fn = lambda: native.decode_batch(flat, tile_pixels=args.size * args.size)
            bench("native libtiff pool (tile_decoder.cpp)",
                  native_fn, len(flat), total_bytes, args.repeats)
            bench("native libtiff pool (tile_decoder.cpp, COLD cache)",
                  native_fn, len(flat), total_bytes, args.repeats, cold_paths=flat)
        else:
            print(json.dumps({"path": "native libtiff pool", "skipped": "toolchain unavailable"}))

        # packed shards: one memmap read per SAMPLE (7 tiles' worth of data)
        from kurosiwo_tpu.data.pipeline import Loader
        from kurosiwo_tpu.data.shards import ShardReader, pack_split

        cfg = {"task": "cd", "batch_size": 4, "synthetic_data": True,
               "synthetic_size": args.samples, "num_workers": 0,
               "track": "RandomEvents", "inputs": ["pre_event_1", "post_event"],
               "channels": ["vv", "vh"], "dem": True, "oversampling": False,
               "synthetic_patch_size": args.size}
        loader = Loader("train", cfg, seed=3, synthetic=True,
                        process_index=0, process_count=1)
        shard_dir = os.path.join(root, "packed")
        pack_split(loader, shard_dir, img_dtype="float16", records_per_shard=64)
        reader = ShardReader(shard_dir)
        keys = [rec.id for rec in loader.records]
        # bytes actually read per sample: 3 imgs f16 + mask/valid i8 + dem f32
        rec_bytes = reader.record_nbytes if hasattr(reader, "record_nbytes") else (
            3 * 2 * args.size * args.size * 2 + 2 * args.size * args.size
            + 4 * args.size * args.size)
        bench("packed shards (memmap, f16, per-sample)",
              lambda: [reader.read(k) for k in keys],
              len(keys) * 7, rec_bytes * len(keys), args.repeats)

        # Cold row: fadvise(DONTNEED) cannot evict pages that are still
        # mapped, so each repeat opens a FRESH reader (maps die with it at
        # the end of the run, before the next eviction). The per-repeat
        # manifest.json parse is included — it is one open per EPOCH in
        # real use, vs the reference's 7-9 opens per SAMPLE.
        del reader
        shard_files = [str(p) for p in Path(shard_dir).iterdir()]

        def shards_cold():
            r = ShardReader(shard_dir)
            out = [r.read(k) for k in keys]
            del r, out

        bench("packed shards (memmap, f16, per-sample, COLD cache)",
              shards_cold, len(keys) * 7, rec_bytes * len(keys), args.repeats,
              cold_paths=shard_files)


if __name__ == "__main__":
    main()
