"""Prefetching host loader -> fixed batch structs of numpy arrays.

Replaces the reference's torch DataLoader stack (utilities/utilities.py:73-126
+ Dataset.__getitem__): a thread pool decodes tiles, a seeded sampler picks
indices (50/50 positive/negative oversampling parity with Dataset.py:641-651,
made reproducible via a dedicated np.random.Generator), batches are assembled
as contiguous NHWC arrays and double-buffered ahead of the training step.

Batch struct (numpy, NHWC):
  post, pre1, pre2 : (B, H, W, C) float32   — scaled acquisitions
  mask             : (B, H, W)    int32     — labels {0,1,2,3}
  valid            : (B, H, W)    int32
  dem              : (B, H, W, 1) float32   — only when config["dem"]
  clz, activation  : (B,) int32
  sample_weight    : (B,) float32           — 0 for eval padding samples
  *_sv1/_sv2       : (B, C) float32         — scale vars when scale_input set

Eval splits pad the final partial batch to full size (sample_weight=0) so the
jitted eval step never recompiles on a ragged last batch — the reference
instead ships a ragged batch (drop_last=False) which would retrace under jit.
"""

from __future__ import annotations

import queue
import zlib
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator

import numpy as np

from .index import GridIndex, Record
from .normalize import compute_min_max_stats, scale_img
from .synthetic import synthetic_raw_sample, synthetic_records
from .tiles import RawSample, read_raw_sample


def _needs_stats(config) -> bool:
    mode = config.get("scale_input")
    return mode in ("min-max", "custom") or isinstance(mode, (list, tuple))


def resolve_process_grid(batch_size: int, process_index=None, process_count=None):
    """Shared multi-host contract for every loader (GRD/SLC/SSL): batch_size
    is the GLOBAL batch, all processes draw the same epoch indices, each
    decodes only its contiguous row block (parallel/distributed.py).
    Returns (process_index, process_count, local_batch_size); raises on
    indivisible batches (tail rows would silently never decode)."""
    if process_index is None or process_count is None:
        import jax

        process_index, process_count = jax.process_index(), jax.process_count()
    process_index, process_count = int(process_index), int(process_count)
    if batch_size % process_count:
        raise ValueError(
            f"batch_size {batch_size} not divisible by process count "
            f"{process_count} (tail rows would silently never decode)"
        )
    return process_index, process_count, batch_size // process_count


def epoch_rng(seed: int, mode: str) -> np.random.Generator:
    """Per-split epoch rng. zlib.crc32, NOT hash(): str hash is salted per
    process (PYTHONHASHSEED), which would silently desynchronize multi-host
    epoch shuffles."""
    return np.random.default_rng(seed + zlib.crc32(mode.encode()) % 65536)


class Loader:
    """Iterable over batches for one split."""

    def __init__(
        self,
        mode: str,
        config: dict,
        seed: int = 999,
        synthetic: bool | None = None,
        process_index: int | None = None,
        process_count: int | None = None,
        index_cache: dict | None = None,
    ):
        self.mode = mode
        self.config = config
        self.batch_size = int(config["batch_size"])
        self.seed = seed
        self.workers = int(config.get("num_workers", 8)) or 1

        root = Path(config.get("root_path", "."))
        if synthetic is None:
            synthetic = bool(config.get("synthetic_data")) or not (root / "data").exists()
        self.synthetic = synthetic

        if synthetic:
            if _needs_stats(config):
                # min-max/custom/[min,max] scaling reads the per-activation
                # stats table (normalize.scale_img); synthetic activation ids
                # are in no stats table, so without this the misconfiguration
                # surfaces as a bare TypeError inside a decode worker thread
                raise ValueError(
                    f"scale_input={config.get('scale_input')!r} needs per-activation "
                    "min/max stats, which do not exist for the synthetic data source "
                    "(corpus missing or synthetic_data=true); use scale_input="
                    "\"normalize\" or null for synthetic runs"
                )
            n = int(config.get("synthetic_size", {"train": 256, "val": 64, "test": 64}.get(mode, 64)))
            acts = config.get(f"{mode}_acts") or [130]
            self.records = synthetic_records(n, list(acts), seed)
            if config.get("task") == "diffusion-unsup":
                import dataclasses as _dc

                self.records = [
                    _dc.replace(r, type=t) for r in self.records for t in ("pre1", "pre2", "flood")
                ]
            self.positive_records = [r for r in self.records if r.positive]
            self.negative_records = [r for r in self.records if not r.positive]
            self.stats = None
        else:
            # prepare_loaders shares one cache across the three Loaders so
            # the stats pass below doesn't rebuild every split's index per
            # Loader (9 GridIndex walks instead of 3 on real corpora)
            cache = index_cache if index_cache is not None else {}
            # NOT cache.setdefault(m, GridIndex(...)): setdefault evaluates
            # its default eagerly, so the cached-key case would still pay the
            # full build_records walk (~700k-iteration Python filter on the
            # real corpus) and throw it away — 12 builds instead of 3
            if mode not in cache:
                cache[mode] = GridIndex(mode, config)
            index = cache[mode]
            self.records = index.records
            self.positive_records = index.positive_records
            self.negative_records = index.negative_records
            self.stats = None
            if _needs_stats(config):
                # the stats corpus spans ALL splits (reference
                # update_min_max_stats walks train+val+test, Dataset.py:493-520)
                all_records = []
                for m in ("train", "val", "test"):
                    if m not in cache:
                        cache[m] = GridIndex(m, config)
                    all_records.extend(cache[m].records)
                self.stats = compute_min_max_stats(all_records, str(root), config)

        self.oversampling = bool(config.get("oversampling")) and mode == "train"
        self._rng = epoch_rng(seed, mode)
        self._epoch = 0
        self.process_index, self.process_count, self.local_batch_size = (
            resolve_process_grid(self.batch_size, process_index, process_count)
        )

        # packed-shard fast path (data/shards.py): one memmap slice per
        # sample instead of ~9 GeoTIFF opens; falls through to tile decode
        # for records missing from the pack (or when unconfigured)
        self.shard_reader = None
        shard_root = config.get("packed_shards")
        if shard_root:
            from .shards import ShardReader

            split_dir = Path(shard_root) / mode
            if (split_dir / "manifest.json").is_file():
                self.shard_reader = ShardReader(split_dir)
                # stale-pack guard: shard bytes bake in the decode config
                self.shard_reader.check_decode_config(config)

    # -- sampling ---------------------------------------------------------
    def __len__(self):
        n = len(self.records)
        if self.mode == "train":
            return n // self.batch_size  # drop_last=True parity
        return -(-n // self.batch_size)

    def num_samples(self):
        return len(self.records)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.records)
        if self.mode != "train":
            return np.arange(n)
        if self.oversampling and self.negative_records and self.positive_records:
            # 50/50 positive/negative draws, seeded (Dataset.py:641-651);
            # a split with either side empty falls back to a plain shuffle
            # (rng.integers(0, 0) would raise at the first draw).
            # Vectorized: the per-draw scalar loop was ~1.4M Generator calls
            # plus three rebuilt identity maps per EPOCH on a 700k-record
            # corpus — seconds of single-threaded host stall at every epoch
            # boundary. The id maps are cached (records don't change between
            # epochs; the cache is only consulted when both partitions are
            # non-empty, so post-hoc single-sided splits still fall through).
            if getattr(self, "_oversample_ids", None) is None:
                by_id = {id(r): i for i, r in enumerate(self.records)}
                self._oversample_ids = (
                    np.asarray([by_id[id(r)] for r in self.positive_records]),
                    np.asarray([by_id[id(r)] for r in self.negative_records]),
                )
            pos_ids, neg_ids = self._oversample_ids
            coin = self._rng.integers(0, 2, n)
            pos_draw = pos_ids[self._rng.integers(0, len(pos_ids), n)]
            neg_draw = neg_ids[self._rng.integers(0, len(neg_ids), n)]
            return np.where(coin == 0, pos_draw, neg_draw)
        perm = self._rng.permutation(n)
        return perm

    # -- decode -----------------------------------------------------------
    def _read(self, record: Record) -> RawSample:
        if self.shard_reader is not None and record.id in self.shard_reader:
            return self.shard_reader.read(record.id)
        if self.synthetic:
            size = int(self.config.get("synthetic_patch_size", 224))
            return synthetic_raw_sample(record, self.config, size=size, seed=self.seed)
        return read_raw_sample(str(self.config.get("root_path", ".")), record, self.config)

    def _process(self, record: Record) -> dict:
        raw = self._read(record)
        cfg = self.config
        out: dict = {}
        if record.type is not None:
            # diffusion-unsup: one record per observation (Dataset.py:118-130)
            img = {"pre1": raw.pre1, "pre2": raw.pre2, "flood": raw.post}[record.type]
            if cfg.get("scale_input") is not None:
                _, _, img = scale_img(img, raw.valid == 1, record.type, raw.activation, cfg, self.stats)
            return {
                "image": img.astype(np.float32),
                "clz": np.int32(raw.clz),
                "activation": np.int32(raw.activation),
                "sample_weight": np.float32(1.0),
            }
        scale_mode = cfg.get("scale_input")
        if scale_mode is not None:
            valid_bool = raw.valid == 1
            sv = {}
            for name, img in (("flood", raw.post), ("pre1", raw.pre1), ("pre2", raw.pre2)):
                v1, v2, scaled = scale_img(img, valid_bool, name, raw.activation, cfg, self.stats)
                sv[name] = (np.asarray(v1, np.float32), np.asarray(v2, np.float32))
                out[{"flood": "post", "pre1": "pre1", "pre2": "pre2"}[name]] = scaled.astype(np.float32)
            for name in ("flood", "pre1", "pre2"):
                out[f"{name}_sv1"], out[f"{name}_sv2"] = sv[name]
        else:
            out["post"], out["pre1"], out["pre2"] = raw.post, raw.pre1, raw.pre2
        out["mask"] = raw.mask.astype(np.int32)
        out["valid"] = raw.valid.astype(np.int32)
        if cfg.get("dem"):
            out["dem"] = (
                raw.dem.astype(np.float32)
                if raw.dem is not None
                else np.zeros(raw.post.shape[:2] + (1,), np.float32)
            )
        out["clz"] = np.int32(raw.clz)
        out["activation"] = np.int32(raw.activation)
        out["sample_weight"] = np.float32(1.0)
        return out

    @staticmethod
    def _collate(samples: list[dict]) -> dict:
        keys = samples[0].keys()
        return {k: np.stack([s[k] for s in samples]) for k in keys}

    def _pad(self, samples: list[dict], target: int) -> list[dict]:
        """Pad eval batches to `target` with zero-weight copies. Padding is
        numerically inert (sample_weight 0, mask all-ignore), so its content
        needn't match across process counts."""
        pad = target - len(samples)
        if pad <= 0:
            return samples
        if samples:
            filler = {k: np.copy(v) for k, v in samples[-1].items()}
        else:
            # a process whose row block is entirely padding (tiny last batch)
            filler = {k: np.zeros_like(v) for k, v in self._process(self.records[0]).items()}
        filler["sample_weight"] = np.float32(0.0)
        if "mask" in filler:  # absent for diffusion-unsup's typed records
            filler["mask"] = np.full_like(filler["mask"], 3)  # all-ignore
        return samples + [filler] * pad

    # -- iteration --------------------------------------------------------
    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        self._epoch += 1
        bs = self.batch_size
        batches = [indices[i : i + bs] for i in range(0, len(indices), bs)]
        if self.mode == "train":
            batches = [b for b in batches if len(b) == bs]

        lo = self.process_index * self.local_batch_size
        hi = lo + self.local_batch_size

        def produce(pool, batch_ids):
            local_ids = batch_ids[lo:hi]  # this process's rows of the batch
            samples = list(pool.map(lambda i: self._process(self.records[int(i)]), local_ids))
            if self.mode != "train":
                samples = self._pad(samples, self.local_batch_size)
            return self._collate(samples)

        yield from prefetch_epoch(batches, produce, self.workers)


def prefetch_epoch(batches, produce, workers: int):
    """Double-buffered threaded prefetch shared by the GRD/SSL loaders:
    decode batch k+1 while k trains. Decode errors are enqueued and
    re-raised in the consumer (a feeder that died silently would truncate
    the epoch); an abandoned iterator (early break, train-step exception,
    GC) sets `abandoned` so the feeder never blocks forever on a full
    queue; one persistent pool serves the whole epoch (a per-batch pool
    spawns and joins `workers` OS threads every batch on the hot path).
    `produce(pool, batch_ids) -> batch dict`."""
    q: queue.Queue = queue.Queue(maxsize=2)
    stop = object()
    abandoned = threading.Event()

    def put_until_abandoned(item) -> None:
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.5)
                return
            except queue.Full:
                pass

    def feeder():
        try:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for b in batches:
                    if abandoned.is_set():
                        return
                    put_until_abandoned(produce(pool, b))
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            put_until_abandoned(("__loader_error__", e))
        finally:
            put_until_abandoned(stop)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__loader_error__":
                raise item[1]
            yield item
    finally:
        abandoned.set()
        try:  # unblock a feeder waiting on the full queue
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=10)


def prepare_loaders(config: dict, seed: int = 999):
    """Train/val/test loader triple (utilities/utilities.py:73-126 parity;
    only the RandomEvents track is supported, like the reference)."""
    if config.get("track") not in ("RandomEvents",):
        raise ValueError("No such track! We currently support only RandomEvents")
    if config.get("slc"):
        from .slc import SLCLoader

        return (
            SLCLoader("train", config, seed),
            SLCLoader("val", config, seed),
            SLCLoader("test", config, seed),
        )
    cache: dict = {}  # share split indices across the three Loaders
    return (
        Loader("train", config, seed, index_cache=cache),
        Loader("val", config, seed, index_cache=cache),
        Loader("test", config, seed, index_cache=cache),
    )
