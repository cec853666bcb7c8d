"""SSL (unlabeled) corpus loader for MAE pretraining.

Parity with SSLDataset (`/root/reference/dataset/Dataset.py:864-983`):
  * recursive walk of every grid dir under root/data, cached to
    ssl_samples.pkl; deterministic shuffle with seed 999;
  * per sample: 3 events x 2 pols -> clamp/nan -> hardcoded corpus stats
    normalize (mean [0.0953, 0.0264], std [0.0427, 0.0215]) -> channel order
    (flood, pre1, pre2) -> 6-channel stack;
  * augmentation RandomResizedCrop(scale 0.2-1.0) + HFlip(0.5) — applied on
    host here with numpy (bicubic crop-resize like the reference's
    interpolation=3); the loader is shuffle=False because the sample list is
    pre-shuffled, like the reference.
"""

from __future__ import annotations

import os
import pickle
import random
from pathlib import Path

import numpy as np

from .tiles import _imread, list_tile_files, stack_channels

SSL_MEAN = np.array([0.0953, 0.0264], np.float32)
SSL_STD = np.array([0.0427, 0.0215], np.float32)


def walk_ssl_samples(root_path: str, cache: str = "ssl_samples.pkl") -> list[str]:
    if os.path.isfile(cache):
        with open(cache, "rb") as f:
            samples = pickle.load(f)
    else:
        samples = []
        data_root = Path(root_path) / "data"
        for event in sorted(os.listdir(data_root)):
            folder_dir = data_root / event
            if not folder_dir.is_dir():
                continue
            for folder in sorted(os.listdir(folder_dir)):
                if ".gpkg" in folder:
                    continue
                subfolder_dir = folder_dir / folder
                if not subfolder_dir.is_dir():
                    continue
                for subfolder in sorted(os.listdir(subfolder_dir)):
                    hashes_dir = subfolder_dir / subfolder
                    if not hashes_dir.is_dir():
                        samples.append(str(subfolder_dir))
                        continue
                    for hash_folder in sorted(os.listdir(hashes_dir)):
                        p = hashes_dir / hash_folder
                        samples.append(str(subfolder_dir / subfolder) if p.is_file() else str(p))
        with open(cache, "wb") as f:
            pickle.dump(samples, f)
    random.Random(999).shuffle(samples)
    return samples


def random_resized_crop_flip(img: np.ndarray, rng: np.random.Generator, size: int = 224,
                             scale=(0.2, 1.0)) -> np.ndarray:
    """HWC random-resized-crop (area-scale sampling) + horizontal flip 0.5."""
    import cv2 as cv

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(target_area * ar)))
        ch = int(round(np.sqrt(target_area / ar)))
        if cw <= w and ch <= h:
            y0 = rng.integers(0, h - ch + 1)
            x0 = rng.integers(0, w - cw + 1)
            crop = img[y0 : y0 + ch, x0 : x0 + cw]
            break
    else:
        crop = img
    out = cv.resize(crop, (size, size), interpolation=cv.INTER_CUBIC)
    if out.ndim == 2:
        out = out[..., None]
    if rng.uniform() < 0.5:
        out = out[:, ::-1]
    return np.ascontiguousarray(out)


class SSLLoader:
    """Batches of augmented 6-channel images for MAE: {"image": (B,224,224,6)}."""

    def __init__(self, config: dict, seed: int = 999, synthetic: bool | None = None):
        self.config = config
        self.batch_size = int(config["batch_size"])
        self.workers = int(config.get("num_workers", 8)) or 1
        root = Path(config.get("root_path", "."))
        if synthetic is None:
            synthetic = bool(config.get("synthetic_data")) or not (root / "data").exists()
        self.synthetic = synthetic
        if synthetic:
            self.samples = [f"synthetic_{i}" for i in range(int(config.get("synthetic_size", 256)))]
        else:
            self.samples = walk_ssl_samples(str(root))
        n_per_epoch = config.get("num_samples_per_epoch")
        if n_per_epoch:
            self.samples = self.samples[: int(n_per_epoch)]
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        from .pipeline import resolve_process_grid

        self.process_index, self.process_count, self.local_batch_size = (
            resolve_process_grid(self.batch_size)
        )

    def __len__(self):
        return len(self.samples) // self.batch_size

    def _read_stack(self, path: str, idx: int) -> np.ndarray:
        cfg = self.config
        clamp = cfg.get("clamp_input", 0.15)
        if self.synthetic:
            size = int(cfg.get("synthetic_patch_size", 224))
            rng = np.random.RandomState((self._seed * 7_654_321 + idx) % (2**31 - 1))
            parts = [
                np.clip(rng.gamma(2.0, (clamp or 0.15) / 6.0, (size, size, 2)), 0, clamp).astype(np.float32)
                for _ in range(3)
            ]
        else:
            files = list_tile_files(path)
            parts = []
            for kv, kh in (("post_vv", "post_vh"), ("pre1_vv", "pre1_vh"), ("pre2_vv", "pre2_vh")):
                parts.append(stack_channels(_imread(files[kv]), _imread(files[kh]), cfg["channels"], clamp))
        nch = parts[0].shape[-1]
        if nch != len(SSL_MEAN):
            # the hardcoded corpus stats are (vv, vh) — np.resize would
            # silently recycle the vv stats onto other channels (the
            # reference's torchvision Normalize raises on the mismatch too)
            raise ValueError(
                f"SSL corpus stats are per-channel for {len(SSL_MEAN)} channels "
                f"(vv, vh); got {nch} channels from {self.config.get('channels')}")
        mean = np.asarray(SSL_MEAN, np.float32)
        std = np.asarray(SSL_STD, np.float32)
        parts = [(p - mean) / std for p in parts]
        return np.concatenate(parts, axis=-1).astype(np.float32)  # (H, W, 6)

    def __iter__(self):
        bs = self.batch_size
        ids = np.arange(len(self.samples))
        batches = [ids[i : i + bs] for i in range(0, len(ids), bs) if i + bs <= len(ids)]

        lo = self.process_index * self.local_batch_size
        hi = lo + self.local_batch_size

        def produce(pool, batch_ids):
            batch_ids = batch_ids[lo:hi]  # this process's rows (multi-host)
            out_size = int(self.config.get("image_size", 224))

            def one(i):
                rng = np.random.default_rng(self._seed + 31 * int(i) + self._epoch_tag)
                img = self._read_stack(self.samples[int(i)], int(i))
                return random_resized_crop_flip(img, rng, size=out_size)

            imgs = list(pool.map(one, batch_ids))
            return {"image": np.stack(imgs)}

        self._epoch_tag = getattr(self, "_epoch_tag", 0) + 1
        # shared hardened prefetch (error propagation, abandonment-safe,
        # persistent per-epoch pool) — same machinery as the GRD loader
        from .pipeline import prefetch_epoch

        yield from prefetch_epoch(batches, produce, self.workers)
