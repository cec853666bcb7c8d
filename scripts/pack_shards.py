"""One-time corpus conversion to packed shards (data/shards.py).

Decodes every sample of the selected splits through the normal tile
pipeline (GeoTIFF / native C++ pool) and writes fixed-record binary shards
that the Loader memory-maps on subsequent runs — removing the reference's
~9-file-opens-per-sample hot-path cost (`/root/reference/dataset/
Dataset.py:824-860`, SURVEY.md §7 "host-bound tile decode").

Usage:
  python scripts/pack_shards.py --out /data/kuro_packed \
      [--splits train val test] [--dtype float16|float32] [--config ...]

Then set `"packed_shards": "/data/kuro_packed"` in the data config (or pass
it as an override); the Loader picks it up automatically and falls back to
tile decode for any record not in the pack.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    p.add_argument("--dtype", default="float16", choices=["float16", "float32"])
    p.add_argument("--records-per-shard", type=int, default=512)
    p.add_argument("--method", default="unet")
    args = p.parse_args()

    from kurosiwo_tpu.config import load_config
    from kurosiwo_tpu.data.pipeline import Loader
    from kurosiwo_tpu.data.shards import pack_split

    cfg = load_config(method=args.method)
    cfg.pop("packed_shards", None)  # always decode from source when packing
    for split in args.splits:
        t0 = time.time()
        loader = Loader(split, cfg, seed=0)
        n = pack_split(
            loader,
            os.path.join(args.out, split),
            img_dtype=args.dtype,
            records_per_shard=args.records_per_shard,
        )
        print(f"{split}: packed {n} samples in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
