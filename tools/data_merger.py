"""Offline shard merge: per-rank vectorizer shards → one dataset per split.

Reference parity (/root/reference/tools/data/data_merger.py): discovers
shards, shifts index offsets, concatenates, validates contiguity, optional
shard removal.

Usage: python tools/data_merger.py --dataset_dir out [--remove_shards]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_max_tpu.data import codes_io
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger("merger")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--splits", nargs="*", default=["train", "val"])
    parser.add_argument("--remove_shards", action="store_true")
    args = parser.parse_args(argv)
    setup_logging(0)

    for split in args.splits:
        shard_files = [
            f
            for f in os.listdir(args.dataset_dir)
            if f.startswith(f"{split}_codes_")
            and not f.startswith(f"{split}_codes_index")
        ]
        if not shard_files:
            log.info("No %s shards found, skipping.", split)
            continue
        info = codes_io.merge_shards(args.dataset_dir, split)
        codes_io.validate_merged(args.dataset_dir, split)
        log.info("Merged %s: %s", split, info)
        if args.remove_shards:
            ranks = sorted(
                int(f.rsplit("_", 1)[1].split(".")[0]) for f in shard_files
            )
            for r in ranks:
                for p in codes_io.codes_paths(args.dataset_dir, split, r):
                    if os.path.exists(p):
                        os.remove(p)
            log.info("Removed %d %s shard files.", len(ranks) * 3, split)


if __name__ == "__main__":
    main()
