"""Compute and cache carry stacks (optionally high-resolution) on the
current JAX backend — meant to run on the TPU where the transport+NN
kernel makes 256x8192 resolution seconds per sequence instead of CPU
minutes.

    python scripts/compute_carry_cache.py --robots toilet op3 \
        --samples 256 --targets 8192 [--data-root data]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--robots", nargs="*", required=True)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--targets", type=int, default=8192)
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.structure import swap_consistency_map
    from autourdf_tpu.workflow import build_coord_maps

    root = args.data_root
    part = os.path.join(root, "part")
    avail = {}
    for d in sorted(os.listdir(part)):
        if d.endswith("_seg"):
            r, k = d.rsplit("_", 2)[0], int(d.rsplit("_", 2)[1])
            avail.setdefault(r, []).append(k)
    cache_dir = os.path.join(root, "carry")
    os.makedirs(cache_dir, exist_ok=True)
    for robot in args.robots:
        for K in avail.get(robot, []):
            res = ("" if (args.samples, args.targets) == (64, 2048)
                   else f"_{args.samples}x{args.targets}")
            path = os.path.join(cache_dir, f"{robot}_{K}{res}_carry_raw.npy")
            if os.path.exists(path):
                print(f"cached: {path}", flush=True)
                continue
            cfg = PipelineConfig(robot=robot, data_root=root, num_seg=K)
            cms, _ = build_coord_maps(cfg, num_videos=5)
            stack = np.stack([
                swap_consistency_map(cm, samples_per_cluster=args.samples,
                                     target_points=args.targets, raw=True)
                for cm in cms])
            np.save(path, stack)
            print(f"wrote {path} {stack.shape}", flush=True)


if __name__ == "__main__":
    main()
