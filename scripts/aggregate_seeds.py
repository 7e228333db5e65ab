"""Aggregate the multi-seed variance sweep into mean +- std per robot.

Reads the canonical run (data/evaluation/...) plus every
data_seeds/s{SEED}/evaluation/... run and prints a per-robot table of
axis error, position error, and re-sim Chamfer across seeds.

    python scripts/aggregate_seeds.py [robot ...]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_eval(eval_dir: str) -> dict | None:
    out = {}
    for key, fname in [("dir", "dir_mean_std.txt"), ("pos", "pos_mean_std.txt"),
                       ("chamfer", "loss_mean_std.txt")]:
        p = os.path.join(eval_dir, fname)
        if not os.path.exists(p):
            return None
        vals = np.loadtxt(p)
        out[key] = float(np.atleast_1d(vals)[0])
    return out


def main():
    sys.path.insert(0, REPO)
    from autourdf_tpu.config import ROBOTS

    robots = sys.argv[1:] or ["wx200_5", "ur5", "franka", "pxs"]
    roots = [os.path.join(REPO, "data")] + sorted(
        glob.glob(os.path.join(REPO, "data_seeds", "s*")))
    print(f"{'robot':10s} {'seeds':>5} {'dir deg (mean+-std over seeds)':>32} "
          f"{'pos mm':>18} {'resim':>22}")
    for robot in robots:
        dirs, poss, chams, used = [], [], [], []
        seg = ROBOTS[robot].num_seg  # registry K only: skip K-override runs
        for root in roots:
            hits = glob.glob(os.path.join(root, "evaluation",
                                          f"{robot}_{seg}_seg", "*_cams"))
            for h in hits:
                e = read_eval(h)
                if e:
                    dirs.append(e["dir"])
                    poss.append(e["pos"])
                    chams.append(e["chamfer"])
                    used.append(os.path.relpath(h, REPO))
        if not dirs:
            print(f"{robot:10s}  none")
            continue
        d, p, c = np.array(dirs), np.array(poss) * 1e3, np.array(chams)
        print(f"{robot:10s} {len(d):>5} {d.mean():>12.2f} +- {d.std():<6.2f} "
              f"[{', '.join(f'{v:.2f}' for v in d)}] "
              f"{p.mean():>7.1f} +- {p.std():<5.1f} "
              f"{c.mean():>9.4f} +- {c.std():<7.4f}")
        for u in used:
            print(f"           {u}")


if __name__ == "__main__":
    main()
