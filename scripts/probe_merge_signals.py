"""Probe: 2-signal separability of same-link vs articulated group pairs.

At the rigidity over-split (smallest k with all groups carry-rigid),
enumerate every group pair and print (carry cross excess in floor
units, pose-map cross distance in its dataset max units, gt label:
SAME if both groups majority-map to one gt link).  The union over
datasets/seeds shows whether a 2D rule (merge iff carry < c1 AND
pose < c2) separates what either signal alone cannot:

- carry blind spot: near-symmetric joints (wrist rotate on cylindrical
  geometry) carry points onto the observed surface -> excess ~ floor
- pose blind spot: same-link frame spin on smooth links -> pose
  deviation without articulation (and no absolute scale)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

from collections import Counter  # noqa: E402

import numpy as np  # noqa: E402
from scipy.cluster.hierarchy import fcluster, linkage  # noqa: E402
from scipy.spatial.distance import squareform  # noqa: E402

from probe_carry_rule import carry_stack, excess_matrix  # noqa: E402
from probe_split_merge import cross_excess, group_rigidity  # noqa: E402


def excitation_deg(cms, ga, gb):
    """Max-over-time geodesic amplitude (deg) of the relative rotation
    between the two groups' eigen-mean frames, maxed over sequences.
    Absolute angle units: real joints are driven 10-40 deg by the
    trajectory; same-link frame spin is a few deg of incoherent noise
    (reduced further by averaging members)."""
    from autourdf_tpu.core.quat_np import mean_link_frame_np

    amp = 0.0
    for cm in cms:
        C = np.asarray(cm.coords)  # (T, K, 7)
        T = C.shape[0]
        fa = np.stack([mean_link_frame_np(C[t, ga]) for t in range(T)])
        fb = np.stack([mean_link_frame_np(C[t, gb]) for t in range(T)])
        rel = np.einsum("tab,tbc->tac", np.linalg.inv(fa), fb)
        rel0 = np.linalg.inv(rel[0])
        d = np.einsum("tab,bc->tac", rel, rel0)
        tr = np.trace(d[:, :3, :3], axis1=-2, axis2=-1)
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        amp = max(amp, float(ang.max()))
    return amp


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*",
                    default=["data", "data_seeds/s2025", "data_seeds/s2026"])
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--c-split", type=float, default=0.5)
    ap.add_argument("--adjacent-only", action="store_true",
                    help="only pairs adjacent in the pose-map MST "
                         "(candidates an agglomeration would consider)")
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.structure import combined_sum_map
    from autourdf_tpu.workflow import build_coord_maps
    from gt_cluster_labels import gt_labels

    print(f"{'dataset':<34} {'pair':>7} {'carry/floor':>11} "
          f"{'pose/max':>8} {'exc_deg':>7}  gt")
    for root in args.roots:
        part = os.path.join(root, "part")
        if not os.path.isdir(part):
            continue
        avail = {}
        for d in sorted(os.listdir(part)):
            if d.endswith("_seg"):
                r, k = d.rsplit("_", 2)[0], int(d.rsplit("_", 2)[1])
                avail.setdefault(r, []).append(k)
        for robot in (args.robots or sorted(avail)):
            for K in avail.get(robot, []):
                cache = os.path.join(root, "carry",
                                     f"{robot}_{K}_carry_raw.npy")
                if not os.path.exists(cache):
                    continue
                cfg = PipelineConfig(robot=robot, data_root=root, num_seg=K)
                try:
                    stack = carry_stack(cfg, os.path.join(root, "carry"))
                    cms, _ = build_coord_maps(cfg, num_videos=5)
                    labels_gt, names, _ = gt_labels(cfg, num_videos=5)
                except Exception as e:
                    print(f"{root}/{robot}_{K}: skip {e}", flush=True)
                    continue
                ex, floor = excess_matrix(stack)
                pose = combined_sum_map(cms, "pose")
                pose = 0.5 * (pose + pose.T)
                Z = linkage(squareform(pose, checks=False), method="single")
                Kn = ex.shape[0]
                k_over = Kn
                for k in range(2, Kn + 1):
                    lab = fcluster(Z, t=k, criterion="maxclust") - 1
                    rig = max(group_rigidity(ex, np.nonzero(lab == g)[0],
                                             0.75)
                              for g in range(lab.max() + 1))
                    if rig <= args.c_split * floor:
                        k_over = k
                        break
                lab = fcluster(Z, t=k_over, criterion="maxclust") - 1
                groups = [list(np.nonzero(lab == g)[0])
                          for g in range(lab.max() + 1)]

                def gmaj(g):
                    return Counter(
                        names[labels_gt[j]] for j in g).most_common(1)[0][0]

                majs = [gmaj(g) for g in groups]
                tag = f"{root}/{robot}_{K}"
                for a in range(len(groups)):
                    for b in range(a + 1, len(groups)):
                        cv = cross_excess(ex, groups[a], groups[b]) / floor
                        pv = cross_excess(pose, groups[a], groups[b])
                        ev = excitation_deg(cms, groups[a], groups[b])
                        same = "SAME" if majs[a] == majs[b] else "diff"
                        print(f"{tag:<34} {a:>3}-{b:<3} {cv:>11.2f} "
                              f"{pv:>8.3f} {ev:>7.1f}  {same}", flush=True)


if __name__ == "__main__":
    main()
