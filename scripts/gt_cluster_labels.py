"""Ground-truth cluster->link labels for discovery diagnostics.

For each registered cluster, find the gt link whose FK motion (from the
recorded joint configs and the gt URDF) best explains the cluster's
registered trajectory: argmin over links of the mean frame-0-relative
pose deviation.  Gives an objective reference partition to score
discovery maps/linkages against (the reference has no such tool; its
published numbers rely on eyeballing link counts).

Usable as a module: ``gt_labels(cfg)`` -> (labels (K,), link_names).
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gt_labels(cfg, num_videos=None, asset_root=None, collapse_comoving=True):
    from autourdf_tpu.config import get_robot
    from autourdf_tpu.io.artifacts import list_sequence_dirs, load_registration
    from autourdf_tpu.sim.env import KinematicEnv

    robot = get_robot(cfg.robot)
    env = KinematicEnv.create(
        robot.gt_path(asset_root or os.environ.get("AUTOURDF_ASSET_ROOT",
                                                   "/root/reference")),
        base_orientation=robot.ori, dof=robot.dof)

    part_dirs = list_sequence_dirs(cfg.part_dir())[: num_videos or cfg.num_videos]
    raw_dirs = list_sequence_dirs(cfg.raw_dir())[: num_videos or cfg.num_videos]

    votes = None
    link_names = None
    for pd, rd in zip(part_dirs, raw_dirs):
        art = load_registration(pd)
        cfg_files = sorted(glob.glob(os.path.join(rd, "*", "joint_cfg.txt")))
        link_mats = []
        for cf in cfg_files:
            with open(cf) as f:
                q = np.array([float(line.split(":")[-1])
                              for line in f if line.strip()])
            env.set_joint_positions(q)
            tf = env.link_transforms()
            if link_names is None:
                link_names = sorted(tf.keys())
            link_mats.append(np.stack([tf[n] for n in link_names]))
        L = np.stack(link_mats)                      # (T, NL, 4, 4)
        M = np.asarray(art.matrices)                 # (T, K, 4, 4)
        T, K = M.shape[:2]
        rel_c = np.einsum("tkab,kbc->tkac", M, np.linalg.inv(M[0]))
        rel_l = np.einsum("tlab,lbc->tlac", L, np.linalg.inv(L[0]))
        # deviation of cluster k's motion from link l's motion, averaged
        # over frames: translation part of rel_c rel_l^-1 applied at the
        # cluster's frame-0 position + rotation geodesic
        if votes is None:
            votes = np.zeros((K, len(link_names)))
            link_dev = np.zeros((len(link_names), len(link_names)))
            n_frames = 0
        p0 = M[0, :, :3, 3]                          # (K, 3)
        q0 = L[0, :, :3, 3]                          # (NL, 3)
        for t in range(1, T):
            d = np.einsum("kab,lbc->klac", rel_c[t],
                          np.linalg.inv(rel_l[t]))   # (K, NL, 4, 4)
            moved = np.einsum("klab,kb->kla", d[:, :, :3, :3], p0) \
                + d[:, :, :3, 3]
            dev_t = np.linalg.norm(moved - p0[:, None], axis=-1)
            tr = np.trace(d[:, :, :3, :3], axis1=-2, axis2=-1)
            ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
            votes += dev_t + 0.1 * ang
            # link-pair relative motion (for co-moving collapse)
            dl = np.einsum("lab,mbc->lmac", rel_l[t],
                           np.linalg.inv(rel_l[t]))  # (NL, NL, 4, 4)
            mv = np.einsum("lmab,mb->lma", dl[:, :, :3, :3], q0) \
                + dl[:, :, :3, 3]
            trl = np.trace(dl[:, :, :3, :3], axis1=-2, axis2=-1)
            angl = np.arccos(np.clip((trl - 1) / 2, -1, 1))
            link_dev = np.maximum(
                link_dev, np.linalg.norm(mv - q0[None], axis=-1) + 0.1 * angl)
            n_frames += 1
    labels = np.argmin(votes, axis=1)
    margins = np.sort(votes, axis=1)
    conf = margins[:, 1] / np.maximum(margins[:, 0], 1e-9)
    if collapse_comoving:
        # Links connected by fixed/unexcited joints move identically in
        # this dataset; no unsupervised method can (or should) separate
        # them, and argmin ties between them are arbitrary.  Collapse
        # links whose relative FK motion NEVER exceeds ~2 mm equivalent
        # (translation at the link origin + 0.1 * geodesic) in any frame
        # into one discoverable link.  Max-over-frames, not mean: tiny
        # finger joints (allegro) move ~1 mm/frame but accumulate to cm.
        mean_dev = 0.5 * (link_dev + link_dev.T)
        adj = mean_dev < 2e-3
        rep = np.arange(len(link_names))
        for a in range(len(link_names)):
            for b in range(a + 1, len(link_names)):
                if adj[a, b]:
                    ra, rb = rep[a], rep[b]
                    rep[rep == rb] = ra
        labels = rep[labels]
    return labels, link_names, conf


def main():
    import argparse

    from autourdf_tpu.config import PipelineConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", required=True)
    ap.add_argument("--data-root", default="data")
    args = ap.parse_args()
    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root)
    labels, names, conf = gt_labels(cfg)
    print("links:", names)
    print("labels:", labels.tolist())
    print("confidence (2nd/1st cost):", np.round(conf, 2).tolist())
    used = sorted(set(labels.tolist()))
    print(f"{len(used)} gt links occupied: "
          f"{[names[u] for u in used]}")


if __name__ == "__main__":
    main()
