"""Calibrate the joint axis-coherence veto (VERDICT r3 task 3).

For a robot whose registration artifacts are on disk, cut the pose map at
one or more link counts k, build both tree hypotheses, and print every
joint's coherence statistics (joints.screw.joint_screw_coherence).  The
calibration question: do REAL joints (arms at their true k, Sapien objects
at gt k) separate from SPURIOUS drift joints (faucet k=3, trashcan k=4,
storage k=5) on axis concentration / per-sequence spread — a direction
signal the magnitude-based carry test cannot provide (RESULTS.md r3)?

Usage: python scripts/probe_axis_coherence.py ROBOT [k ...] [--dist-mode M]
       (no k: the statistical auto pick only)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

# the campaign owns the single-tenant TPU tunnel; this diagnostic is cheap
# enough for CPU (env JAX_PLATFORMS is pinned above env-var level, so go
# through jax.config before any backend init)
import jax

jax.config.update("jax_platforms", "cpu")

from autourdf_tpu.config import PipelineConfig
from autourdf_tpu.joints.screw import joint_screw_coherence
from autourdf_tpu.structure import (
    auto_dof_search,
    coord_clustering,
    combined_sum_map,
    refine_groups_by_carry,
    swap_consistency_stack,
)
from autourdf_tpu.structure.tree import cluster_mst, kinematics_tree, motion_tree
from autourdf_tpu.workflow import build_coord_maps


def report(tag, links, cms, num_steps):
    stats = joint_screw_coherence(links, cms, 0, num_steps, interval=4)
    for st in stats:
        print(
            f"  [{tag}] joint {st.parent_link}->{st.child_link}: "
            f"conc {st.concentration:.3f}  med_dev {st.median_dev_deg:5.1f}deg  "
            f"seq_spread {st.seq_spread_deg:6.1f}deg  "
            f"total_angle {st.total_angle_deg:7.1f}deg  n={st.n_samples}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("robot")
    ap.add_argument("ks", nargs="*", type=int)
    ap.add_argument("--dist-mode", default="pose")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--num-points", type=int, default=None)
    args = ap.parse_args()

    kw = {}
    if args.num_points:
        kw["num_points"] = args.num_points
    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root, **kw)
    cms, _ = build_coord_maps(cfg, cfg.num_videos, cfg.start_steps, cfg.end_steps)
    num_steps = cfg.end_steps - cfg.start_steps
    d_map = combined_sum_map(cms, args.dist_mode)
    stack = swap_consistency_stack(cms)

    ks = args.ks
    if not ks:
        groups, _, _, _ = auto_dof_search(d_map)
        ks = [len(groups)]
        print(f"{args.robot}: auto pick k={ks[0]}")

    for k in ks:
        groups, _, _ = coord_clustering(d_map, k)
        groups = refine_groups_by_carry(cms, groups, stack=stack)
        print(f"{args.robot} k={k} (eff {len(groups)}):")
        try:
            links = kinematics_tree(cms[0], groups, cluster_mst(cms[0]))
            report("mst", links, cms, num_steps)
        except Exception as e:
            print(f"  [mst] failed: {type(e).__name__}: {e}")
        try:
            links = motion_tree(cms, groups, num_steps)
            report("motion", links, cms, num_steps)
        except Exception as e:
            print(f"  [motion] failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
