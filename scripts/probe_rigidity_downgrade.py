"""Rigidity of dendrogram partitions at several k over saved artifacts.

Measures whether the carry-rigidity guard could arbitrate ladder
DOWNGRADES (it cannot: merged small links sit below the global carry
floor -- RESULTS.md round-4 negative).  Usage:

    python scripts/probe_rigidity_downgrade.py data_seeds/s2025 pxs 14,16,19
"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, sys
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from autourdf_tpu.config import PipelineConfig
from autourdf_tpu.workflow import build_coord_maps
from autourdf_tpu.structure import (combined_sum_map, coord_clustering,
                                    swap_consistency_stack,
                                    refine_groups_by_carry)
from autourdf_tpu.structure.clustering import carry_excess_matrix, partition_rigidity
from autourdf_tpu.structure.coord_map import _refine_groups_with_matrix

root, robot = sys.argv[1], sys.argv[2]
cfg = PipelineConfig(robot=robot, data_root=root)
cms, _ = build_coord_maps(cfg, 5, cfg.start_steps, cfg.end_steps)
sum_map = combined_sum_map(cms, "pose")
print("building carry stack...", flush=True)
stack = swap_consistency_stack(cms)
excess, floor = carry_excess_matrix(stack)
d_mean = stack.mean(axis=0)
for k in [int(x) for x in sys.argv[3].split(",")]:
    groups, _, _ = coord_clustering(sum_map, k)
    groups = _refine_groups_with_matrix(d_mean, groups, 0.8)
    rig = partition_rigidity(excess, groups, 0.5)
    print(f"k={k} (eff {len(groups)}): rigidity {rig*1e3:.2f}mm = "
          f"{rig/max(floor,1e-12):.2f}x floor ({floor*1e3:.2f}mm)", flush=True)
