from .clustering import (
    auto_dof_search,
    carry_excess_matrix,
    partition_rigidity,
    recursive_gap_split,
    rigidity_guarded_groups,
    coord_clustering,
    merge_gap_dof_search,
    silhouette_dof_search,
    single_linkage_components,
)
from .coord_map import (CoordMap, combined_sum_map,
                        refine_groups_by_carry, swap_consistency_map,
                        swap_consistency_stack)
from .model_select import chain_fit_dof_search, probe_k_selection
from .links import (
    LinkArtifacts,
    canonical_link_clouds,
    consolidate_links,
    refine_link_clusters,
    save_link_artifacts,
)
from .pairwise import (
    PairwiseJoint,
    estimate_pairwise_joints,
    greedy_tree,
    identify_base_group,
)
from .tree import LinkNode, cluster_mst, kinematics_tree, motion_tree, revolute_consistency_matrix

__all__ = [
    "CoordMap",
    "combined_sum_map",
    "refine_groups_by_carry",
    "swap_consistency_stack",
    "swap_consistency_map",
    "coord_clustering",
    "silhouette_dof_search",
    "merge_gap_dof_search",
    "auto_dof_search",
    "carry_excess_matrix",
    "partition_rigidity",
    "recursive_gap_split",
    "rigidity_guarded_groups",
    "chain_fit_dof_search",
    "probe_k_selection",
    "single_linkage_components",
    "cluster_mst",
    "kinematics_tree",
    "motion_tree",
    "revolute_consistency_matrix",
    "LinkNode",
    "consolidate_links",
    "refine_link_clusters",
    "canonical_link_clouds",
    "save_link_artifacts",
    "LinkArtifacts",
    "PairwiseJoint",
    "estimate_pairwise_joints",
    "greedy_tree",
    "identify_base_group",
]
