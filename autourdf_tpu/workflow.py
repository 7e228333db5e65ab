"""End-to-end pipeline stages (the reference's three shell scripts + eval).

    dataset      -> data/raw/...      (sim.datagen.collect)
    register     -> data/part/...     (registration.pipeline, batched on device)
    build-urdf   -> data/mesh + data/urdf (structure -> joints -> mesh -> writer)
    evaluate     -> data/evaluation/...   (eval.joints_eval + eval.resim)

Stage boundaries and artifact layouts match the reference
(scripts/dataset.sh, scripts/registration.sh, scripts/generate_urdf.sh,
Sim/evaluation.py) so each stage is independently resumable from disk.
"""

from __future__ import annotations

import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig, get_robot
from .utils.telemetry import Telemetry
from .io.artifacts import (
    list_sequence_dirs,
    load_registration,
    save_registration,
)
from .io.ply import read_ply
from .models.regmlp import PoseRegressor, init_params


def load_raw_sequences(
    raw_dir: str, num_videos: int, num_points: int | None = None
) -> tuple[list[str], np.ndarray]:
    """Read data/raw sequence dirs -> (names, (S, T, N, 3) frames).

    Falls back to the flat real-data layout ``data/raw/{robot}/*/`` (no
    step/cams subdir) when the simulated layout is absent — the
    reference's real-scan path (mlp_reg.py:424-426).
    """
    seq_dirs = list_sequence_dirs(raw_dir)[:num_videos]
    if not seq_dirs:
        parent = os.path.dirname(raw_dir)
        seq_dirs = [
            d for d in list_sequence_dirs(parent)
            if glob.glob(os.path.join(d, "*", "robot.ply"))
        ][:num_videos]
    if not seq_dirs:
        raise FileNotFoundError(f"no raw sequences under {raw_dir}")
    all_seqs = []
    for d in seq_dirs:
        frames = []
        for fd in sorted(glob.glob(os.path.join(d, "*/"))):
            ply = os.path.join(fd, "robot.ply")
            if os.path.exists(ply):
                frames.append(read_ply(ply))
        all_seqs.append(np.stack(frames))
    names = [os.path.basename(os.path.normpath(d)) for d in seq_dirs]
    return names, np.stack(all_seqs)


def load_raw_sequences_padded(
    raw_dir: str, num_videos: int
) -> tuple[list[str], np.ndarray, np.ndarray | None]:
    """Like :func:`load_raw_sequences` but tolerant of ragged frames.

    Real scans capture a different point count per frame (the reference's
    real-data path, mlp_reg.py:424-426).  Frames are sentinel-padded to
    the max count and a boolean validity mask (S, T, N) is returned;
    uniform datasets return ``masks=None`` and behave exactly as before.
    """
    from .ops.knn import PAD_COORD

    seq_dirs = list_sequence_dirs(raw_dir)[:num_videos]
    if not seq_dirs:
        parent = os.path.dirname(raw_dir)
        seq_dirs = [
            d for d in list_sequence_dirs(parent)
            if glob.glob(os.path.join(d, "*", "robot.ply"))
        ][:num_videos]
    if not seq_dirs:
        raise FileNotFoundError(f"no raw sequences under {raw_dir}")
    names = [os.path.basename(os.path.normpath(d)) for d in seq_dirs]
    raw = []
    for d in seq_dirs:
        frames = []
        for fd in sorted(glob.glob(os.path.join(d, "*/"))):
            ply = os.path.join(fd, "robot.ply")
            if os.path.exists(ply):
                frames.append(read_ply(ply))
        raw.append(frames)
    lengths = {len(seq) for seq in raw}
    if len(lengths) > 1:
        # sequences with differing frame counts (an aborted capture):
        # truncate to the shortest rather than padding whole frames —
        # an all-invalid frame would still be "registered" and saved as
        # an empty cloud that breaks downstream CoordMap construction
        t_min = min(lengths)
        print(f"[load] warning: sequence lengths differ {sorted(lengths)}; "
              f"truncating all to {t_min} frames")
        raw = [seq[:t_min] for seq in raw]
    counts = {len(f) for seq in raw for f in seq}
    if len(counts) == 1:
        return names, np.stack([np.stack(seq) for seq in raw]), None
    n_max = max(counts)
    S, T = len(raw), len(raw[0])
    frames = np.full((S, T, n_max, 3), PAD_COORD, np.float32)
    masks = np.zeros((S, T, n_max), bool)
    for s, seq in enumerate(raw):
        for t, f in enumerate(seq):
            frames[s, t, : len(f)] = f
            masks[s, t, : len(f)] = True
    return names, frames, masks


def _telemetry(cfg: PipelineConfig) -> Telemetry:
    return Telemetry(path=os.path.join(cfg.data_root, "telemetry.json"))


def run_dataset(cfg: PipelineConfig, asset_root: str | None = None,
                ground: bool = False, epochs: int = 5) -> list[str]:
    from .sim.datagen import collect

    with _telemetry(cfg).stage("dataset", robot=cfg.robot, epochs=epochs):
        return collect(cfg, asset_root=asset_root, ground=ground, epochs=epochs)


def run_registration(
    cfg: PipelineConfig,
    chamfer_backend: str = "auto",
    seed: int = 0,
    mlp_icp: bool = False,
    use_normals: bool = False,
    corr_every: int = 1,
    verbose: bool = True,
) -> dict:
    """Register all sequences in one batched device program; save artifacts."""
    from .registration import (
        RegistrationConfig,
        initial_segments,
        register_sequences_batched,
    )

    robot = get_robot(cfg.robot)
    names, frames, masks = load_raw_sequences_padded(cfg.raw_dir(), cfg.num_videos)
    S, T, N, _ = frames.shape
    if verbose:
        print(f"[register] {S} sequences x {T} frames x {N} points, "
              f"K={cfg.num_segments()}, mode={cfg.rot}"
              + (" (ragged, masked)" if masks is not None else ""))

    frames_j = jnp.asarray(frames)
    masks_j = jnp.asarray(masks) if masks is not None else None
    key = jax.random.PRNGKey(seed)
    init = initial_segments(key, frames_j[0, 0], cfg.num_segments(), n_init=10,
                            seed_mode=cfg.seed_mode,
                            use_normals=use_normals,
                            mask=masks_j[0, 0] if masks_j is not None else None)

    if corr_every > 1 and cfg.epochs % corr_every:
        raise ValueError(
            f"--epochs {cfg.epochs} must be a multiple of --corr-every {corr_every}"
        )
    # keep each compiled training dispatch at roughly the 5000-point
    # duration: chamfer cost scales ~N^2 and a single XLA execution past
    # ~5 s can trip the tunneled-device dispatch deadline
    dispatch = int(np.clip(100 * (5000.0 / max(N, 1)) ** 2, 25, 100))
    reg_cfg = RegistrationConfig(
        num_seg=cfg.num_segments(), mode=cfg.rot, epochs=cfg.epochs,
        chamfer_backend=chamfer_backend, mlp_icp=mlp_icp,
        use_normals=use_normals, corr_every=corr_every,
        dispatch_epochs=dispatch,
    )
    model = PoseRegressor(mode=cfg.rot, hidden_dim=512)

    def make_params(k):
        _, p = init_params(k, cfg.rot, cfg.num_segments(), 512)
        return p

    keys = jax.random.split(jax.random.PRNGKey(seed + 1), 2 * S)
    step_params = jax.vmap(make_params)(keys[:S])
    anchor_params = jax.vmap(make_params)(keys[S:])

    t0 = time.time()
    result = register_sequences_batched(
        model, reg_cfg, step_params, anchor_params, init, frames_j, masks_j
    )
    jax.block_until_ready(result.matrices)
    elapsed = time.time() - t0
    frames_registered = S * (T - 1)
    if verbose:
        print(f"[register] {elapsed:.2f}s for {frames_registered} frame pairs "
              f"({frames_registered / elapsed:.2f} frames/s)")

    telem = _telemetry(cfg)
    with telem.stage("register", robot=cfg.robot, frames=frames_registered,
                     seconds_compute=round(elapsed, 3)):
        pass
    # one bulk device->host transfer for the whole result: per-sequence
    # ``np.asarray(result.local_points[s])`` dispatches a fresh slice
    # program per fetch, and over the tunneled device runtime those
    # post-run dispatches have been observed to wedge indefinitely;
    # whole-array fetches (what bench.py does) are reliable
    all_matrices = np.asarray(result.matrices)
    all_points = np.asarray(result.local_points)
    all_labels = np.asarray(result.labels)
    all_losses = np.asarray(result.losses)
    for s, name in enumerate(names):
        save_dir = os.path.join(cfg.part_dir(), name)
        lp = all_points[s]
        lb = all_labels[s]
        if masks is not None:
            # drop sentinel-padded rows so downstream link clouds stay
            # clean.  Frame 0 of EVERY sequence is the shared init
            # (sequence 0's frame-0 segmentation), so its rows are
            # governed by the init's own mask — this sequence's masks[s, 0]
            # marks a different row set and would keep 1e6 sentinels /
            # drop valid rows whenever the frame-0 counts differ.
            row_mask = [masks[0, 0]] + [masks[s, t]
                                        for t in range(1, lp.shape[0])]
            lp = [lp[t][row_mask[t]] for t in range(lp.shape[0])]
            lb = [lb[t][row_mask[t]] for t in range(len(lb))]
        save_registration(
            save_dir,
            all_matrices[s],
            lp,
            lb,
            all_losses[s],
        )
    return {
        "names": names,
        "seconds": elapsed,
        "frames_per_second": frames_registered / elapsed,
        "final_losses": all_losses[:, -1].tolist(),
        "mean_loss": float(np.mean(all_losses)),
    }


def build_coord_maps(cfg: PipelineConfig, num_videos: int | None = None,
                     start: int = 0, end: int | None = None):
    from .structure import CoordMap

    part_dirs = list_sequence_dirs(cfg.part_dir())[: num_videos or cfg.num_videos]
    raw_dirs = list_sequence_dirs(cfg.raw_dir())[: num_videos or cfg.num_videos]
    if not raw_dirs:
        # flat real-data layout: data/raw/{robot}/V*/ with no step/cams
        # level (the reference's real-scan path, mlp_reg.py:424-426)
        parent = os.path.dirname(cfg.raw_dir())
        raw_dirs = [
            d for d in list_sequence_dirs(parent)
            if glob.glob(os.path.join(d, "*", "robot.ply"))
        ][: num_videos or cfg.num_videos]
    cms = []
    for pd, rd in zip(part_dirs, raw_dirs):
        art = load_registration(pd, start, end)
        raw_clouds = [
            read_ply(os.path.join(fd, "robot.ply"))
            for fd in sorted(glob.glob(os.path.join(rd, "*/")))
        ]
        cms.append(
            CoordMap.from_arrays(
                art.matrices, art.cluster_points, art.cluster_labels, raw_clouds
            )
        )
    return cms, part_dirs


def _load_refine_frames(cfg, end_video):
    """Raw frames + masks sliced to the build window (shared by the tree
    probe and the final chain refinement — load the PLYs once)."""
    _, frames, fmasks = load_raw_sequences_padded(
        cfg.raw_dir(), end_video or cfg.num_videos)
    frames = frames[:, cfg.start_steps:cfg.end_steps]
    if fmasks is not None:
        fmasks = fmasks[:, cfg.start_steps:cfg.end_steps]
    return frames, fmasks


def _select_tree_by_chain_fit(candidates: dict, cms, frames, fmasks,
                              num_steps: int, verbose: bool,
                              probe_steps: int = 100):
    """Pick the tree whose 1-DoF-per-edge chain model best fits the raw
    clouds (short probe fit per candidate; see run_build_urdf)."""
    from .joints import estimate_joints_from_tree
    from .joints.chain import refine_chain

    best_name, best_links, best_loss = None, None, np.inf
    for name, links in candidates.items():
        joints = estimate_joints_from_tree(links, cms, 0, num_steps, interval=4)
        if not joints:
            loss = np.inf
        else:
            _, result = refine_chain(links, joints, cms, frames,
                                     steps=probe_steps, points_per_link=1024,
                                     frame_masks=fmasks)
            loss = float(result.loss)
        if verbose:
            print(f"[urdf] tree candidate {name}: probe chain loss {loss:.5f}")
        if loss < best_loss:
            best_name, best_links, best_loss = name, links, loss
    if best_links is None:
        # every candidate produced zero joints (all probe losses inf) —
        # fall back to the first candidate (proximity MST) so downstream
        # gets a tree rather than a None crash; joint estimation will
        # surface the real failure with a meaningful error
        best_name = next(iter(candidates))
        best_links = candidates[best_name]
        if verbose:
            print("[urdf] WARNING: no tree candidate yielded joints; "
                  f"falling back to {best_name}")
    if verbose:
        print(f"[urdf] selected {best_name} tree")
    return best_links


def run_build_urdf(
    cfg: PipelineConfig,
    unknown_dof: bool = True,
    dist_mode: str = "pose",
    dof_method: str = "auto",
    end_video: int | None = None,
    refine: str = "chain",
    refine_steps: int = 1200,
    chain_balance: bool = False,
    canonical_frames: int = 1,
    chain_anchors: int = 1,
    chain_trunc: float = 0.0,
    tree: str = "motion",
    reassign: bool = True,
    dof_guard: bool = True,
    dof_probe: bool = True,
    dof_probe_steps: int = 60,
    dof_probe_points: int = 256,
    ladder_share_norm: bool = True,
    freeze_prune: float = 0.25,
    prune_deg: float = 2.0,
    drift_prune: bool = False,
    drift_theta_deg: float = 12.0,
    drift_conc: float = 0.85,
    drift_spread_deg: float = 45.0,
    coart_merge: bool = True,
    verbose: bool = True,
) -> dict:
    """Structure discovery -> joints -> link meshes -> URDF file.

    ``refine="chain"`` (default) runs the global kinematic-chain fit
    against the raw frames after the screw estimate — a beyond-reference
    step that typically cuts wrist-joint axis errors several-fold; pass
    ``refine="none"`` for pure reference-parity behavior.

    ``tree="motion"`` (default) orders links by single-revolute
    consistency + proximity (structure.motion_tree — fixes the ur5 wrist
    mis-ordering); when it disagrees with the reference's proximity MST
    the two topologies are arbitrated by a short chain-fit probe (the
    wrong tree contains a composite "joint" and fits the clouds worse).
    ``tree="mst"`` forces the reference's proximity-only MST.

    ``reassign`` (default True) runs the carry-test boundary-cluster
    reassignment (structure.refine_groups_by_carry) after discovery.

    ``dof_guard`` (default True) validates the unknown-DoF pick with the
    observation-level rigidity guard (structure.rigidity_guarded_groups):
    a partition whose groups still contain articulated pairs (carry
    excess above the dataset noise floor) is under-split and k is
    escalated through the pose dendrogram until rigid.

    ``drift_prune`` (default False) additionally merges joints that are
    BOTH weakly excited (fitted theta range < ``drift_theta_deg``) and
    axis-incoherent across sequences (screw-sample concentration below
    ``drift_conc`` or per-sequence principal-axis spread above
    ``drift_spread_deg``) — the signature of registration drift on a
    large rigid shell rather than articulation (the faucet/trashcan/
    storage spurious joints, RESULTS.md round-3 findings).

    ``chain_anchors`` (default 1) averages the chain fit over that many
    canonical anchor steps (joints.chain.refine_chain_multi_anchor) to
    cancel the directed occlusion bias of a single anchor; costs one full
    chain fit per anchor.

    ``dof_probe`` (default True) arbitrates the unknown-DoF link count
    with the chain-fit probe ladder (structure.probe_k_selection): the
    dendrogram statistics pick k from RELATIVE merge heights and collapse
    on smooth-continuum captures (3-seed sweep: wx200_5/franka fall to 4
    links, ur5 to 5), and the carry guard is blind to coaxial joints
    whose motion maps the surface onto itself (waist/wrist rolls) — while
    the chain probe measures in absolute chamfer what a missing joint
    costs (35-80% of the loss) vs what a spurious one buys (~2-3%).

    ``prune_deg`` (default 2.0) merges away joints whose fitted angle
    range after chain refinement stays below this many degrees in every
    sequence (joints.chain.prune_static_joints) — the complement of the
    probe ladder: the ladder may admit a pure over-split whose spurious
    joint then shows no motion; 0 disables."""
    t_start = time.time()
    from .joints import estimate_joints_from_tree
    from .mesh import generate_link_meshes
    from .structure import (
        canonical_link_clouds,
        cluster_mst,
        auto_dof_search,
        combined_sum_map,
        consolidate_links,
        coord_clustering,
        kinematics_tree,
        merge_gap_dof_search,
        refine_link_clusters,
        save_link_artifacts,
        silhouette_dof_search,
    )
    from .urdf.writer import write_urdf

    cms, part_dirs = build_coord_maps(cfg, end_video, cfg.start_steps, cfg.end_steps)
    sum_map = combined_sum_map(cms, dist_mode)

    if unknown_dof:
        search = {"gap": merge_gap_dof_search, "silhouette": silhouette_dof_search,
                  "auto": auto_dof_search}[dof_method]
        groups, labels, scores, nls = search(sum_map)
        dof = len(groups) - 1
        if verbose:
            print(f"[urdf] {dof_method} DoF search: links={len(groups)} dof={dof}")
        score_dir = os.path.join(part_dirs[0], "score")
        os.makedirs(score_dir, exist_ok=True)
        with open(os.path.join(score_dir, "silhouette_score.txt"), "w") as f:
            f.write(f"Silhouette Score: {scores}\n")
            f.write(f"Number of Links: {nls.tolist()}\n")
    else:
        dof = get_robot(cfg.robot).dof
        groups, labels, _ = coord_clustering(sum_map, dof + 1)

    carry_stack = None
    if reassign or (unknown_dof and dof_guard):
        from .structure import swap_consistency_stack

        carry_stack = swap_consistency_stack(cms)
    if reassign:
        from .structure import refine_groups_by_carry

        groups = refine_groups_by_carry(cms, groups, verbose=verbose,
                                        stack=carry_stack)
        dof = len(groups) - 1
    if unknown_dof and dof_guard:
        from .structure import rigidity_guarded_groups

        groups, fired = rigidity_guarded_groups(
            sum_map, carry_stack, groups, verbose=verbose)
        if fired:
            dof = len(groups) - 1
            if verbose:
                print(f"[urdf] rigidity guard escalated: links={len(groups)} "
                      f"dof={dof}")

    num_steps = cfg.end_steps - cfg.start_steps
    refine_frames = None
    if unknown_dof and dof_probe:
        from .structure import probe_k_selection

        refine_frames = _load_refine_frames(cfg, end_video)
        k_before = len(groups)
        probe_groups, _ = probe_k_selection(
            sum_map, cms, refine_frames[0], k0=k_before,
            frame_masks=refine_frames[1], carry_stack=carry_stack,
            probe_steps=dof_probe_steps, points_per_link=dof_probe_points,
            share_normalize=ladder_share_norm,
            verbose=verbose,
        )
        if len(probe_groups) != k_before:
            # keep the main-path partition when the probe confirms k —
            # it already carries the guard's boundary refinement
            groups = probe_groups
            dof = len(groups) - 1
            if verbose:
                print(f"[urdf] probe ladder overrode DoF pick: "
                      f"links={len(groups)} dof={dof}")
    if tree == "motion":
        from .structure import motion_tree

        links = motion_tree(cms, groups, num_steps)
        links_mst = kinematics_tree(cms[0], groups, cluster_mst(cms[0]))

        def _edges(ls):
            return {frozenset((l.id, l.parent_id)) for l in ls
                    if l.parent_id is not None}

        if _edges(links_mst) != _edges(links):
            # the two topology hypotheses disagree (ur5 wrist vs wx200
            # gripper class of cases) — let the observations decide: a
            # composite joint modeled as one revolute cannot track the
            # clouds, so the short chain fit's loss picks the true tree
            if refine_frames is None:
                refine_frames = _load_refine_frames(cfg, end_video)
            links = _select_tree_by_chain_fit(
                {"motion": links, "proximity-mst": links_mst},
                cms, refine_frames[0], refine_frames[1], num_steps, verbose,
            )
    else:
        g0 = cluster_mst(cms[0])
        links = kinematics_tree(cms[0], groups, g0)
    # cms are already sliced to [start_steps:end_steps]; index them 0-based
    joints = estimate_joints_from_tree(
        links, cms, 0, cfg.end_steps - cfg.start_steps, interval=4
    )

    if refine == "chain" and joints:
        from .joints.chain import (merge_coarticulated_siblings,
                                   prune_static_joints,
                                   refine_chain_multi_anchor)
        from .joints.screw import joint_screw_coherence

        if refine_frames is None:
            refine_frames = _load_refine_frames(cfg, end_video)
        frames, fmasks = refine_frames
        # workload scale for the coarticulation line-coincidence gate:
        # diagonal of the first observed frame cloud
        _f0 = frames[0, 0][np.asarray(fmasks[0, 0], bool)] \
            if fmasks is not None else frames[0, 0]
        cloud_scale = float(np.linalg.norm(_f0.max(axis=0) - _f0.min(axis=0)))
        # fit -> veto -> prune -> REFIT loop.  Merging a vetoed joint
        # changes the structure, and the next pass re-fits and RE-PROBES
        # the merged structure — the freeze-delta of a remaining joint can
        # only drop below threshold once a neighboring spurious joint's
        # drift absorption is gone, so a single-pass veto misses the
        # cascade (storage kept its second panel joint).  Bounded: every
        # pass past the first must have pruned at least one joint, so the
        # loop runs <= n_joints passes; clean discoveries exit after one
        # fit (the old cost plus the J-forward-eval freeze probe).
        for _veto_pass in range(8):
            joints, chain_res = refine_chain_multi_anchor(
                links, joints, cms, frames, anchors=chain_anchors,
                steps=refine_steps,
                points_per_link=1024, frame_masks=fmasks,
                balance=chain_balance, canonical_frames=canonical_frames,
                trunc=chain_trunc,
                verbose=verbose,
            )
            # per-joint articulation diagnostics: fitted theta range from
            # the chain fit + screw-sample axis coherence from the
            # registration (joints/screw.py) — real joints are excited
            # tens of degrees with coherent axes, drift-born joints absorb
            # a few degrees with scattered axes.  The drift veto combines
            # both: a joint BOTH weakly excited and axis-incoherent is
            # registration drift, not articulation (real weakly-OBSERVABLE
            # joints like the wx200 wrist-rotate have noisy screw inits
            # but large fitted ranges; real weakly-EXCITED joints have
            # coherent axes).
            th = np.asarray(chain_res.thetas)
            ranges = np.degrees((th.max(axis=1) - th.min(axis=1)).max(axis=0))
            coh = joint_screw_coherence(
                links, cms, 0, cfg.end_steps - cfg.start_steps, interval=4)
            fdel = chain_res.freeze_deltas
            fshare = chain_res.subtree_share
            if verbose:
                for j, (joint, c) in enumerate(zip(joints, coh)):
                    fd = ""
                    if fdel is not None:
                        fd = f" freeze {fdel[j] * 100:.1f}%"
                        if fshare is not None and fshare[j] > 0:
                            # share-normalized: delta per unit movable mass
                            fd += f" (norm {fdel[j] / fshare[j] * 100:.0f}%)"
                    print(f"[prune-diag] joint {joint.parent_link}->"
                          f"{joint.child_link}: theta_range {ranges[j]:.1f}deg "
                          f"conc {c.concentration:.3f} "
                          f"spread {c.seq_spread_deg:.1f}deg "
                          f"total {c.total_angle_deg:.0f}deg{fd}", flush=True)
            drift_static: list[int] = []
            if drift_prune:
                for j, c in enumerate(coh):
                    incoherent = (c.concentration < drift_conc
                                  or (np.isfinite(c.seq_spread_deg)
                                      and c.seq_spread_deg > drift_spread_deg))
                    if ranges[j] < drift_theta_deg and incoherent:
                        drift_static.append(j)
                        if verbose:
                            print(f"[urdf] drift veto: joint "
                                  f"{joints[j].parent_link}->"
                                  f"{joints[j].child_link} "
                                  f"(range {ranges[j]:.1f}deg, "
                                  f"conc {c.concentration:.3f}, "
                                  f"spread {c.seq_spread_deg:.1f}deg)",
                                  flush=True)
            if freeze_prune > 0 and fdel is not None:
                # freeze-delta veto (DEFAULT; calibrated round 5): a joint
                # whose fitted motion buys less chamfer than
                # ``freeze_prune`` of its subtree's point share is a
                # symmetry-flat / drift direction, not articulation (see
                # joints/chain.py freeze-delta probe).  Orthogonal to the
                # excitation/coherence drift veto — this is the only
                # signal that separates storage's spurious panel joints
                # from its real doors (their ranges and coherences are
                # statistically identical).  Calibration over the round-4
                # fd-probe logs (campaign_logs/*_fd.log): spurious joints
                # read 2-16% normalized (faucet 16, storage 13, trashcan
                # 2/13), real joints >= 55% (wx200_5 gripper 55; every
                # other logged real joint >= 107) — threshold 0.25 sits at
                # the geometric midpoint of the gap.
                for j in range(len(joints)):
                    if j in drift_static:
                        continue
                    norm = fdel[j] / max(float(fshare[j]), 1e-6) \
                        if fshare is not None else fdel[j]
                    if norm < freeze_prune:
                        drift_static.append(j)
                        if verbose:
                            print(f"[urdf] freeze veto: joint "
                                  f"{joints[j].parent_link}->"
                                  f"{joints[j].child_link} "
                                  f"(freeze {fdel[j] * 100:.1f}%, "
                                  f"norm {norm * 100:.0f}% "
                                  f"< {freeze_prune * 100:.0f}%)",
                                  flush=True)
            pruned = False
            if prune_deg > 0 or drift_static:
                links, pruned = prune_static_joints(
                    links, joints, np.asarray(chain_res.thetas),
                    threshold=np.radians(prune_deg) if prune_deg > 0 else 0.0,
                    extra_static=drift_static)
            if not pruned and coart_merge:
                # per-joint vetoes exhausted — check the PAIRWISE signal:
                # sibling joints tracking one physical hinge (storage's
                # split-door case; see merge_coarticulated_siblings)
                links, pruned = merge_coarticulated_siblings(
                    links, joints, np.asarray(chain_res.thetas),
                    scale=cloud_scale, verbose=verbose)
                if pruned and verbose:
                    print("[urdf] coarticulation merge: sibling links "
                          "share one hinge", flush=True)
            if not pruned:
                break
            # membership changed -> link frames changed; redo the
            # estimate, then loop back for the refit + re-probe
            dof = len(links) - 1
            if verbose:
                print(f"[urdf] pruned static joint(s): links={len(links)} "
                      f"dof={dof}")
            joints = estimate_joints_from_tree(
                links, cms, 0, cfg.end_steps - cfg.start_steps, interval=4)
            if not joints:
                break

    # link artifacts + meshes from the first sequence only (reference :726).
    # Order by link id: the URDF writer references {id:04}.stl, while the
    # tree list is in BFS order — mixing the two scrambles mesh assignment.
    links_by_id = sorted(links, key=lambda l: l.id)
    art = consolidate_links(cms[0], [l.cluster_idx for l in links_by_id])
    art = refine_link_clusters(art)
    seq_name = os.path.basename(os.path.normpath(part_dirs[0]))
    link_dir = os.path.join(cfg.mesh_dir(), seq_name)
    save_link_artifacts(link_dir, art)
    clouds = canonical_link_clouds(art)
    mesh_paths = generate_link_meshes(clouds, link_dir, cfg.voxel())

    urdf_path = write_urdf(
        links, joints, cms[0], cfg.urdf_path(), mesh_dir=link_dir,
        robot_name=f"estimated_{cfg.robot}",
    )
    if verbose:
        print(f"[urdf] wrote {urdf_path} ({len(links)} links, {len(joints)} joints)")
    with _telemetry(cfg).stage("build_urdf", robot=cfg.robot,
                               links=len(links), dof=dof,
                               seconds_total=round(time.time() - t_start, 3)):
        pass
    return {
        "urdf_path": urdf_path,
        "num_links": len(links),
        "dof": dof,
        "mesh_paths": mesh_paths,
        "links": links,
        "joints": joints,
    }


def run_evaluation(
    cfg: PipelineConfig,
    joint_map: np.ndarray | None = None,
    asset_root: str | None = None,
    verbose: bool = True,
    num_configs: int = 3,
    pred_ori: tuple | None = None,
) -> dict:
    """``pred_ori`` overrides the registry's predicted-URDF base euler.
    The registry value corrects the reference's REAL scans (captured with
    a rolled base); data captured by this framework's own simulator is in
    sim_ori's frame already, so self-generated real-layout runs pass
    ``pred_ori=(0, 0, 0)`` (scripts/realscan_run.py)."""
    from .eval import compare_joints, load_offset, resim_chamfer

    robot = get_robot(cfg.robot)
    offset = load_offset(cfg.raw_dir())
    if pred_ori is None:
        pred_ori = robot.ori
    cmp = compare_joints(
        pred_urdf_path=cfg.urdf_path(),
        gt_urdf_path=robot.gt_path(asset_root),
        dof=robot.dof,
        offset=offset,
        sim_ori=robot.sim_ori,
        pred_ori=pred_ori,
        joint_map=joint_map,
        global_scale=robot.global_scale,
        asset_root=asset_root,
    )
    eval_dir = cfg.eval_dir()
    os.makedirs(eval_dir, exist_ok=True)
    np.savetxt(
        os.path.join(eval_dir, "pos_mean_std.txt"),
        (np.mean(cmp.pos_errors), np.std(cmp.pos_errors)),
    )
    np.savetxt(
        os.path.join(eval_dir, "dir_mean_std.txt"),
        (np.mean(cmp.dir_errors), np.std(cmp.dir_errors)),
    )
    with open(os.path.join(eval_dir, "coverage.txt"), "w") as f:
        f.write(f"matched {cmp.matched} / {cmp.total}\n")
        f.write(f"dir_mean_matched {cmp.dir_mean_matched:.4f}\n")
        f.write(f"dir_mean_complete {cmp.dir_mean_complete:.4f}\n")
        f.write(f"pos_mean_complete {cmp.pos_mean_complete:.6f}\n")
    # per-joint breakdown: which gt joint maps to which predicted joint and
    # its individual errors — the diagnosis artifact for "which joint is bad"
    with open(os.path.join(eval_dir, "per_joint.txt"), "w") as f:
        f.write("gt_joint pred_joint dir_err_deg pos_err_m\n")
        jm = cmp.joint_map if cmp.joint_map is not None else []
        dc = cmp.dir_errors_complete or []
        pc = cmp.pos_errors_complete or []
        for gi, pi in enumerate(jm):
            de = f"{dc[gi]:.3f}" if gi < len(dc) else "nan"
            pe = f"{pc[gi]:.5f}" if gi < len(pc) else "nan"
            f.write(f"{gi} {int(pi)} {de} {pe}\n")
    if verbose:
        print(f"[eval] joint pos err {np.mean(cmp.pos_errors):.4f} m, "
              f"dir err {np.mean(cmp.dir_errors):.2f} deg "
              f"(matched {cmp.matched}/{cmp.total}, "
              f"complete {cmp.dir_mean_complete:.2f} deg)")

    losses, mean, std = resim_chamfer(
        pred_urdf_path=cfg.urdf_path(),
        gt_urdf_path=robot.gt_path(asset_root),
        dof=robot.dof,
        offset=offset,
        joint_map=cmp.joint_map,
        direction_map=cmp.direction_map,
        save_path=eval_dir,
        sim_ori=robot.sim_ori,
        pred_ori=pred_ori,
        radius=robot.cam_dist,
        num_cameras=cfg.num_cameras,
        global_scale=robot.global_scale,
        asset_root=asset_root,
        seed=cfg.seed,
        num_configs=num_configs,
    )
    if verbose:
        print(f"[eval] resim chamfer {mean:.4f} +- {std:.4f}")
    # metric context: the same protocol's gt-vs-gt score — capture +
    # sampling + unobservable-surface floor.  Large objects are
    # floor-dominated (dishwasher: floor 0.056 at 10k points, with the
    # bottom surface never visible to the camera sphere), so a resim
    # number is only interpretable next to its floor.
    gt_path = robot.gt_path(asset_root)
    rng_floor = np.random.default_rng(cfg.seed)
    _, floor_mean, _ = resim_chamfer(
        pred_urdf_path=gt_path, gt_urdf_path=gt_path, dof=robot.dof,
        offset=np.zeros(robot.dof),
        joint_map=np.arange(robot.dof), direction_map=[1.0] * robot.dof,
        sim_ori=robot.sim_ori, pred_ori=robot.sim_ori,
        radius=robot.cam_dist, num_cameras=cfg.num_cameras,
        asset_root=asset_root, seed=cfg.seed, num_configs=num_configs,
        a_list=rng_floor.random((num_configs, robot.dof)) * 2.0 - 1.0,
    )
    np.savetxt(os.path.join(eval_dir, "floor.txt"), [floor_mean])
    if verbose:
        print(f"[eval] resim floor (gt-vs-gt) {floor_mean:.4f}")
    with _telemetry(cfg).stage("evaluate", robot=cfg.robot,
                               dir_mean=round(float(np.mean(cmp.dir_errors)), 3)
                               if cmp.dir_errors else None,
                               chamfer_mean=round(mean, 4)):
        pass
    return {
        "pos_errors": cmp.pos_errors,
        "dir_errors": cmp.dir_errors,
        "pos_mean": float(np.mean(cmp.pos_errors)),
        "dir_mean": float(np.mean(cmp.dir_errors)),
        "matched": cmp.matched,
        "total": cmp.total,
        "dir_mean_matched": cmp.dir_mean_matched,
        "dir_mean_complete": cmp.dir_mean_complete,
        "pos_mean_complete": cmp.pos_mean_complete,
        "chamfer_losses": losses.tolist(),
        "chamfer_mean": mean,
        "chamfer_std": std,
        "chamfer_floor": floor_mean,
    }
