"""Command-line interface — one binary, four subcommands.

Replaces the reference's three shell scripts + evaluation entry point
(scripts/{dataset,registration,generate_urdf}.sh, Sim/evaluation.py) and
their duplicated argparse blocks:

    python -m autourdf_tpu.cli dataset   --robot wx200_5
    python -m autourdf_tpu.cli register  --robot wx200_5
    python -m autourdf_tpu.cli urdf      --robot wx200_5 --unknown-dof
    python -m autourdf_tpu.cli evaluate  --robot wx200_5
    python -m autourdf_tpu.cli all       --robot wx200_5   (full pipeline)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .config import PipelineConfig, load_parameters_json


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--robot", type=str, default="wx200_5")
    p.add_argument("--data-root", type=str, default="data")
    p.add_argument("--step-size", type=int, default=4, help="motor step size (deg)")
    p.add_argument("--num-cameras", type=int, default=20)
    p.add_argument("--num-step", type=int, default=10, help="frames per sequence")
    p.add_argument("--num-video", type=int, default=5, help="number of sequences")
    p.add_argument("--num-points", type=int, default=5000)
    p.add_argument("--voxel-size", type=float, default=None,
                   help="override the registry's mesh voxel size (m)")
    p.add_argument("--num-seg", type=int, default=None,
                   help="override the registry's cluster count K (changes "
                        "the {robot}_{K}_seg artifact paths, so pass it to "
                        "every stage of the run)")
    p.add_argument("--seed-mode", type=str, default="kmeans++",
                   choices=["kmeans++", "fps"],
                   help="frame-0 cluster seeding: kmeans++ = reference "
                        "parity (density-proportional); fps = farthest-"
                        "point (density-independent, guarantees small "
                        "links get clusters)")
    p.add_argument("--parameters-json", type=str, default=None,
                   help="overlay a reference-format parameters.json")
    p.add_argument("--asset-root", type=str, default=None)
    p.add_argument("--seed", type=int, default=2024)


def _cfg(args) -> PipelineConfig:
    if args.parameters_json:
        load_parameters_json(args.parameters_json)
    return PipelineConfig(
        robot=args.robot,
        data_root=args.data_root,
        step_size_deg=args.step_size,
        num_cameras=args.num_cameras,
        num_step=args.num_step,
        num_videos=args.num_video,
        num_points=args.num_points,
        num_seg=args.num_seg,
        seed_mode=args.seed_mode,
        voxel_size=args.voxel_size,
        seed=args.seed,
        rot=getattr(args, "r", "q"),
        epochs=getattr(args, "epochs", 300),
        end_steps=getattr(args, "end_steps", args.num_step),
        noise=not getattr(args, "no_noise", False),
    )


def _add_urdf_flags(p: argparse.ArgumentParser) -> None:
    """Structure-discovery / chain-refinement flags, shared by the
    ``urdf`` and ``all`` subcommands (the full pipeline must run under
    the same defaults the standalone stage documents)."""
    p.add_argument("--dist-mode", type=str, default="pose",
                   choices=["pose", "diff", "legacy", "rigid", "swap",
                            "hybrid"],
                   help="pose/diff/legacy = reference maps; rigid = relative-"
                        "pose deviation (ours, decouples articulation from "
                        "spatial proximity); swap = observation-level "
                        "swap-consistency; hybrid = mean of pose and swap "
                        "(recovers quiet joints at the pose noise floor)")
    p.add_argument("--dof-method", type=str, default="auto",
                   choices=["auto", "gap", "silhouette"],
                   help="auto = gap when decisive else silhouette; silhouette = reference parity")
    p.add_argument("--refine", type=str, default="chain", choices=["chain", "none"],
                   help="global kinematic-chain joint refinement (ours); none = reference parity")
    p.add_argument("--refine-steps", type=int, default=1200,
                   help="chain-refinement Adam steps (the wx200_5 loss "
                        "plateaus by ~600; 1200 cut its axis error "
                        "3.10 -> 1.84 deg over the old 400)")
    p.add_argument("--canonical-frames", type=int, default=1,
                   help="build each link's canonical cloud from this many "
                        "evenly-spaced registered steps instead of frame 0 "
                        "only (completes occluded surface; see "
                        "joints/chain.py)")
    p.add_argument("--chain-anchors", type=int, default=1,
                   help="EXPERIMENTAL: average the chain fit over this "
                        "many canonical anchor steps (different pose => "
                        "different occlusion bias; the average cancels "
                        "it) — costs one full chain fit per anchor.  The "
                        "round-4 build carried an anchor-frame init bug "
                        "(7x worse on the flagships, see RESULTS.md "
                        "negative results); fixed in round 5, A/B in "
                        "flight — keep default 1 unless measuring")
    p.add_argument("--chain-trunc", type=float, default=0.0,
                   help="EXPERIMENTAL: truncated robust chain-fit Chamfer — "
                        "clip per-point matched distances at this multiple "
                        "of the per-direction median before the mean "
                        "(zeroes the gradient pull of occlusion-unexplained "
                        "surface; 0 disables)")
    p.add_argument("--chain-balance", action="store_true",
                   help="per-link balanced forward Chamfer in the chain "
                        "refinement (equal gradient weight per link); "
                        "measured neutral-to-negative on wx200_5, kept "
                        "opt-in for starved-link experiments")
    p.add_argument("--tree", type=str, default="motion", choices=["motion", "mst"],
                   help="link tree: motion = revolute-consistency MST (ours); "
                        "mst = reference proximity MST")
    p.add_argument("--no-reassign", action="store_true",
                   help="skip the carry-test boundary-cluster reassignment")
    p.add_argument("--no-dof-guard", action="store_true",
                   help="skip the observation-level rigidity guard that "
                        "escalates under-split unknown-DoF picks")
    p.add_argument("--no-dof-probe", action="store_true",
                   help="skip the chain-fit probe ladder that arbitrates "
                        "the unknown-DoF link count against the raw clouds")
    p.add_argument("--ladder-share-norm", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="judge each ladder drop against the point share "
                        "of the region the split changes (a correct split "
                        "of a small distal link can only buy a small "
                        "global chamfer drop; fixes many-small-link "
                        "under-splits).  Default ON since round 5 — the "
                        "pxs s2025/s2026 under-splits are the measured "
                        "failure it fixes; --no-ladder-share-norm restores "
                        "the raw criterion")
    p.add_argument("--prune-deg", type=float, default=2.0,
                   help="after chain refinement, merge child links whose "
                        "fitted joint angle range never exceeds this many "
                        "degrees (0 disables)")
    p.add_argument("--drift-prune", action="store_true",
                   help="also merge joints that are BOTH weakly excited "
                        "(fitted range < --drift-theta-deg) and axis-"
                        "incoherent across sequences (registration-drift "
                        "joints on large rigid shells; see "
                        "joints.screw.joint_screw_coherence)")
    p.add_argument("--drift-theta-deg", type=float, default=12.0)
    p.add_argument("--drift-conc", type=float, default=0.85)
    p.add_argument("--drift-spread-deg", type=float, default=45.0)
    p.add_argument("--freeze-prune", type=float, default=0.25,
                   help="merge joints whose share-normalized freeze-delta "
                        "(chamfer bought by the fitted motion, per unit "
                        "of subtree point share) is below this fraction — "
                        "symmetry-flat / drift joints; 0 disables.  The "
                        "default 0.25 is calibrated on the round-4 fd-probe "
                        "logs: spurious joints read 2-16%%, real joints "
                        ">= 55%% (see workflow.py)")
    p.add_argument("--coart-merge", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="merge sibling links whose fitted joints track ONE "
                        "physical hinge (near-parallel near-collinear axes "
                        "+ theta trajectories correlated ~1 — the split-"
                        "door case no per-joint veto can see; "
                        "joints/chain.py merge_coarticulated_siblings)")


def _urdf_kwargs(args) -> dict:
    return dict(
        dist_mode=args.dist_mode, dof_method=args.dof_method,
        refine=args.refine, refine_steps=args.refine_steps, tree=args.tree,
        chain_balance=args.chain_balance, chain_anchors=args.chain_anchors,
        canonical_frames=args.canonical_frames, chain_trunc=args.chain_trunc,
        reassign=not args.no_reassign, dof_guard=not args.no_dof_guard,
        dof_probe=not args.no_dof_probe,
        ladder_share_norm=args.ladder_share_norm,
        prune_deg=args.prune_deg, drift_prune=args.drift_prune,
        freeze_prune=args.freeze_prune,
        drift_theta_deg=args.drift_theta_deg, drift_conc=args.drift_conc,
        drift_spread_deg=args.drift_spread_deg,
        coart_merge=args.coart_merge,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="autourdf-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dataset", help="generate multi-view point cloud sequences")
    _add_common(p)
    p.add_argument("--ground", action="store_true")
    p.add_argument("--no_noise", action="store_true")
    p.add_argument("--epoch", type=int, default=5, help="collision-free sequences")
    p.add_argument("--pix", type=int, default=800)

    p = sub.add_parser("register", help="cluster registration over all sequences")
    _add_common(p)
    p.add_argument("--r", type=str, default="q", choices=["q", "rpy", "dq", "6d"])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--mlp_icp", action="store_true",
                   help="refine each cluster with masked ICP instead of the anchor MLP")
    p.add_argument("--normal", action="store_true",
                   help="augment clustering features with point normals")
    p.add_argument("--corr-every", type=int, default=1,
                   help="refresh NN correspondences every k epochs (1 = exact "
                        "reference semantics; 4-10 = amortized ICP-style, faster)")

    p = sub.add_parser("urdf", help="structure discovery -> URDF")
    _add_common(p)
    p.add_argument("--unknown-dof", "--unknown_dof", action="store_true",
                   dest="unknown_dof")
    p.add_argument("--start-steps", type=int, default=0)
    p.add_argument("--end-steps", dest="end_steps", type=int, default=10)
    p.add_argument("--end-video", "--end_video", dest="end_video", type=int, default=1)
    _add_urdf_flags(p)

    p = sub.add_parser("evaluate", help="joint accuracy + resim chamfer vs gt")
    _add_common(p)
    p.add_argument("--joint-map", type=str, default=None,
                   help="path to a reference-format joint index map txt")
    p.add_argument("--num-configs", type=int, default=3)
    p.add_argument("--pred-ori", type=str, default=None,
                   help="override predicted-URDF base euler 'r,p,y' (the "
                        "registry value corrects the reference's rolled real "
                        "scans; pass 0,0,0 for self-captured real-layout data)")

    p = sub.add_parser("view", help="render a URDF: axis snapshot + joint sweep GIFs")
    _add_common(p)
    p.add_argument("--urdf", type=str, default=None,
                   help="URDF path (default: this robot's recovered URDF)")
    p.add_argument("--out-dir", type=str, default="data/view")
    p.add_argument("--sweep", action="store_true", help="also render per-joint sweep GIFs")
    p.add_argument("--interactive", action="store_true",
                   help="export a self-contained interactive HTML viewer "
                        "(joint sliders + orbit camera, no dependencies)")

    p = sub.add_parser("all", help="dataset -> register -> urdf -> evaluate")
    _add_common(p)
    p.add_argument("--r", type=str, default="q", choices=["q", "rpy", "dq", "6d"])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--end-video", dest="end_video", type=int, default=5)
    p.add_argument("--epoch", type=int, default=5)
    p.add_argument("--pix", type=int, default=800)
    p.add_argument("--ground", action="store_true")
    p.add_argument("--no_noise", action="store_true")
    _add_urdf_flags(p)

    args = parser.parse_args(argv)
    cfg = _cfg(args)

    # AUTOURDF_PLATFORM=cpu forces the backend in-process: the deployment
    # pins JAX_PLATFORMS at a config layer that overrides the env var, so
    # a plain environment variable cannot select the platform.
    platform = os.environ.get("AUTOURDF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    # Persistent XLA compilation cache: first compile of the fused
    # registration scan costs minutes on a tunneled TPU; repeat runs with
    # the same shapes (seed sweeps, stage re-runs) hit the disk cache.
    # Opt out with AUTOURDF_COMPILE_CACHE=0 / point elsewhere with a path.
    cache = os.environ.get("AUTOURDF_COMPILE_CACHE", "")
    if cache != "0":
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir",
                              cache or os.path.expanduser("~/.cache/autourdf_xla"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # unsupported backend/version: run uncached
            print(f"[cli] compilation cache disabled: {e}", file=sys.stderr)

    from . import workflow

    if args.cmd == "dataset":
        dirs = workflow.run_dataset(cfg, asset_root=args.asset_root,
                                    ground=args.ground, epochs=args.epoch)
        print(json.dumps({"sequences": dirs}))
    elif args.cmd == "register":
        stats = workflow.run_registration(cfg, chamfer_backend=args.backend,
                                          mlp_icp=args.mlp_icp,
                                          use_normals=args.normal,
                                          corr_every=args.corr_every)
        print(json.dumps(stats))
    elif args.cmd == "urdf":
        cfg = cfg.replace(start_steps=args.start_steps, end_steps=args.end_steps)
        out = workflow.run_build_urdf(
            cfg, unknown_dof=args.unknown_dof, end_video=args.end_video,
            **_urdf_kwargs(args),
        )
        print(json.dumps({"urdf": out["urdf_path"], "links": out["num_links"],
                          "dof": out["dof"]}))
    elif args.cmd == "evaluate":
        import numpy as np

        jm = np.loadtxt(args.joint_map, dtype=int) if args.joint_map else None
        po = (tuple(float(v) for v in args.pred_ori.split(","))
              if args.pred_ori else None)
        out = workflow.run_evaluation(cfg, joint_map=jm, asset_root=args.asset_root,
                                      num_configs=args.num_configs, pred_ori=po)
        print(json.dumps(out))
    elif args.cmd == "view":
        from . import viz
        from .urdf.parser import load_urdf

        urdf_path = args.urdf or cfg.urdf_path()
        outs = [viz.urdf_snapshot(urdf_path, os.path.join(args.out_dir, "snapshot.png"),
                                  asset_root=args.asset_root)]
        if args.interactive:
            from .viz_interactive import export_interactive_html

            outs.append(export_interactive_html(
                urdf_path, os.path.join(args.out_dir, "interactive.html"),
                asset_root=args.asset_root))
        if args.sweep:
            model = load_urdf(urdf_path, asset_root=args.asset_root, load_meshes=False)
            for j in model.revolute_joints:
                outs.append(viz.sweep_joint_gif(
                    urdf_path, j.name,
                    os.path.join(args.out_dir, f"sweep_{j.name}.gif"),
                    asset_root=args.asset_root,
                ))
        print(json.dumps({"outputs": outs}))
    elif args.cmd == "all":
        workflow.run_dataset(cfg, asset_root=args.asset_root,
                             ground=args.ground, epochs=args.epoch)
        workflow.run_registration(cfg)
        out = workflow.run_build_urdf(cfg, unknown_dof=True,
                                      end_video=args.end_video,
                                      **_urdf_kwargs(args))
        ev = workflow.run_evaluation(cfg, asset_root=args.asset_root)
        print(json.dumps({"urdf": out["urdf_path"], "dof": out["dof"],
                          "links": out["num_links"],
                          "dir_err_deg": ev["dir_mean"],
                          "pos_err_m": ev["pos_mean"],
                          "matched": ev.get("matched"),
                          "total": ev.get("total"),
                          "dir_mean_complete": ev.get("dir_mean_complete"),
                          "chamfer": ev["chamfer_mean"],
                          "chamfer_floor": ev["chamfer_floor"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
