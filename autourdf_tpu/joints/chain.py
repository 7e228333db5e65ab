"""Global kinematic-chain refinement (beyond the reference).

Once the tree and initial joints are known, the strongest supervision
available is the raw frames themselves: pose the *whole* robot model —
canonical per-link point clouds forward-kinematically chained through
explicit revolute joints — and fit every joint axis/origin plus all
per-frame joint angles jointly against the full frame clouds with the
masked Chamfer loss.  Segmentation-boundary noise and per-link visibility
changes, which bias per-link screw estimates, average out when the whole
robot competes for the whole cloud.

Model (links in tree order, root static):

    W_root(t)  = F_root(0)
    W_c(t)     = W_p(t) @ Rot(u_j, o_j, theta_{t,j}) @ [F_p(0)^-1 F_c(0)]

with (u_j, o_j) the joint axis/origin in the parent link frame and
theta_{0, j} = 0, so step 0 reproduces the registered configuration
exactly.  Parameters: all (u_j, o_j) and theta (per sequence, per step,
per joint); optimizer: Adam under fused scan chunks (same dispatch-bounded
pattern as registration).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rotations as R
from ..core import se3
from ..ops.chamfer import chamfer_distance, chamfer_distance_trunc
from ..ops.icp import icp_point_to_point
from .screw import JointEstimate


def _link_frame_np(cm, members, t) -> np.ndarray:
    from ..core.quat_np import mean_link_frame_np

    return mean_link_frame_np(cm.coords[t, members, :])


class ChainSpec(NamedTuple):
    """Static structure of the chain (hashable; jit-static)."""
    parent_index: tuple       # per joint: index of parent LINK in link order
    child_index: tuple        # per joint: index of child LINK in link order
    root_index: int


class ChainResult(NamedTuple):
    axes: jax.Array      # (J, 3) unit axes, parent-link frames
    origins: jax.Array   # (J, 3) origins, parent-link frames
    thetas: jax.Array    # (S, T, J)
    loss: jax.Array
    # per-joint loss sensitivity: (loss with theta_j frozen to the anchor
    # configuration) / (fitted loss) - 1.  Real articulation costs real
    # chamfer when frozen; a joint whose fitted motion is a symmetry-flat
    # or drift direction costs ~nothing (see joint freeze-delta probe).
    freeze_deltas: np.ndarray | None = None
    # fraction of all model points that can move when joint j moves (its
    # child link's subtree) — the natural scale of freeze_deltas[j]: a
    # small distal link's real articulation produces a small raw delta.
    subtree_share: np.ndarray | None = None


from .refine import _rot_about_axis as _rot_about

_POLISH_PAD = 1024  # ICP subsample size for canonical-union polishing


@jax.jit
def _batched_polish_icp(src, src_mask, tgt, tgt_mask, threshold):
    """vmapped p2p ICP of each source cloud onto one shared target."""
    return jax.vmap(
        lambda s, sm: icp_point_to_point(
            s, tgt, max_iterations=30, threshold=threshold,
            source_mask=sm, target_mask=tgt_mask,
        )
    )(src, src_mask)


def _polish_canonical_union(locals_t: list[np.ndarray], rng) -> list[np.ndarray]:
    """Rigidly re-align later-step local clouds onto the step-0 cloud.

    The multi-frame canonical union maps each step's observation into the
    link frame through the REGISTERED per-cluster poses, so every added
    step carries that step's registration error (~mm) into the canonical
    cloud.  The ur5 A/B measured the cost of the raw union: the two
    occlusion-dominated joints improved (3.84->2.45, 3.30->3.00 deg) while
    the three well-fit joints degraded (0.34->1.21, 1.53->2.36 deg) — the
    union helps exactly where surface is missing and hurts exactly where
    the smear exceeds the drift.  A small-threshold ICP of each step's
    cloud onto the step-0 cloud removes the rigid component of that
    registration error while keeping the newly visible surface (which has
    no correspondences and is simply carried along by the fitted rigid
    transform).
    """
    base = locals_t[0]
    if len(base) < 16:
        return locals_t
    diag = float(np.linalg.norm(base.max(0) - base.min(0)))
    threshold = max(0.1 * diag, 1e-3)

    def pad(cloud: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = min(len(cloud), _POLISH_PAD)
        idx = (
            rng.choice(len(cloud), n, replace=False)
            if len(cloud) > _POLISH_PAD
            else np.arange(len(cloud))
        )
        out = np.zeros((_POLISH_PAD, 3), np.float32)
        mask = np.zeros(_POLISH_PAD, bool)
        out[:n] = cloud[idx]
        mask[:n] = True
        return out, mask

    tgt, tgt_mask = pad(base)
    srcs, src_masks = zip(*(pad(c) for c in locals_t[1:]))
    res = _batched_polish_icp(
        jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(src_masks)),
        jnp.asarray(tgt), jnp.asarray(tgt_mask), threshold,
    )
    transforms = np.asarray(res.transform)
    out = [base]
    for k, cloud in enumerate(locals_t[1:]):
        T = transforms[k]
        out.append(cloud @ T[:3, :3].T + T[:3, 3])
    return out


def chain_world_transforms(spec: ChainSpec, frames0: jax.Array,
                           axes: jax.Array, origins: jax.Array,
                           theta: jax.Array) -> jax.Array:
    """(L, 4, 4) link world transforms for one step's joint angles (J,)."""
    L = frames0.shape[0]
    world = [None] * L
    world[spec.root_index] = frames0[spec.root_index]
    # joints are listed parent-before-child (tree order), one pass suffices
    for j, (pi, ci) in enumerate(zip(spec.parent_index, spec.child_index)):
        rel0 = se3.compose(se3.inverse(frames0[pi]), frames0[ci])
        J = _rot_about(axes[j], origins[j], theta[j])
        world[ci] = se3.compose(se3.compose(world[pi], J), rel0)
    return jnp.stack(world)


@functools.partial(jax.jit, static_argnames=("spec", "trunc"))
def _theta_loss(spec: ChainSpec, frames0, link_pts, link_masks,
                u, o, theta, frames, frame_masks, trunc: float = 0.0):
    """Mean chamfer over all sequences/steps for explicit (u, o, theta).

    Core of :func:`_chain_loss` without the unit-normalization and
    anchor pinning; also drives the post-fit freeze-delta probe (which
    always evaluates UNtruncated — the probe measures explanatory power,
    and its 0.25 veto threshold was calibrated on plain chamfer).

    ``trunc`` > 0 switches the per-step loss to the truncated robust
    Chamfer (ops.chamfer.chamfer_distance_trunc with tau = trunc x the
    median matched distance): occlusion-unexplained surface matches at
    cm-scale distances and pulls weakly-constrained axes persistently;
    the clip zeroes exactly those gradients.
    """
    L, P = link_pts.shape[:2]
    flat_mask = link_masks.reshape(L * P)

    def one_step(th, frame, fmask):
        world = chain_world_transforms(spec, frames0, u, o, th)  # (L,4,4)
        posed = se3.transform_points(world, link_pts)  # (L,P,3)
        if trunc > 0:
            return chamfer_distance_trunc(
                posed.reshape(L * P, 3), frame, flat_mask, fmask,
                norm=1, mult=trunc,
            )
        return chamfer_distance(
            posed.reshape(L * P, 3), frame, flat_mask, fmask, norm=1
        )

    def one_seq(th_seq, f_seq, m_seq):
        return jnp.mean(jax.vmap(one_step)(th_seq, f_seq, m_seq))

    return jnp.mean(jax.vmap(one_seq)(theta, frames, frame_masks))


@functools.partial(jax.jit, static_argnames=("spec", "anchor_step", "trunc"))
def _chain_loss(spec: ChainSpec, frames0, link_pts, link_masks,
                params, frames, frame_masks, anchor_step: int = 0,
                trunc: float = 0.0):
    """Mean chamfer over all sequences and steps."""
    u = params["u"]
    u = u / jnp.sqrt(jnp.maximum(jnp.sum(u * u, -1, keepdims=True), 1e-18))
    o = params["o"]
    if anchor_step == 0:
        # every sequence starts from the shared home configuration, so the
        # zero-angle pin applies to all of them
        theta = params["theta"].at[:, 0, :].set(0.0)  # (S, T, J)
    else:
        # anchored fit: only sequence 0 at the anchor step is pinned to the
        # registered canonical configuration (frames0 is taken there)
        theta = params["theta"].at[0, anchor_step, :].set(0.0)

    return _theta_loss(spec, frames0, link_pts, link_masks,
                       u, o, theta, frames, frame_masks, trunc=trunc)


@functools.partial(jax.jit,
                   static_argnames=("spec", "num_steps", "lr", "total_steps",
                                    "anchor_step", "trunc"))
def _chain_fit_chunk(spec: ChainSpec, frames0, link_pts, link_masks,
                     frames, frame_masks, carry, num_steps: int, lr: float,
                     total_steps: int, anchor_step: int = 0,
                     trunc: float = 0.0):
    params, mu, nu, i, ema, path = carry

    # geometry parameters move much slower than angles: the angles carry
    # the per-frame fit while axes/origins follow only persistent residuals
    group_lr = {"u": 0.2 * lr, "o": 0.1 * lr, "theta": lr}
    # Weakly-constrained axes random-walk under Adam noise at zero loss
    # cost once the chamfer plateaus (ur5's pan/lift drifted to 4.5/3.7
    # deg between step 400 and 1200 while the loss moved only
    # 0.01975 -> 0.01973), yet slow REAL convergence continues in the
    # same flat-loss regime (the wx200 wrist improves 7.9 -> 4.3 deg over
    # those steps).  Two measures, both aimed at the walk, not the fit:
    #   - cosine lr decay (floor 5%) after a 30% constant warmup: the
    #     walk's step size shrinks ~linearly while directed convergence
    #     mostly completes during the high-lr phase;
    #   - a tail EMA of the geometry (half-life ~total/6, live until
    #     total/2) that averages whatever wander remains.
    beta = 2.0 / (max(total_steps, 6) / 6.0 + 1.0)
    warmup = total_steps // 2

    def body(c, _):
        p, mu, nu, i, ema, path = c
        loss, g = jax.value_and_grad(
            lambda pp: _chain_loss(spec, frames0, link_pts, link_masks,
                                   pp, frames, frame_masks, anchor_step,
                                   trunc)
        )(p)
        i = i + 1
        mu = jax.tree.map(lambda m, gr: 0.9 * m + 0.1 * gr, mu, g)
        nu = jax.tree.map(lambda v, gr: 0.999 * v + 0.001 * gr * gr, nu, g)
        t = i.astype(jnp.float32)
        frac = jnp.clip((t / total_steps - 0.3) / 0.7, 0.0, 1.0)
        decay = 0.05 + 0.95 * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        p_new = {
            k: p[k] - decay * group_lr[k] * (mu[k] / (1 - 0.9**t))
            / (jnp.sqrt(nu[k] / (1 - 0.999**t)) + 1e-8)
            for k in p
        }
        # per-joint axis path length: with the per-window net displacement
        # (host side) this gives a directed-vs-diffusive motion diagnostic
        path = path + jnp.linalg.norm(p_new["u"] - p["u"], axis=1)
        b = jnp.where(i > warmup, beta, 1.0)  # track live until warmup
        ema = {k: ema[k] + b * (p_new[k] - ema[k]) for k in ("u", "o")}
        return (p_new, mu, nu, i, ema, path), loss

    (params, mu, nu, i, ema, path), losses = jax.lax.scan(
        body, (params, mu, nu, i, ema, path), None, length=num_steps)
    return (params, mu, nu, i, ema, path), losses[-1]


def refine_chain(
    links,
    joints: list[JointEstimate],
    cms,
    frames: np.ndarray,          # (S, T, N, 3) raw frame clouds
    steps: int = 300,
    lr: float = 2e-2,
    points_per_link: int = 768,
    dispatch_steps: int = 50,
    frame_masks: np.ndarray | None = None,  # (S, T, N) for ragged frames
    balance: bool = False,
    canonical_frames: int = 1,
    anchor_step: int = 0,
    freeze_probe: bool = True,
    trunc: float = 0.0,
    verbose: bool = False,
) -> tuple[list[JointEstimate], ChainResult]:
    """Jointly refine every joint against the raw frames of all sequences.

    ``links`` must be in tree order (root first) as kinematics_tree
    returns; joints[j] connects links by id.  Returns updated
    JointEstimates (global axis/pos at the step-0 configuration, the
    frames the URDF writer consumes).

    ``anchor_step`` selects which step of sequence 0 supplies the
    canonical link clouds, the link frames, and the zero-angle pin.  Each
    anchor sees a DIFFERENT occlusion pattern, so the directed axis bias
    from occlusion-incomplete canonical clouds differs per anchor —
    ``refine_chain_multi_anchor`` averages it out.  With ``anchor_step``
    > 0 the returned JointEstimates are expressed at the ANCHOR
    configuration, not step 0; consume ``ChainResult.axes/origins``
    (parent-link-frame coordinates, configuration-invariant) instead.

    ``balance=True`` reweights the forward (model -> frame) Chamfer term so
    every link contributes equally regardless of its point count: the mask
    array doubles as per-point weights in the Chamfer custom VJP, and each
    link's points get weight ``1 / n_link``.  Without it, a small distal
    link (e.g. a wrist carrying 1-2 clusters of a 5000-point cloud) is
    drowned by the big links' residuals and its joint axis barely moves
    during refinement.  The frame -> model direction keeps uniform weights
    (the frame cloud has no link identity).
    """
    id_to_pos = {l.id: i for i, l in enumerate(links)}
    spec = ChainSpec(
        parent_index=tuple(id_to_pos[j.parent_link] for j in joints),
        child_index=tuple(id_to_pos[j.child_link] for j in joints),
        root_index=next(i for i, l in enumerate(links) if l.parent_id is None),
    )

    cm = cms[0]
    # canonical per-link clouds in link frames (subsampled, padded).
    # ``canonical_frames`` > 1 unions observations from that many evenly
    # spaced steps of sequence 0, each mapped into the link frame via the
    # REGISTERED per-cluster pose at its own step: a single-step cloud is
    # occlusion-incomplete, and surface that only becomes visible as the
    # robot moves shows up in the raw frames with nothing in the model to
    # explain it — a persistent (directed, dir-ratio ~1) pull on
    # weakly-constrained axes (ur5 pan/lift walked 3-4 deg this way).
    rng = np.random.default_rng(0)
    L = len(links)
    T_cm = cm.matrices.shape[0]
    anchor_step = int(np.clip(anchor_step, 0, T_cm - 1))
    if canonical_frames <= 1:
        steps_used = [anchor_step]
    else:
        rest = sorted(
            {int(t) for t in np.linspace(0, T_cm - 1, canonical_frames)}
            - {anchor_step}
        )
        # anchor first: _polish_canonical_union aligns onto locals_t[0]
        steps_used = [anchor_step] + rest
    link_pts = np.zeros((L, points_per_link, 3), np.float32)
    link_masks = np.zeros((L, points_per_link), bool)
    frames0_np = np.zeros((L, 4, 4), np.float32)
    for i, link in enumerate(links):
        members = sorted(link.cluster_idx)
        frames0_np[i] = _link_frame_np(cm, members, anchor_step)
        locals_t = []
        for t in steps_used:
            pts_t = np.asarray(cm.cluster_points[t])
            labels_t = np.asarray(cm.cluster_labels[t])
            F = _link_frame_np(cm, members, t)
            inv = np.linalg.inv(F)
            parts = []
            for m in members:
                sel = labels_t == m
                M = cm.matrices[t, m]
                parts.append(pts_t[sel] @ M[:3, :3].T + M[:3, 3])
            world = np.concatenate(parts, axis=0)
            locals_t.append(world @ inv[:3, :3].T + inv[:3, 3])
        if len(locals_t) > 1:
            locals_t = _polish_canonical_union(locals_t, rng)
        local = np.concatenate(locals_t, axis=0)
        if len(local) > points_per_link:
            idx = rng.choice(len(local), points_per_link, replace=False)
            local = local[idx]
        link_pts[i, : len(local)] = local
        link_masks[i, : len(local)] = True

    # init params from the screw estimates, in parent-link frames.  The
    # screw estimate's global_axis/global_pos are expressed at the STEP-0
    # configuration, so the conversion must use the STEP-0 parent frame —
    # the local (u, o) are configuration-invariant (the parent frame is
    # rigidly attached to the link), so they are valid for any anchor.
    # Converting with frames0_np (taken at anchor_step) rotated the init
    # by the parent's step-0 -> anchor motion — tens of degrees on moving
    # parents, which the slow-lr geometry fit could not recover from and
    # the multi-anchor average then inherited (the --chain-anchors
    # catastrophic A/B: wx200_5 13.7 deg vs 1.77 baseline).
    J = len(joints)
    u0 = np.zeros((J, 3), np.float32)
    o0 = np.zeros((J, 3), np.float32)
    for j, joint in enumerate(joints):
        parent_members = sorted(
            next(l for l in links if l.id == joint.parent_link).cluster_idx)
        p0 = (_link_frame_np(cm, parent_members, 0).astype(np.float64)
              if anchor_step != 0
              else frames0_np[id_to_pos[joint.parent_link]].astype(np.float64))
        inv = np.linalg.inv(p0)
        ax = joint.global_axis / max(np.linalg.norm(joint.global_axis), 1e-12)
        u0[j] = inv[:3, :3] @ ax
        o0[j] = inv[:3, :3] @ joint.global_pos[:3] + inv[:3, 3]

    # initial angles: relative child rotation (vs step 0) projected onto the
    # initial axis, per sequence — the fit starts from the registered motion
    from scipy.spatial.transform import Rotation as ScipyRot

    S, T = frames.shape[:2]
    theta0 = np.zeros((S, T, J), np.float32)
    rel_anchor: dict[int, np.ndarray] = {}  # joint -> reference relative pose
    for s, cm_s in enumerate(cms[:S]):
        for j, joint in enumerate(joints):
            pm = sorted(next(l for l in links if l.id == joint.parent_link).cluster_idx)
            cmem = sorted(next(l for l in links if l.id == joint.child_link).cluster_idx)
            Tp = [_link_frame_np(cm_s, pm, t) for t in range(T)]
            Tc = [_link_frame_np(cm_s, cmem, t) for t in range(T)]
            if anchor_step == 0:
                # every sequence shares the home configuration; its own
                # step-0 relative pose is the zero reference
                rel0 = np.linalg.inv(Tp[0]) @ Tc[0]
            else:
                # anchored fit: the zero reference is sequence 0 at the
                # anchor step (where frames0 is taken), for all sequences
                if s == 0:
                    rel_anchor[j] = (np.linalg.inv(Tp[anchor_step])
                                     @ Tc[anchor_step])
                rel0 = rel_anchor[j]
            for t in range(T):
                if t == 0 and anchor_step == 0:
                    continue  # pinned to zero
                rel_t = np.linalg.inv(Tp[t]) @ Tc[t]
                d_rel = rel_t @ np.linalg.inv(rel0)
                rv = ScipyRot.from_matrix(d_rel[:3, :3]).as_rotvec()
                theta0[s, t, j] = float(rv @ u0[j])
    params = {"u": jnp.asarray(u0), "o": jnp.asarray(o0), "theta": jnp.asarray(theta0)}
    zeros = jax.tree.map(jnp.zeros_like, params)
    ema0 = {"u": params["u"], "o": params["o"]}
    carry = (params, zeros, zeros, jnp.zeros((), jnp.int32), ema0,
             jnp.zeros((J,), jnp.float32))

    frames_j = jnp.asarray(frames, jnp.float32)
    fmasks = (jnp.asarray(frame_masks) if frame_masks is not None
              else jnp.ones(frames.shape[:3], bool))
    f0 = jnp.asarray(frames0_np)
    lp = jnp.asarray(link_pts)
    if balance:
        counts = np.maximum(link_masks.sum(axis=1, keepdims=True), 1)
        lm = jnp.asarray(link_masks / counts, jnp.float32)
    else:
        lm = jnp.asarray(link_masks)

    if verbose and balance:
        print("[chain] balanced per-link forward weighting", flush=True)
    # keep each compiled dispatch near the known-good duration (wx200:
    # L=6 x 1024 pts x 5000-point frames at 50 steps/dispatch): chamfer
    # cost scales with L*P*N, and a single XLA execution past ~5 s can
    # wedge the tunneled device (solo12 at 20k points faulted every
    # probe after the first oversized dispatch)
    work = L * points_per_link * float(frames.shape[2])
    if frames.shape[2] > 16384:
        # large-M kernel regime: Mosaic materializes the distance block
        # twice (ops/knn.py VMEM accounting), ~2x slower per unit work —
        # the equal-work bound alone still wedged solo12's k>=12 probes
        # at 20k points (campaign_logs/solo12_20k.log)
        work *= 2.0
    base = 6 * 1024 * 5000.0
    dispatch_steps = int(np.clip(dispatch_steps * base / max(work, 1.0),
                                 2, dispatch_steps))
    remaining = steps
    loss = None
    win_u, win_path, win_step = np.asarray(params["u"]), 0.0, 0
    while remaining > 0:
        n = min(dispatch_steps, remaining)
        carry, loss = _chain_fit_chunk(
            spec, f0, lp, lm, frames_j, fmasks, carry, n, lr,
            total_steps=steps, anchor_step=anchor_step, trunc=trunc,
        )
        remaining -= n
        done = steps - remaining
        if verbose:
            print(f"[chain] {done}/{steps} loss {float(loss):.5f}",
                  flush=True)
            if done - win_step >= 200 or remaining == 0:
                # directed-vs-diffusive axis motion over the window:
                # r ~ 1 = the axis is still converging somewhere,
                # r ~ 0 = pure Adam random walk (wasted steps + drift)
                u_now = np.asarray(carry[0]["u"])
                p_now = np.asarray(carry[5])
                net = np.linalg.norm(u_now - win_u, axis=1)
                dpath = np.maximum(p_now - win_path, 1e-12)
                ratio = net / dpath
                print(f"[chain]   axis net deg "
                      f"{np.round(np.degrees(net), 2).tolist()} "
                      f"dir-ratio {np.round(ratio, 2).tolist()}",
                      flush=True)
                win_u, win_path, win_step = u_now, p_now, done

    params, ema = carry[0], carry[4]
    # geometry from the tail average (see _chain_fit_chunk); angles from
    # the live params (they track each frame exactly)
    u = np.asarray(ema["u"], np.float64)
    u = u / np.linalg.norm(u, axis=1, keepdims=True)
    o = np.asarray(ema["o"], np.float64)
    theta = np.asarray(params["theta"])

    refined = []
    for j, joint in enumerate(joints):
        p0 = frames0_np[id_to_pos[joint.parent_link]].astype(np.float64)
        global_axis = p0[:3, :3] @ u[j]
        global_pos = p0[:3, :3] @ o[j] + p0[:3, 3]
        refined.append(
            JointEstimate(
                parent_link=joint.parent_link,
                child_link=joint.child_link,
                local_axis=u[j],
                local_pos=np.concatenate([o[j], [1.0]]),
                global_pos=global_pos,
                global_axis=global_axis,
            )
        )
    # freeze-delta probe: how much chamfer does each joint's fitted motion
    # actually buy?  Zero theta_j (= freeze the child to the anchor
    # configuration) with everything else fitted and re-evaluate.  Real
    # articulation leaves observed surface unexplained (door swings, the
    # model door sits still -> large delta); a joint whose motion is a
    # symmetry-flat direction (cylindrical shell about its own axis) or
    # registration-drift absorption costs ~nothing.  One forward eval per
    # joint, host-looped to keep each device dispatch small (tunnel-safe).
    # Skipped for the ladder's short probe fits (freeze_probe=False).
    freeze = share = None
    if freeze_probe:
        u_dev = jnp.asarray(u, jnp.float32)
        o_dev = jnp.asarray(o, jnp.float32)
        th_dev = jnp.asarray(theta)
        base_loss = float(_theta_loss(spec, f0, lp, lm, u_dev, o_dev, th_dev,
                                      frames_j, fmasks))
        freeze = np.zeros(J, np.float64)
        eye = np.eye(J, dtype=np.float32)
        for j in range(J):
            mask = jnp.asarray(1.0 - eye[j])
            fl = float(_theta_loss(spec, f0, lp, lm, u_dev, o_dev,
                                   th_dev * mask, frames_j, fmasks))
            freeze[j] = fl / max(base_loss, 1e-12) - 1.0
        # natural scale of each delta: the point share of the child's
        # subtree (only those points move when theta_j is frozen)
        counts = link_masks.sum(axis=1).astype(np.float64)  # pre-balance
        children: dict[int, list[int]] = {}
        for pi, ci in zip(spec.parent_index, spec.child_index):
            children.setdefault(pi, []).append(ci)
        share = np.zeros(J, np.float64)
        for j, cj in enumerate(spec.child_index):
            stack, tot = [cj], 0.0
            while stack:
                n = stack.pop()
                tot += counts[n]
                stack.extend(children.get(n, []))
            share[j] = tot / max(counts.sum(), 1.0)
    result = ChainResult(jnp.asarray(u), jnp.asarray(o), jnp.asarray(theta),
                         loss if loss is not None else jnp.asarray(jnp.inf),
                         freeze_deltas=freeze, subtree_share=share)
    return refined, result


def refine_chain_multi_anchor(
    links,
    joints: list[JointEstimate],
    cms,
    frames: np.ndarray,
    anchors: int = 1,
    verbose: bool = False,
    **kw,
) -> tuple[list[JointEstimate], ChainResult]:
    """Average the chain fit over several canonical anchor steps (ours).

    The single-anchor chain fit carries a DIRECTED axis bias: the
    canonical link clouds are occlusion-incomplete in a step-0-specific
    way, so surface that appears in the raw frames with nothing in the
    model to explain it pulls weakly-constrained axes persistently
    (dir-ratio ~1 in the fit diagnostics; RESULTS.md round-3 findings).
    Filling the clouds via multi-frame unions was measured NEGATIVE — the
    union smears the canonical geometry by the per-step registration
    error and the smear is non-rigid (``--canonical-frames`` A/B).

    This attacks the bias rather than the occlusion: run ``anchors``
    independent fits, each anchored at a different step of sequence 0
    (different pose => different occlusion pattern => different bias
    direction), and average the fitted axes/origins in the PARENT-LINK
    frame, where they are configuration-invariant.  Geometry averaging
    cannot smear the model clouds because each fit uses a single-step
    (un-smeared) canonical cloud.

    Returns JointEstimates at the step-0 configuration (writer
    convention) and a ChainResult whose thetas/loss come from the
    anchor-0 fit with the axes/origins replaced by the averages.
    """
    anchors = max(1, int(anchors))
    if anchors == 1:
        return refine_chain(links, joints, cms, frames, verbose=verbose, **kw)

    T_cm = cms[0].matrices.shape[0]
    anchor_steps = sorted({int(t) for t in np.linspace(0, T_cm - 1, anchors)})
    fits = []
    res0 = None
    for a in anchor_steps:
        if verbose:
            print(f"[chain] multi-anchor fit at step {a} "
                  f"({len(fits) + 1}/{len(anchor_steps)})", flush=True)
        # freeze-delta diagnostics only from the anchor-0 fit (whose
        # thetas/loss the combined ChainResult reports)
        kw_a = dict(kw)
        kw_a["freeze_probe"] = kw.get("freeze_probe", True) and a == 0
        _, res = refine_chain(links, joints, cms, frames, anchor_step=a,
                              verbose=verbose, **kw_a)
        if a == 0:
            res0 = res
        fits.append(res)
    assert res0 is not None  # linspace always includes 0

    # sign-align each anchor's axes to the anchor-0 fit before averaging
    # (the axis sign is a gauge choice; a flip would cancel instead of
    # average).  Origins are points on the axis LINE with gauge freedom
    # along it — per-anchor fits settle at arbitrary arc-length positions,
    # so each origin is first re-gauged to the point on its own axis
    # closest to the anchor-0 origin before the mean (a raw point mean of
    # different gauges can sit off every fitted line).
    u0 = np.asarray(res0.axes, np.float64)
    o_ref = np.asarray(res0.origins, np.float64)
    us, origs = [], []
    for res in fits:
        u = np.asarray(res.axes, np.float64)
        sign = np.sign(np.sum(u * u0, axis=1, keepdims=True))
        sign[sign == 0] = 1.0
        u = u * sign
        o = np.asarray(res.origins, np.float64)
        o = o + np.sum((o_ref - o) * u, axis=1, keepdims=True) * u
        us.append(u)
        origs.append(o)
    u_avg = np.mean(us, axis=0)
    u_avg = u_avg / np.linalg.norm(u_avg, axis=1, keepdims=True)
    o_avg = np.mean(origs, axis=0)

    if verbose:
        # per-joint spread across anchors: a direct read of the
        # occlusion-bias magnitude the average is cancelling
        spreads = [
            float(np.degrees(np.arccos(np.clip(
                min(float(u[j] @ u_avg[j]) for u in us), -1.0, 1.0))))
            for j in range(u_avg.shape[0])
        ]
        print(f"[chain] multi-anchor axis spread (deg, max vs mean) "
              f"{np.round(spreads, 2).tolist()}", flush=True)

    # express at the step-0 configuration for the URDF writer
    refined = []
    for j, joint in enumerate(joints):
        members = sorted(
            next(l for l in links if l.id == joint.parent_link).cluster_idx)
        p0 = _link_frame_np(cms[0], members, 0).astype(np.float64)
        refined.append(
            JointEstimate(
                parent_link=joint.parent_link,
                child_link=joint.child_link,
                local_axis=u_avg[j],
                local_pos=np.concatenate([o_avg[j], [1.0]]),
                global_pos=p0[:3, :3] @ o_avg[j] + p0[:3, 3],
                global_axis=p0[:3, :3] @ u_avg[j],
            )
        )
    result = ChainResult(jnp.asarray(u_avg), jnp.asarray(o_avg),
                         res0.thetas, res0.loss,
                         freeze_deltas=res0.freeze_deltas,
                         subtree_share=res0.subtree_share)
    return refined, result


def merge_coarticulated_siblings(
    links,
    joints: list[JointEstimate],
    thetas: np.ndarray,
    scale: float,
    axis_deg: float = 10.0,
    line_frac: float = 0.12,
    corr_min: float = 0.92,
    min_range_deg: float = 5.0,
    verbose: bool = False,
) -> tuple[list, bool]:
    """Merge sibling links that articulate as ONE body on ONE hinge (ours).

    The failure this targets (storage cabinet, gt 3 links / 2 door
    hinges): the dendrogram splits one door into two links, the tree
    wires BOTH halves to the cabinet, and the chain fit gives each half
    the same ~35-50 deg swing about the same physical hinge line.  Every
    per-joint veto then reads "real articulation" — freezing either half
    leaves half a door unexplained (freeze-delta ~200% normalized), the
    excitation range is tens of degrees, and the screw axes are coherent
    — because the motion IS real; only the structure is wrong.  The
    discriminating signal is *pairwise*: two fitted joints tracking the
    same physical hinge have (a) near-parallel axes, (b) axis LINES that
    nearly coincide (the hinge line), and (c) per-frame theta
    trajectories correlated ~1.  Under this dataset's excitation
    (independent per-joint random walks, /root/reference Sim trajectory
    contract) two DISTINCT gt joints decorrelate: over S*T ~ 50 samples
    chance |corr| > 0.9 is vanishing, and physically parallel sibling
    hinges (storage's two real doors) sit on opposite cabinet edges, so
    the line-coincidence gate blocks them even before correlation.

    Candidates are sibling joint pairs (same parent link) whose fitted
    ranges BOTH exceed ``min_range_deg`` (weaker joints belong to the
    static/drift/freeze vetoes, which run first).  ``scale`` is the
    workload's cloud diagonal — the natural unit for the line-coincidence
    gate.  Merging absorbs the second child into the first (union of
    cluster memberships, grandchildren re-parented); the caller must
    re-estimate joints and refit, exactly as after prune_static_joints.
    """
    J = len(joints)
    if J < 2:
        return links, False
    ranges = np.degrees(
        (thetas.max(axis=1) - thetas.min(axis=1)).max(axis=0))
    flat = thetas.reshape(-1, J).astype(np.float64)  # (S*T, J)
    by_parent: dict[int, list[int]] = {}
    for j, joint in enumerate(joints):
        by_parent.setdefault(joint.parent_link, []).append(j)

    def pair_stats(j1: int, j2: int):
        u1 = np.asarray(joints[j1].global_axis, np.float64)
        u2 = np.asarray(joints[j2].global_axis, np.float64)
        u1 = u1 / max(np.linalg.norm(u1), 1e-12)
        u2 = u2 / max(np.linalg.norm(u2), 1e-12)
        s = float(np.sign(u1 @ u2)) or 1.0
        ang = float(np.degrees(np.arccos(np.clip(abs(u1 @ u2), -1.0, 1.0))))
        # distance between the two (near-parallel) axis lines: component
        # of the origin offset perpendicular to the common direction
        d = (np.asarray(joints[j2].global_pos[:3], np.float64)
             - np.asarray(joints[j1].global_pos[:3], np.float64))
        line_d = float(np.linalg.norm(d - (d @ u1) * u1))
        a = flat[:, j1] - flat[:, j1].mean()
        b = s * (flat[:, j2] - flat[:, j2].mean())
        denom = float(np.linalg.norm(a) * np.linalg.norm(b))
        corr = float(a @ b) / denom if denom > 1e-12 else 0.0
        return ang, line_d, corr

    merge: tuple[int, int] | None = None
    for sibs in by_parent.values():
        for i1 in range(len(sibs)):
            for i2 in range(i1 + 1, len(sibs)):
                j1, j2 = sibs[i1], sibs[i2]
                if ranges[j1] < min_range_deg or ranges[j2] < min_range_deg:
                    continue
                ang, line_d, corr = pair_stats(j1, j2)
                fired = (ang < axis_deg and line_d < line_frac * scale
                         and corr > corr_min)
                if verbose:
                    print(f"[coart] sibling joints "
                          f"{joints[j1].parent_link}->"
                          f"{joints[j1].child_link} / "
                          f"->{joints[j2].child_link}: axis {ang:.1f}deg "
                          f"line {line_d / max(scale, 1e-9) * 100:.0f}% "
                          f"corr {corr:.2f} "
                          f"ranges {ranges[j1]:.0f}/{ranges[j2]:.0f}deg"
                          f"{'  -> MERGE' if fired else ''}", flush=True)
                if fired and merge is None:
                    merge = (j1, j2)  # one merge per pass; loop refits

    if merge is None:
        return links, False
    j1, j2 = merge
    keep_id, victim_id = joints[j1].child_link, joints[j2].child_link
    by_id = {l.id: l for l in links}
    by_id[keep_id].cluster_idx |= by_id[victim_id].cluster_idx
    survivors = []
    for l in links:
        if l.id == victim_id:
            continue
        if l.parent_id == victim_id:
            l.parent_id = keep_id
        survivors.append(l)
    renum = {l.id: i for i, l in enumerate(sorted(survivors,
                                                  key=lambda l: l.id))}
    for l in survivors:
        l.id = renum[l.id]
        if l.parent_id is not None:
            l.parent_id = renum[l.parent_id]
    return survivors, True


def prune_static_joints(
    links,
    joints: list[JointEstimate],
    thetas: np.ndarray,
    threshold: float = 0.035,
    extra_static: list[int] | None = None,
) -> tuple[list, bool]:
    """Merge child links whose fitted joint never moves (ours).

    After the chain fit, ``thetas`` (S, T, J) carries each joint's
    per-frame angles.  A real joint in this data moves tens of degrees in
    its best sequence (the trajectory generator excites every gt joint
    40-70 deg); a SPURIOUS joint — the probe ladder or the dendrogram
    splitting one rigid link in two (franka seed-2026 k=8, op3's 13th
    link) — fits only registration noise and its angle range stays within
    a degree or two.  Joints whose best-sequence range is below
    ``threshold`` (rad; default 2 deg) are removed and their child link's
    clusters merged into the parent.

    Returns (surviving LinkNodes in tree order, pruned?).  When pruned,
    the caller must re-estimate joints and re-run the chain fit on the
    merged structure (link mean frames change with membership).
    """
    ranges = (thetas.max(axis=1) - thetas.min(axis=1)).max(axis=0)
    static = [j for j, r in enumerate(ranges) if float(r) < threshold]
    # ``extra_static``: joint indices vetoed by an additional signal (the
    # drift veto in workflow.run_build_urdf combines a low fitted range
    # with incoherent registration screw axes)
    for j in extra_static or []:
        if j not in static:
            static.append(j)
    if not static:
        return links, False

    absorb = {joints[j].child_link: joints[j].parent_link for j in static}

    def resolve(lid):
        while lid in absorb:
            lid = absorb[lid]
        return lid

    by_id = {l.id: l for l in links}
    for victim, target in absorb.items():
        by_id[resolve(victim)].cluster_idx |= by_id[victim].cluster_idx
    survivors = []
    for l in links:  # original order preserves parent-before-child
        if l.id in absorb:
            continue
        if l.parent_id is not None:
            l.parent_id = resolve(l.parent_id)
        survivors.append(l)
    # renumber ids contiguously: downstream consumers (mesh {id:04}.stl
    # naming, the URDF writer's color table) index by link id
    renum = {l.id: i for i, l in enumerate(sorted(survivors,
                                                  key=lambda l: l.id))}
    for l in survivors:
        l.id = renum[l.id]
        if l.parent_id is not None:
            l.parent_id = renum[l.parent_id]
    return survivors, True
