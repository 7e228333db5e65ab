"""Benchmark: wx200 50-frame registration throughput on one chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's default registration recipe
(scripts/registration.sh): wx200_5, 5 sequences x 10 frames x 5000 points,
20 clusters, 2 x 300 Adam epochs per frame pair with warm-started k-means
resampling — 45 registered frame pairs total.  Here the whole thing is one
batched jitted program (sequences vmapped), timed after compile.

Baseline: the CUDA reference runs the same 45 frame pairs as a Python
loop — 2x300 epochs each with a per-epoch host sync (mlp_reg.py:102
``loss.item()``) plus a per-frame GPU->CPU->GPU k-means round trip.  At
the ~20 ms/epoch that workload sustains on the reference's class of GPU
(>=600 host-synced CUDA chamfer launches per pair => ~12 s/pair), that is
0.083 frames/s.  BASELINE.json publishes no number, so that derived
figure is pinned here as the comparison denominator.

The derived figure is additionally ANCHORED by a measurement on this
chip: bench_reference_shape.py reproduces the reference's exact execution
shape (one program dispatch per epoch, host value-fetch per epoch, CPU
sklearn k-means round trip per frame) with this repo's own kernels and
measures 0.0345 frames/s (29.0 s/pair, 2026-08-16, v5e behind the axon
tunnel).  Per the round-4 verdict, the headline ``vs_baseline`` stays
pinned to the CONSERVATIVE derived CUDA denominator (0.083 frames/s) so
round-over-round comparisons are apples-to-apples; the same-chip measured
anchor is reported alongside in the detail block
(``vs_measured_reference_shape``).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Derived reference CUDA estimate — the conservative headline denominator
# (``vs_baseline``), pinned per the round-4 verdict.  See docstring.
DERIVED_CUDA_FRAMES_PER_SEC = 0.083
# Same-chip MEASURED anchor (bench_reference_shape.py, 2026-08-16): the
# reference's per-epoch-sync execution shape with this repo's kernels.
# Reported in the detail block.
MEASURED_REFERENCE_SHAPE_FPS = 0.0345
# Kernel detail at the production 5000^2 size, marginal-timed the same day:
KERNEL_DETAIL = {
    "chamfer_fwd_us": 112.7,
    "chamfer_fwd_grad_us": 230.3,
    "vpu_roofline_minonly_us": 62.5,
    "pairwise_dists_per_sec": "4.0e11",
}

NUM_VIDEOS = 5
NUM_STEPS = 10
NUM_POINTS = 5000
EPOCHS = 300


def _cache_dir() -> str:
    d = os.environ.get("AUTOURDF_BENCH_CACHE", "/tmp/autourdf_bench")
    os.makedirs(d, exist_ok=True)
    return d


def _ensure_dataset(cfg):
    from autourdf_tpu.io.artifacts import list_sequence_dirs
    from autourdf_tpu.sim.datagen import collect

    if len(list_sequence_dirs(cfg.raw_dir())) >= NUM_VIDEOS:
        return
    collect(cfg, asset_root=os.environ.get("AUTOURDF_ASSET_ROOT", "/root/reference"),
            epochs=NUM_VIDEOS)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autourdf_tpu.config import PipelineConfig, get_robot
    from autourdf_tpu.models.regmlp import PoseRegressor, init_params
    from autourdf_tpu.registration import (
        RegistrationConfig,
        initial_segments,
        register_sequences_batched,
    )
    from autourdf_tpu.workflow import load_raw_sequences

    cfg = PipelineConfig(
        robot="wx200_5", data_root=os.path.join(_cache_dir(), "data"),
        num_step=NUM_STEPS, num_videos=NUM_VIDEOS, num_points=NUM_POINTS,
        epochs=EPOCHS,
    )
    _ensure_dataset(cfg)
    robot = get_robot(cfg.robot)
    _, frames = load_raw_sequences(cfg.raw_dir(), NUM_VIDEOS)
    frames = jnp.asarray(frames[:, :NUM_STEPS])
    S, T = frames.shape[:2]

    init = initial_segments(jax.random.PRNGKey(0), frames[0, 0], robot.num_seg, n_init=10)
    reg_cfg = RegistrationConfig(num_seg=robot.num_seg, mode="q", epochs=EPOCHS)
    model = PoseRegressor(mode="q", hidden_dim=512)

    def mk(key):
        _, p = init_params(key, "q", robot.num_seg, 512)
        return p

    keys = jax.random.split(jax.random.PRNGKey(1), 2 * S)
    sp = jax.vmap(mk)(keys[:S])
    ap = jax.vmap(mk)(keys[S:])

    # compile + drain every queued program (not timed).  Synchronize via a
    # host value fetch: under the remote executor, block_until_ready has
    # been observed returning while work is still queued.
    result = register_sequences_batched(model, reg_cfg, sp, ap, init, frames)
    float(np.mean(np.asarray(result.losses)))
    np.asarray(result.matrices)

    # timed run on perturbed inputs: the remote executor elides re-execution
    # of byte-identical programs+inputs, which would fake a ~100x speedup
    frames_timed = frames + 1e-6
    t0 = time.time()
    result = register_sequences_batched(model, reg_cfg, sp, ap, init, frames_timed)
    # time-to-value: fetch the losses to host — block_until_ready alone has
    # been observed returning early through the remote-executor queue
    mean_loss = float(np.mean(np.asarray(result.losses)))
    np.asarray(result.matrices)
    elapsed = time.time() - t0

    frames_registered = S * (T - 1)
    fps = frames_registered / elapsed
    print(
        json.dumps(
            {
                "metric": "wx200 50-frame registration throughput (1 chip)",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / DERIVED_CUDA_FRAMES_PER_SEC, 2),
                "detail": {
                    "seconds_for_45_frame_pairs": round(elapsed, 2),
                    "mean_chamfer_loss": round(mean_loss, 5),
                    "backend": jax.default_backend(),
                    "baseline_fps_derived_cuda_estimate": (
                        DERIVED_CUDA_FRAMES_PER_SEC
                    ),
                    "vs_measured_reference_shape": round(
                        fps / MEASURED_REFERENCE_SHAPE_FPS, 2
                    ),
                    "measured_reference_shape_fps": MEASURED_REFERENCE_SHAPE_FPS,
                    "kernels_5000sq": KERNEL_DETAIL,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
