"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) at a level that
overrides the env var, so we must force the platform through jax.config
before any backend initialization.  XLA flags still need to be set before
jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Fast/slow tiers.  Everything not explicitly slow is marked "fast";
# `pytest -m fast` is the <60 s smoke tier, `pytest -m "not slow"` the
# same thing, and the unmarked default runs all.  Slow = the e2e pipeline
# file plus individually-measured multi-second tests (durations from a
# full-suite run; see ROADMAP r3).

SLOW_FILES = {"test_end_to_end.py"}
SLOW_TESTS: set[str] = {
    # measured >5 s on the CI CPU (pytest --durations, r3)
    "test_dp_registration_matches_unsharded",       # 33.7s
    "test_dp_sp_train_step_matches_unsharded",      # ~30s
    "test_ragged_frames_masked_registration",       # 25.9s
    "test_fused_matches_batched",                   # 21.9s
    "test_sharded_chamfer_grad_matches_single",     # 15.7s
    "test_amortized_converges_close_to_exact",      # 14.1s
    "test_two_link_sequence",                       # 13.3s
    "test_sharded_chamfer_nondivisible_and_masked", # 11.6s
    "test_shared_init_mask_with_larger_other_sequence",  # 11.4s
    "test_improves_perturbed_axes",                 # 10.1s
    "test_recovers_rigid_translation",              # 7.3s
    "test_grad_flows",                              # 7.3s
    "test_output_near_input_at_init",               # 12s over params
    "test_moving_cluster_follows_arm",              # 6.9s
    "test_corr_every_one_is_exact_path",            # 6.5s
    "test_chamfer_auto_shards_in_mesh_scope",       # 6.4s
    "test_recovers_axis_from_bad_init",             # 6.4s
    "test_sharded_chamfer_matches_single",          # 5.8s
    "test_kmeanspp_full",                           # 5.5s
    "test_custom_vjp_matches_gather_rebuild_autodiff",  # ~8s over params
    "test_gradients_finite_at_zero_angle",          # 3.7s
    "test_noise_applied",                           # 3.6s
    "test_chamfer_grad_through_fused_kernel",       # 3.5s
    "test_best_loss_is_min_of_history",             # 3.2s
    "test_early_stop_freezes",                      # 3.1s
    "test_from_indices_equals_chamfer_when_fresh",  # 3.0s
    "test_proximity_mst_falls_into_the_trap",       # 2.8s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = getattr(item, "path", None)
        fname = fname.name if fname is not None else ""
        base = getattr(item, "originalname", None) or item.name.split("[")[0]
        is_slow = (fname in SLOW_FILES or base in SLOW_TESTS
                   or item.get_closest_marker("slow") is not None)
        if is_slow:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
