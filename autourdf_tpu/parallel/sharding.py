"""Multi-chip scaling via jax.sharding meshes.

The reference is single-process single-GPU; its only parallel structure is
the embarrassingly-parallel sequence loop (mlp_reg.py:434-435).  Here that
structure becomes first-class device parallelism:

- **dp** (sequence axis): independent video sequences shard across chips;
  each chip runs the full fused registration scan for its sequences.  No
  collectives on the hot path — pure data parallelism over the mesh.
- **sp** (point axis): the Chamfer nearest-neighbor search shards the
  reference cloud across chips with ``shard_map``; per-chip partial minima
  combine with an ``lax.pmin`` over ICI, and the directional means with
  ``psum``.  This is how frames larger than one chip's comfortable VMEM
  footprint (dense scans, >100k points) register without host chunking.

Both paths compile against any mesh shape, so a v5e-8 slice runs
(dp=8) or (dp=4, sp=2) by changing one tuple.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """Mesh over the first prod(axis_sizes) visible devices."""
    n = int(np.prod(axis_sizes))
    devices = np.asarray(jax.devices()[:n]).reshape(tuple(axis_sizes))
    return Mesh(devices, tuple(axis_names))


def shard_sequences(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree of (S, ...) arrays with the sequence axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def register_sequences_sharded(
    mesh: Mesh,
    model,
    cfg,
    step_params_batch,
    anchor_params_batch,
    init,
    frames: jax.Array,
    axis_name: str = "dp",
):
    """Data-parallel batched registration: sequences sharded over the mesh.

    The per-sequence program is identical to the single-chip path; XLA
    partitions the vmapped computation along the sequence axis with zero
    cross-chip traffic.
    """
    from ..registration.pipeline import register_sequences_batched

    step_params_batch = shard_sequences(mesh, step_params_batch, axis_name)
    anchor_params_batch = shard_sequences(mesh, anchor_params_batch, axis_name)
    frames = shard_sequences(mesh, frames, axis_name)
    init = replicate(mesh, init)
    return register_sequences_batched(
        model, cfg, step_params_batch, anchor_params_batch, init, frames
    )


def sharded_chamfer(
    mesh: Mesh,
    x: jax.Array,  # (N, 3) prediction, replicated
    y: jax.Array,  # (M, 3) target, sharded along points
    axis_name: str = "sp",
    norm: int = 1,
) -> jax.Array:
    """Chamfer-L1 with the target cloud sharded across chips.

    x -> y direction: each chip computes x's min distance against its y
    shard; ``pmin`` over the mesh gives the global minima.  y -> x: each
    chip handles its own y shard against replicated x; directional means
    combine with ``psum``.
    """
    m_total = y.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(),
    )
    def _cham(x_full, y_shard):
        # x -> y: local min then cross-chip min
        diff = x_full[:, None, :] - y_shard[None, :, :]
        d = (
            jnp.sum(jnp.abs(diff), axis=-1)
            if norm == 1
            else jnp.sum(diff * diff, axis=-1)
        )
        local_min_xy = jnp.min(d, axis=1)           # (N,)
        global_min_xy = jax.lax.pmin(local_min_xy, axis_name)
        term_xy = jnp.mean(global_min_xy)

        # y -> x: each shard's own minima; sum then normalize by M
        local_min_yx = jnp.min(d, axis=0)           # (M_shard,)
        term_yx = jax.lax.psum(jnp.sum(local_min_yx), axis_name) / m_total
        return term_xy + term_yx

    return _cham(x, y)
