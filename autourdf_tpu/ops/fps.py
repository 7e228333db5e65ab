"""Farthest-point downsampling (Open3D ``farthest_point_down_sample``
replacement, /root/reference/Sim/sim_data.py:347) as a jittable fori_loop.

Deterministic: seeding from point 0 (Open3D's behavior).  Supports a
validity mask so fixed-capacity padded clouds can be sampled without
host-side compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sample(
    points: jax.Array, k: int, mask: jax.Array | None = None
) -> jax.Array:
    """Return int32 indices ``(k,)`` of a farthest-point subset of (N, 3).

    Masked-out points are never selected (their distance score is -inf).
    If fewer than ``k`` valid points exist, indices repeat the valid set.
    """
    n = points.shape[0]
    neg = jnp.full((n,), -jnp.inf)
    valid = None if mask is None else mask.astype(bool)

    def score(d):
        return d if valid is None else jnp.where(valid, d, -jnp.inf)

    first = 0 if valid is None else jnp.argmax(valid).astype(jnp.int32)
    mind = jnp.sum((points - points[first]) ** 2, axis=1)
    idxs0 = jnp.zeros((k,), jnp.int32).at[0].set(first)

    def body(i, state):
        idxs, mind = state
        nxt = jnp.argmax(score(mind)).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        d = jnp.sum((points - points[nxt]) ** 2, axis=1)
        return idxs, jnp.minimum(mind, d)

    idxs, _ = jax.lax.fori_loop(1, k, body, (idxs0, mind))
    return idxs
