"""Residual pose-regression MLP family (flax).

Rebuilds the reference's coordinate networks
(/root/reference/PointCloud/model_utils.py): one tiny MLP maps all K
cluster poses to refined poses each epoch.  Four rotation
parameterizations, selected by ``mode``:

- ``"q"``   : input (K, 7)  [xyz, quat wxyz] -> residual xyz + renormalized
              residual quat (QRegMLP, the reference default)
- ``"dq"``  : input (K, 8)  dual quaternion -> residual dual quaternion
- ``"rpy"`` : input (K, 6)  [xyz, euler XYZ] -> residual xyz + tanh-bounded
              residual euler
- ``"6d"``  : input (K, 9)  [xyz, rot6d] -> residual xyz + residual 6d

All modes share the 4-octave sin/cos positional encoding and the
Linear(enc -> hidden) + LeakyReLU encoder of the reference.  The module
consumes and produces (K, 4, 4) matrices so the training loop is mode
agnostic.

Weights use torch's Linear init (uniform +-1/sqrt(fan_in) for kernel and
bias) so epoch-0 residual magnitudes match the reference's optimizer
dynamics.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import dualquat as dqlib
from ..core import rotations as R
from ..core import se3

MODES = ("q", "dq", "rpy", "6d")


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch.nn.Linear's default."""
    fan_in = shape[0] if len(shape) == 2 else shape[-1]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        # bias init needs the input fan-in, which flax's bias_init can't see;
        # declare it manually.
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (in_features, self.features))
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -1.0 / jnp.sqrt(in_features), 1.0 / jnp.sqrt(in_features)
            ),
            (self.features,),
        )
        return x @ kernel + bias


def sin_encoding(x: jax.Array) -> jax.Array:
    """4-octave Fourier features, concatenated along the last axis."""
    feats = []
    for f in (1.0, 2.0, 4.0, 8.0):
        feats.append(jnp.sin(f * x))
        feats.append(jnp.cos(f * x))
    # reference order is [sin(x), cos(x), sin(2x), cos(2x), ...]
    return jnp.concatenate(
        [feats[0], feats[1], feats[2], feats[3], feats[4], feats[5], feats[6], feats[7]],
        axis=-1,
    )


class _MLPHead(nn.Module):
    hidden: Sequence[int]
    out: int
    act: Callable = nn.leaky_relu

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = self.act(_Dense(h)(x))
        return _Dense(self.out)(x)


class PoseRegressor(nn.Module):
    """Residual pose MLP: (K, 4, 4) poses in -> (K, 4, 4) refined poses out."""

    mode: str = "q"
    hidden_dim: int = 512

    def _encode(self, rep: jax.Array, act: Callable) -> jax.Array:
        x = sin_encoding(rep)
        return act(_Dense(self.hidden_dim)(x))

    @nn.compact
    def __call__(self, m: jax.Array) -> jax.Array:
        h = self.hidden_dim
        rot = se3.rot_of(m)
        t = se3.trans_of(m)

        if self.mode == "q":
            q = R.matrix_to_quat(rot)
            rep = jnp.concatenate([t, q], axis=-1)  # (K, 7)
            feat = self._encode(rep, nn.leaky_relu)
            d_xyz = _MLPHead((h // 2,), 3)(feat)
            d_q = _MLPHead((h,), 4)(feat)
            new_t = t + d_xyz
            new_q = R.quat_normalize(q + d_q, eps=1e-12)
            return se3.make_transform(R.quat_to_matrix(new_q), new_t)

        if self.mode == "dq":
            rep = dqlib.from_transform(m)  # (K, 8)
            feat = self._encode(rep, nn.relu)
            delta = _MLPHead((h,), 8, act=nn.relu)(feat)
            return dqlib.to_transform(rep + delta)

        if self.mode == "rpy":
            e = R.matrix_to_euler(rot)
            rep = jnp.concatenate([t, e], axis=-1)  # (K, 6)
            feat = self._encode(rep, nn.leaky_relu)
            d_xyz = _MLPHead((h // 2,), 3)(feat)
            d_e = jnp.tanh(_MLPHead((h,), 3)(feat))
            return se3.make_transform(R.euler_to_matrix(e + d_e), t + d_xyz)

        if self.mode == "6d":
            r6 = R.matrix_to_rot6d(rot)
            rep = jnp.concatenate([t, r6], axis=-1)  # (K, 9)
            feat = self._encode(rep, nn.leaky_relu)
            d_xyz = _MLPHead((h // 2,), 3)(feat)
            d_r6 = _MLPHead((h,), 6)(feat)
            return se3.make_transform(R.rot6d_to_matrix(r6 + d_r6), t + d_xyz)

        raise ValueError(f"unknown mode {self.mode!r}; expected one of {MODES}")


def init_params(key: jax.Array, mode: str, num_clusters: int, hidden_dim: int = 512):
    model = PoseRegressor(mode=mode, hidden_dim=hidden_dim)
    dummy = jnp.tile(jnp.eye(4, dtype=jnp.float32), (num_clusters, 1, 1))
    return model, model.init(key, dummy)
