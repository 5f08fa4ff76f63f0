"""Sharded place-recognition scoring: the keyframe-database BoW matrix
row-sharded over a device mesh.

The reference scores a query against every stored keyframe through a
word->KF inverted file walked on one CPU thread
(``/root/reference/src/KeyFrameDatabase.cc:612-741``).  The TPU-native form
is a dense (K, n_words) matrix resident on the mesh, rows sharded over the
``obs`` axis: each chip scores its own keyframe rows (no collectives — the
output stays row-sharded and only the small (K,) vectors land on host).
At reference scale (thousands of KFs x 10k-1M words) this is the memory- and
bandwidth-bound half of loop detection, and it scales linearly with chips.

Row updates are functional in-place (`.at[kf].set` with donated buffers), so
adding a keyframe ships one row, not the whole matrix — important through a
relay tunnel and on pods alike.

``KeyFrameDatabase.attach_mesh(mesh)`` routes its `_scores` through this;
detached (the default) it stays host-numpy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _make_score_fn(mesh: Mesh, axis: str):
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(axis), P(axis)),
    )
    def score_local(bow_blk, has_blk, q):
        q_has = q > 0
        common = jnp.sum(has_blk & q_has[None, :], axis=1).astype(jnp.int32)
        # DBoW2 L1 score: 1 - 0.5 |v - w|_1 (both L1-normalized)
        score = 1.0 - 0.5 * jnp.sum(jnp.abs(bow_blk - q[None, :]), axis=1)
        return common, score

    return jax.jit(score_local)


@partial(jax.jit, donate_argnums=(0, 1))
def _set_row(bow, has, kf, row):
    bow = bow.at[kf].set(row)
    has = has.at[kf].set(row > 0)
    return bow, has


class ShardedKFDB:
    """Device-resident, row-sharded mirror of a ``KeyFrameDatabase``."""

    def __init__(self, mesh: Mesh, n_words: int, max_kf: int, axis: str = "obs"):
        if max_kf % mesh.devices.size:
            raise ValueError("max_kf must be divisible by the mesh device count")
        self.mesh = mesh
        self.axis = axis
        self.n_words = n_words
        self.max_kf = max_kf
        sh = NamedSharding(mesh, P(axis, None))
        self.bow = jax.device_put(jnp.zeros((max_kf, n_words), jnp.float32), sh)
        self.has = jax.device_put(jnp.zeros((max_kf, n_words), jnp.bool_), sh)
        self._score = _make_score_fn(mesh, axis)

    @classmethod
    def from_host(cls, mesh: Mesh, bow: np.ndarray, axis: str = "obs") -> "ShardedKFDB":
        s = cls(mesh, bow.shape[1], bow.shape[0], axis)
        sh = NamedSharding(mesh, P(axis, None))
        s.bow = jax.device_put(jnp.asarray(bow, jnp.float32), sh)
        s.has = jax.device_put(jnp.asarray(bow > 0), sh)
        return s

    def set_row(self, kf: int, bow_row: np.ndarray):
        """Ship ONE row to the device copy (KeyFrameDatabase::add analogue)."""
        self.bow, self.has = _set_row(
            self.bow, self.has, jnp.int32(kf), jnp.asarray(bow_row, jnp.float32)
        )

    def scores(self, query_bow: np.ndarray):
        """(common_words, l1_score) against every stored row, each (K,)."""
        common, score = self._score(self.bow, self.has, jnp.asarray(query_bow, jnp.float32))
        return np.asarray(common), np.asarray(score)
