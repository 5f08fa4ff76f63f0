"""Sharded place-recognition scoring: the keyframe-database sparse BoW rows
row-sharded over a device mesh.

The reference scores a query against every stored keyframe through a
word->KF inverted file walked on one CPU thread
(``/root/reference/src/KeyFrameDatabase.cc:612-741``).  The TPU-native form
mirrors the host KeyFrameDatabase's SPARSE rows — (K, T) word ids + tf-idf
weights with T bounded by the feature budget, NOT the vocabulary size — so a
reference-scale 10^5-10^6-word vocabulary (ORBvoc ~1M words, System.cc:131)
shards the same as a 10^4-word one.  Scoring: the query becomes a dense
(n_words,) lookup table replicated to every chip; each chip gathers its own
rows' query weights and reduces ``sum over shared words of min(v, w)`` — the
exact DBoW2 L1 similarity of L1-normalized vectors.  No collectives: the
output stays row-sharded and only the small (K,) vectors land on host.

Row updates are functional in-place (`.at[kf].set` with donated buffers), so
adding a keyframe ships one sparse row, not the whole store — important
through a relay tunnel and on pods alike.

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
    def score_local(ids_blk, w_blk, lut):
        # lut has n_words + 1 entries; id -1 indexes the trailing zero
        qw = lut[jnp.where(ids_blk >= 0, ids_blk, lut.shape[0] - 1)]
        shared = (qw > 0) & (w_blk > 0)
        common = jnp.sum(shared, axis=1).astype(jnp.int32)
        score = jnp.sum(jnp.where(shared, jnp.minimum(w_blk, qw), 0.0), axis=1)
        return common, score

    return jax.jit(score_local)


@partial(jax.jit, donate_argnums=(0, 1))
def _set_row(ids, w, kf, row_ids, row_w):
    return ids.at[kf].set(row_ids), w.at[kf].set(row_w)


class ShardedKFDB:
    """Device-resident, row-sharded mirror of a ``KeyFrameDatabase``."""

    def __init__(self, mesh: Mesh, n_words: int, max_kf: int,
                 row_words: int = 1024, axis: str = "obs"):
        if max_kf % mesh.devices.size:
            raise ValueError("max_kf must be divisible by the mesh device count")
        self.mesh = mesh
        self.axis = axis
        self.n_words = n_words
        self.max_kf = max_kf
        self.row_words = row_words
        sh = NamedSharding(mesh, P(axis, None))
        self.ids = jax.device_put(
            jnp.full((max_kf, row_words), -1, jnp.int32), sh
        )
        self.w = jax.device_put(jnp.zeros((max_kf, row_words), jnp.float32), sh)
        self._score = _make_score_fn(mesh, axis)

    @classmethod
    def from_host(cls, mesh: Mesh, ids: np.ndarray, w: np.ndarray,
                  n_words: int, axis: str = "obs") -> "ShardedKFDB":
        s = cls(mesh, n_words, ids.shape[0], row_words=ids.shape[1], axis=axis)
        sh = NamedSharding(mesh, P(axis, None))
        s.ids = jax.device_put(jnp.asarray(ids, jnp.int32), sh)
        s.w = jax.device_put(jnp.asarray(w, jnp.float32), sh)
        return s

    def set_row(self, kf: int, row_ids: np.ndarray, row_w: np.ndarray):
        """Ship ONE sparse row to the device copy (KeyFrameDatabase::add)."""
        self.ids, self.w = _set_row(
            self.ids, self.w, jnp.int32(kf),
            jnp.asarray(row_ids, jnp.int32), jnp.asarray(row_w, jnp.float32),
        )

    def scores(self, query_bow: np.ndarray):
        """(common_words, shared-min score) against every stored row, (K,)."""
        lut = jnp.concatenate(
            [jnp.asarray(query_bow, jnp.float32), jnp.zeros(1, jnp.float32)]
        )
        common, score = self._score(self.ids, self.w, lut)
        return np.asarray(common), np.asarray(score)
