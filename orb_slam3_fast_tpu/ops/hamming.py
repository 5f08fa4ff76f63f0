"""Hamming-distance matching primitives on unpacked binary descriptors.

TPU-native replacement for ``ORBmatcher::DescriptorDistance`` (8x32-bit
popcount, ``/root/reference/src/ORBmatcher.cc:1959-1975``) and the various
best/second-best search loops.  With descriptors stored unpacked as (N,256)
int8 in {0,1}, the full pairwise distance matrix is ONE int8 MXU matmul:

    H(a,b) = |a| + |b| - 2 a.b

which turns every SearchBy* variant into "build a boolean candidate mask,
add it to the distance matrix, take a masked row-wise top-2" — no scalar
loops, no grids, no TBB (SURVEY.md §2.3: the fork's TBB-over-points loops
with their unsynchronized ``nmatches++`` race disappear by construction).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TH_HIGH = 100  # ORBmatcher.cc:34
TH_LOW = 50  # ORBmatcher.cc:35
HISTO_LENGTH = 30  # ORBmatcher.cc:36
INF_DIST = 10_000


def hamming_matrix(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(N,256)x(M,256) int8 {0,1} -> (N,M) int32 Hamming distances via MXU."""
    na = jnp.sum(da.astype(jnp.int32), axis=-1, keepdims=True)  # (N,1)
    nb = jnp.sum(db.astype(jnp.int32), axis=-1, keepdims=True)  # (M,1)
    dot = jax.lax.dot_general(
        da,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return na + nb.T - 2 * dot


class Best2(NamedTuple):
    idx: jnp.ndarray  # (N,) argmin over M (masked)
    dist: jnp.ndarray  # (N,) best distance (INF_DIST if no candidate)
    dist2: jnp.ndarray  # (N,) second-best distance
    idx2: jnp.ndarray  # (N,) second-best index


def masked_best2(dist: jnp.ndarray, mask: jnp.ndarray) -> Best2:
    """Row-wise best & second-best under a boolean candidate mask."""
    d = jnp.where(mask, dist, INF_DIST)
    i1 = jnp.argmin(d, axis=-1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=-1)[:, 0]
    d_wo = d.at[jnp.arange(d.shape[0]), i1].set(INF_DIST)
    i2 = jnp.argmin(d_wo, axis=-1)
    d2 = jnp.take_along_axis(d_wo, i2[:, None], axis=-1)[:, 0]
    return Best2(i1, d1, d2, i2)


def penalized_best2(d_eff: jnp.ndarray) -> Best2:
    """Row-wise best & second-best of an additively-penalized distance
    matrix (no boolean mask anywhere — see the TPU lowering note in
    ops/matching.stereo_match; gates are relu penalties folded into d_eff,
    'no candidate' shows as dist >= INF_DIST)."""
    i1 = jnp.argmin(d_eff, axis=-1)
    d1 = jnp.take_along_axis(d_eff, i1[:, None], axis=-1)[:, 0]
    d_wo = d_eff.at[jnp.arange(d_eff.shape[0]), i1].set(jnp.inf)
    i2 = jnp.argmin(d_wo, axis=-1)
    d2 = jnp.take_along_axis(d_wo, i2[:, None], axis=-1)[:, 0]
    return Best2(i1, d1, d2, i2)


def ratio_gate(b: Best2, ratio: float, th: int) -> jnp.ndarray:
    """Lowe-style gate used throughout the reference: accept if best < th and
    best < ratio * second-best (e.g. ORBmatcher.cc:121-136)."""
    return (b.dist < th) & (b.dist.astype(jnp.float32) < ratio * b.dist2.astype(jnp.float32))


def mutual_consistency(best_ab: jnp.ndarray, best_ba: jnp.ndarray) -> jnp.ndarray:
    """accept a->b only if b->a maps back: best_ba[best_ab[i]] == i."""
    back = best_ba[best_ab]
    return back == jnp.arange(best_ab.shape[0])


def resolve_duplicate_targets(idx: jnp.ndarray, dist: jnp.ndarray, accept: jnp.ndarray, m: int):
    """Keep, per target column, only the lowest-distance accepted row
    (the reference erases the previous match when a better one lands,
    e.g. ORBmatcher.cc:687-704).  Returns updated accept mask."""
    d = jnp.where(accept, dist, INF_DIST)
    # per-target min distance via scatter-min
    col_best = jnp.full((m,), INF_DIST, dtype=d.dtype).at[idx].min(d)
    keep = accept & (d <= col_best[idx])
    # break remaining ties (two rows with identical dist to same target):
    # keep the lowest row index
    row_ids = jnp.arange(idx.shape[0])
    col_best_row = jnp.full((m,), 1 << 30).at[idx].min(jnp.where(keep, row_ids, 1 << 30))
    return keep & (row_ids == col_best_row[idx])


def rotation_consistency(
    angle_a: jnp.ndarray, angle_b: jnp.ndarray, accept: jnp.ndarray
) -> jnp.ndarray:
    """Rotation-histogram filter (reference CheckOrientation pattern,
    ORBmatcher.cc:1770-1805): bin the angle differences of accepted matches
    into 30 bins, keep only matches in the 3 most populated bins."""
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_a - angle_b, two_pi)
    binf = rot * (HISTO_LENGTH / two_pi)
    bins = jnp.clip(jnp.round(binf).astype(jnp.int32), 0, HISTO_LENGTH) % HISTO_LENGTH
    counts = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(accept.astype(jnp.int32))
    top3_val, top3_idx = jax.lax.top_k(counts, 3)
    # exactly 3 bins (top_k breaks count ties by bin index, deterministic),
    # and the reference discards the 2nd/3rd bins when their count falls
    # below 0.1x the max bin (ORBmatcher.cc:1949-1953 ComputeThreeMaxima)
    keep2 = top3_val[1].astype(jnp.float32) >= 0.1 * top3_val[0].astype(jnp.float32)
    keep3 = top3_val[2].astype(jnp.float32) >= 0.1 * top3_val[0].astype(jnp.float32)
    good = (bins == top3_idx[0]) & (top3_val[0] > 0)
    good |= (bins == top3_idx[1]) & keep2 & (top3_val[1] > 0)
    good |= (bins == top3_idx[2]) & keep3 & (top3_val[2] > 0)
    return accept & good
