"""High-level feature matchers: windowed init matching, projection-guided
tracking matches, rectified stereo matching.

TPU-native replacement for the reference's ``ORBmatcher`` search family
(``/root/reference/src/ORBmatcher.cc``): every variant is expressed as
mask-building + one Hamming matmul + masked top-2 (see ops/hamming.py)
instead of per-keypoint loops over grid cells.  All inputs/outputs are
fixed-capacity masked arrays.

Matchers return ``(match_idx, accept)`` pairs: ``match_idx[i]`` is the column
index matched to row ``i``; rows with ``accept[i]==False`` are unmatched.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.ops import hamming as ham
from orb_slam3_fast_tpu.ops.extractor import Keypoints


def search_for_initialization(
    kp0: Keypoints,
    kp1: Keypoints,
    window: float = 100.0,
    ratio: float = 0.9,
    check_rotation: bool = True,
):
    """Monocular-initialization matcher (reference SearchForInitialization,
    ORBmatcher.cc:618-764): level-0 keypoints of two consecutive frames,
    candidates within a square window, ratio test, rotation histogram."""
    d = ham.hamming_matrix(kp0.desc, kp1.desc)
    dx = jnp.abs(kp0.xy[:, None, 0] - kp1.xy[None, :, 0])
    dy = jnp.abs(kp0.xy[:, None, 1] - kp1.xy[None, :, 1])
    mask = (
        (dx <= window)
        & (dy <= window)
        & (kp0.level[:, None] == 0)
        & (kp1.level[None, :] == 0)
        & kp0.valid[:, None]
        & kp1.valid[None, :]
    )
    b = ham.masked_best2(d, mask)
    accept = ham.ratio_gate(b, ratio, ham.TH_LOW)
    accept = ham.resolve_duplicate_targets(b.idx, b.dist, accept, kp1.n)
    if check_rotation:
        accept = ham.rotation_consistency(kp0.angle, kp1.angle[b.idx], accept)
    return b.idx, accept


def search_by_projection(
    kp: Keypoints,
    proj_uv: jnp.ndarray,
    proj_valid: jnp.ndarray,
    proj_desc: jnp.ndarray,
    pred_level: jnp.ndarray,
    level_scales: jnp.ndarray,
    radius: float = 3.0,
    th_dist: int = ham.TH_HIGH,
    ratio: float = 0.8,
    level_slack_lo: int = 1,
    level_slack_hi: int = 1,
):
    """Project-and-match for local-map tracking (reference
    SearchByProjection(Frame&, vector<MapPoint*>&), ORBmatcher.cc:42-221).

    Rows = map points (M), columns = frame keypoints (N).
      proj_uv: (M,2) projected pixel position of each landmark.
      proj_valid: (M,) frustum/visibility gate (isInFrustum result).
      proj_desc: (M,256) representative descriptors.
      pred_level: (M,) predicted octave (PredictScale).
      level_scales: (L,) per-level scale factors (1.2**l).
    Search radius is ``radius * scale[pred_level]`` as in the reference
    (r*mvScaleFactors[nPredictedLevel], ORBmatcher.cc:87-96).
    """
    d = ham.hamming_matrix(proj_desc, kp.desc)
    r = radius * level_scales[pred_level]  # (M,)
    dx = jnp.abs(proj_uv[:, None, 0] - kp.xy[None, :, 0])
    dy = jnp.abs(proj_uv[:, None, 1] - kp.xy[None, :, 1])
    lvl_ok = (kp.level[None, :] >= (pred_level[:, None] - level_slack_lo)) & (
        kp.level[None, :] <= (pred_level[:, None] + level_slack_hi)
    )
    mask = (
        (dx <= r[:, None])
        & (dy <= r[:, None])
        & lvl_ok
        & proj_valid[:, None]
        & kp.valid[None, :]
    )
    b = ham.masked_best2(d, mask)
    accept = ham.ratio_gate(b, ratio, th_dist)
    accept = ham.resolve_duplicate_targets(b.idx, b.dist, accept, kp.n)
    return b.idx, accept


def search_frame_to_frame(
    kp_cur: Keypoints,
    proj_uv: jnp.ndarray,
    proj_valid: jnp.ndarray,
    desc_last: jnp.ndarray,
    level_last: jnp.ndarray,
    angle_last: jnp.ndarray,
    level_scales: jnp.ndarray,
    radius: float = 15.0,
    check_rotation: bool = True,
):
    """Motion-model matcher (reference SearchByProjection(Current, Last),
    ORBmatcher.cc:1594-1806): last frame's landmarks projected into the
    current frame; window scaled by the landmark's observation level; match
    level constrained to [l, l+1]... reference searches level in
    [last_octave-1, last_octave+1] via GetFeaturesInArea(minLevel=l-1).
    Rotation-histogram filter as in the reference.
    """
    d = ham.hamming_matrix(desc_last, kp_cur.desc)
    r = radius * level_scales[level_last]
    dx = jnp.abs(proj_uv[:, None, 0] - kp_cur.xy[None, :, 0])
    dy = jnp.abs(proj_uv[:, None, 1] - kp_cur.xy[None, :, 1])
    lvl_ok = (kp_cur.level[None, :] >= level_last[:, None] - 1) & (
        kp_cur.level[None, :] <= level_last[:, None] + 1
    )
    mask = (
        (dx <= r[:, None])
        & (dy <= r[:, None])
        & lvl_ok
        & proj_valid[:, None]
        & kp_cur.valid[None, :]
    )
    b = ham.masked_best2(d, mask)
    accept = b.dist <= ham.TH_HIGH
    accept = ham.resolve_duplicate_targets(b.idx, b.dist, accept, kp_cur.n)
    if check_rotation:
        accept = ham.rotation_consistency(angle_last, kp_cur.angle[b.idx], accept)
    return b.idx, accept


def search_descriptors_mutual(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    th: int = ham.TH_LOW,
    ratio: float = 0.75,
):
    """Unconstrained mutual best match (BoW-node-free stand-in for
    SearchByBoW, ORBmatcher.cc:230-404; used for relocalization/loop
    candidate scoring until the vocabulary narrows candidates)."""
    d = ham.hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    b_ab = ham.masked_best2(d, mask)
    b_ba = ham.masked_best2(d.T, mask.T)
    accept = ham.ratio_gate(b_ab, ratio, th)
    accept = accept & ham.mutual_consistency(b_ab.idx, b_ba.idx)
    return b_ab.idx, accept


class StereoMatches(NamedTuple):
    right_u: jnp.ndarray  # (N,) refined right-image u coord (-1 invalid)
    depth: jnp.ndarray  # (N,) depth (-1 invalid)
    valid: jnp.ndarray  # (N,) bool


def stereo_match(
    kp_l: Keypoints,
    kp_r: Keypoints,
    level_scales: jnp.ndarray,
    bf: float,
    min_z: float,
    max_disp_frac: float = 1.0,
    th_dist: int = ham.TH_HIGH,
    row_slack: float = 2.0,
):
    """Rectified stereo matching (reference Frame::ComputeStereoMatches,
    ``/root/reference/src/Frame.cc:921-1084``).

    Row-banded candidate mask (|vL - vR| <= row_slack * scale), disparity in
    [minD, maxD] with maxD = bf/min_z, Hamming best match, then parabolic
    subpixel refinement is delegated to the caller (needs image patches) —
    here we return the matched integer right-u.  Outlier pruning by median
    distance as in the reference (Frame.cc:1057-1078).
    """
    d = ham.hamming_matrix(kp_l.desc, kp_r.desc)
    max_d = bf / min_z
    vr_band = row_slack * level_scales[kp_r.level]  # (Nr,)
    dv = jnp.abs(kp_l.xy[:, None, 1] - kp_r.xy[None, :, 1])
    disp = kp_l.xy[:, None, 0] - kp_r.xy[None, :, 0]
    lvl_ok = (kp_r.level[None, :] >= kp_l.level[:, None] - 1) & (
        kp_r.level[None, :] <= kp_l.level[:, None] + 1
    )
    mask = (
        (dv <= vr_band[None, :])
        & (disp >= -1.0)  # reference minD = 0 with subpixel slack
        & (disp <= max_d * max_disp_frac)
        & lvl_ok
        & kp_l.valid[:, None]
        & kp_r.valid[None, :]
    )
    b = ham.masked_best2(d, mask)
    accept = b.dist <= th_dist
    # median-distance outlier pruning: thDist = 1.5 * 1.4 * median
    dist_f = jnp.where(accept, b.dist, ham.INF_DIST).astype(jnp.float32)
    med = jnp.median(jnp.where(accept, dist_f, jnp.nan))
    med = jnp.nan_to_num(med, nan=float(ham.TH_HIGH))
    accept = accept & (dist_f <= 2.1 * med)
    ur = kp_r.xy[b.idx, 0]
    disparity = jnp.maximum(kp_l.xy[:, 0] - ur, 0.01)
    depth = jnp.where(accept, bf / disparity, -1.0)
    # sanity: positive finite depth
    accept = accept & (depth > 0) & (depth < 1e6)
    return StereoMatches(jnp.where(accept, ur, -1.0), jnp.where(accept, depth, -1.0), accept)
