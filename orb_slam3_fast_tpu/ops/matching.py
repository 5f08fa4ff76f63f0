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
        & _valid_outer(kp0.valid, kp1.valid)
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
    r = radius * _pow_level(pred_level, level_scales)  # (M,)
    dx = jnp.abs(proj_uv[:, None, 0] - kp.xy[None, :, 0])
    dy = jnp.abs(proj_uv[:, None, 1] - kp.xy[None, :, 1])
    lvl_ok = (kp.level[None, :] >= (pred_level[:, None] - level_slack_lo)) & (
        kp.level[None, :] <= (pred_level[:, None] + level_slack_hi)
    )
    mask = (
        (dx <= r[:, None])
        & (dy <= r[:, None])
        & lvl_ok
        & _valid_outer(proj_valid, kp.valid)
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
    r = radius * _pow_level(level_last, level_scales)
    dx = jnp.abs(proj_uv[:, None, 0] - kp_cur.xy[None, :, 0])
    dy = jnp.abs(proj_uv[:, None, 1] - kp_cur.xy[None, :, 1])
    lvl_ok = (kp_cur.level[None, :] >= level_last[:, None] - 1) & (
        kp_cur.level[None, :] <= level_last[:, None] + 1
    )
    mask = (
        (dx <= r[:, None])
        & (dy <= r[:, None])
        & lvl_ok
        & _valid_outer(proj_valid, kp_cur.valid)
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
    mask = _valid_outer(valid_a, valid_b)
    b_ab = ham.masked_best2(d, mask)
    b_ba = ham.masked_best2(d.T, mask.T)
    accept = ham.ratio_gate(b_ab, ratio, th)
    accept = accept & ham.mutual_consistency(b_ab.idx, b_ba.idx)
    return b_ab.idx, accept




def _pow_level(level: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """``table[level]`` for a GEOMETRIC per-level table, computed as
    ``table[0] * exp(level * ln(table[1]/table[0]))`` instead of a gather.
    TPU lowering note (bench r4): an (N,) gather fused into an (N,N)
    broadcast falls off the vector path into a ~20 ms scalar loop on this
    backend; the arithmetic form stays VPU-shaped."""
    ratio = jnp.log(table[1] / jnp.maximum(table[0], 1e-12))
    return table[0] * jnp.exp(level.astype(jnp.float32) * ratio)


def _valid_outer(va: jnp.ndarray, vb: jnp.ndarray) -> jnp.ndarray:
    """(N,) x (M,) validity -> (N,M) bool via an f32 outer product —
    broadcasting 1-byte bool INPUT arrays hits the same scalar fallback."""
    return va.astype(jnp.float32)[:, None] * vb.astype(jnp.float32)[None, :] > 0.5


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
    th_dist: int = (ham.TH_HIGH + ham.TH_LOW) // 2,  # thOrbDist (Frame.cc:947)
    row_slack: float = 2.0,
    slot_scale_r: jnp.ndarray | None = None,
):
    """Rectified stereo matching (reference Frame::ComputeStereoMatches,
    ``/root/reference/src/Frame.cc:921-1084``).

    Row-banded candidate mask (|vL - vR| <= row_slack * scale), disparity in
    [minD, maxD] with maxD = bf/min_z, Hamming best match, then parabolic
    subpixel refinement is delegated to the caller (needs image patches) —
    here we return the matched integer right-u.  Outlier pruning by median
    distance as in the reference (Frame.cc:1057-1078).
    """
    d = ham.hamming_matrix(kp_l.desc, kp_r.desc).astype(jnp.float32)
    max_d = bf / min_z
    # ---- TPU lowering note (bench r4, hard-won): on this backend an (N,N)
    # elementwise op is fast ONLY when it is pure ARITHMETIC between runtime
    # operands.  Broadcast COMPARISONS against vectors, bool-vector
    # broadcasts, and any op with a CONSTANT vector operand (XLA's constant
    # folding expands the broadcast into a multi-MB literal) each cost
    # ~22 ms.  So: every gate becomes an additive relu PENALTY on the
    # distance matrix (comparisons only against scalars), validity is an f32
    # term, and the structurally-constant ``level`` vectors are poisoned
    # with ``0*xy`` so nothing folds.
    rt0 = 0.0 * kp_l.xy[:, 0]  # runtime zero (Nl,)
    rt1 = 0.0 * kp_r.xy[:, 0]  # runtime zero (Nr,)
    lvl_l = kp_l.level.astype(jnp.float32) + rt0
    lvl_r = kp_r.level.astype(jnp.float32) + rt1
    if slot_scale_r is not None:
        # per-slot scale passed as an INPUT buffer (ext.slot_scales) — the
        # in-graph exp alternative re-executes per (N,N) element (see above)
        vr_band = row_slack * slot_scale_r
    else:
        log_sf = jnp.log(level_scales[1] / jnp.maximum(level_scales[0], 1e-9))
        vr_band = row_slack * jnp.exp(lvl_r * log_sf)  # (Nr,) runtime
    yl = kp_l.xy[:, 1]
    yr = kp_r.xy[:, 1]
    xl = kp_l.xy[:, 0]
    xr = kp_r.xy[:, 0]
    BIG = jnp.float32(ham.INF_DIST)
    pen = jnp.maximum(yl[:, None] - (yr + vr_band)[None, :], 0.0)  # row band hi
    pen = pen + jnp.maximum((yr - vr_band)[None, :] - yl[:, None], 0.0)  # lo
    # disparity in [1, max_d]: disp < 1 is indistinguishable from infinity
    # and would yield bogus finite depths (Frame.cc:1057 minD rejection)
    pen = pen + jnp.maximum((xr + 1.0)[None, :] - xl[:, None], 0.0)
    pen = pen + jnp.maximum(xl[:, None] - (xr + max_d * max_disp_frac)[None, :], 0.0)
    pen = pen + jnp.maximum(jnp.abs(lvl_l[:, None] - lvl_r[None, :]) - 1.0, 0.0)
    pen = pen + (1.0 - kp_l.valid.astype(jnp.float32) + rt0)[:, None]
    pen = pen + (1.0 - kp_r.valid.astype(jnp.float32) + rt1)[None, :]
    d_eff = d + BIG * pen
    b = ham.penalized_best2(d_eff)
    accept = b.dist <= th_dist
    # L->R / R->L mutual-best consistency: row-banded Hamming matching on
    # repetitive/background-straddling corners produces coherent wrong
    # matches whose bogus depths poison the map from the very first stereo
    # keyframe (measured: p90 landmark-to-surface error 4.7 units at init);
    # mutuality kills most of them for one extra argmin.
    rl_idx = jnp.argmin(d_eff, axis=0)
    accept = accept & ham.mutual_consistency(b.idx, rl_idx)
    # NOTE: no duplicate-right resolution beyond mutuality — the reference's
    # ComputeStereoMatches allows duplicates (its :1057-1078 block is the
    # median-distance prune, not a dedup); strict uniqueness was measured to
    # collapse stereo tracking.
    # median-distance outlier pruning: thDist = 1.5 * 1.4 * median
    dist_f = jnp.where(accept, b.dist, ham.INF_DIST).astype(jnp.float32)
    med = jnp.median(jnp.where(accept, dist_f, jnp.nan))
    med = jnp.nan_to_num(med, nan=float(ham.TH_HIGH))
    accept = accept & (dist_f <= 2.1 * med)
    ur = kp_r.xy[b.idx, 0]
    disparity = jnp.maximum(kp_l.xy[:, 0] - ur, 1.0)
    depth = jnp.where(accept, bf / disparity, -1.0)
    # sanity: positive finite depth
    accept = accept & (depth > 0) & (depth < 1e6)
    return StereoMatches(jnp.where(accept, ur, -1.0), jnp.where(accept, depth, -1.0), accept)


def search_for_triangulation(
    kp_a: Keypoints,
    kp_b: Keypoints,
    free_a: jnp.ndarray,
    free_b: jnp.ndarray,
    F_ab: jnp.ndarray,
    level_sigma2: jnp.ndarray,
    th: int = ham.TH_LOW,
    ratio: float = 1.0,  # the reference applies NO ratio test here
):
    """Epipolar-constrained matching of *unmatched* features between two
    keyframes for new-landmark triangulation (reference
    SearchForTriangulation, ORBmatcher.cc:886-1106 — there BoW-node
    restricted; here the epipolar band itself prunes the candidate set and
    the whole matrix is one masked matmul).

    F_ab: fundamental matrix such that x_b^T F_ab x_a = 0 (pixel coords).
    free_*: keypoint slots not yet associated to a landmark.
    """
    d = ham.hamming_matrix(kp_a.desc, kp_b.desc)
    xa = jnp.concatenate([kp_a.xy, jnp.ones_like(kp_a.xy[:, :1])], axis=-1)
    xb = jnp.concatenate([kp_b.xy, jnp.ones_like(kp_b.xy[:, :1])], axis=-1)
    lines_b = xa @ F_ab.T  # (Na,3) epipolar line of a-point in image b
    num = jnp.einsum("ai,bi->ab", lines_b, xb)
    den = lines_b[:, 0] ** 2 + lines_b[:, 1] ** 2
    dsq = (num * num) / jnp.maximum(den[:, None], 1e-12)
    # chi2 gate at 3.84 * sigma2 of the b keypoint's level (ORBmatcher.cc:1067)
    band = dsq < 3.84 * _pow_level(kp_b.level, level_sigma2)[None, :]
    mask = band & _valid_outer(free_a & kp_a.valid, free_b & kp_b.valid)
    b_ab = ham.masked_best2(d, mask)
    b_ba = ham.masked_best2(d.T, mask.T)
    accept = ham.ratio_gate(b_ab, ratio, th)
    accept = accept & ham.mutual_consistency(b_ab.idx, b_ba.idx)
    return b_ab.idx, accept


class FisheyeStereoMatches(NamedTuple):
    depth: jnp.ndarray  # (Nl,) left-camera z of the triangulated point (-1 invalid)
    x3d: jnp.ndarray  # (Nl,3) triangulated point in the LEFT camera frame
    idx: jnp.ndarray  # (Nl,) matched right keypoint index
    valid: jnp.ndarray  # (Nl,) bool


def fisheye_stereo_match(
    cam_l,
    cam_r,
    kp_l: Keypoints,
    kp_r: Keypoints,
    R_rl: jnp.ndarray,
    t_rl: jnp.ndarray,
    level_sigma2: jnp.ndarray,
    ratio: float = 0.7,
    th_dist: int = ham.TH_HIGH,
    min_parallax_cos: float = 0.9998,
):
    """Non-rectified two-camera (fisheye) stereo matching + triangulation.

    TPU-native replacement for ``Frame::ComputeStereoFishEyeMatches``
    (``/root/reference/src/Frame.cc:1273-1331``: cv::BFMatcher::knnMatch with
    a 0.7 ratio test) + ``KannalaBrandt8::TriangulateMatches``
    (``KannalaBrandt8.cpp:341-436``: parallax gate, DLT triangulation from
    unprojected bearings, depth + reprojection chi2 gates in BOTH views).
    One Hamming matmul + batched DLT instead of per-keypoint loops.

    ``R_rl, t_rl``: left-camera -> right-camera transform (from the YAML's
    Stereo.T_c1_c2 inverted).  Returns per-LEFT-keypoint results.
    """
    from orb_slam3_fast_tpu.cameras import models as cm
    from orb_slam3_fast_tpu.ops import twoview as tv

    d = ham.hamming_matrix(kp_l.desc, kp_r.desc)
    mask = _valid_outer(kp_l.valid, kp_r.valid)
    b = ham.masked_best2(d, mask)
    b_rl = ham.masked_best2(d.T, mask.T)
    accept = ham.ratio_gate(b, ratio, th_dist)
    accept = accept & ham.mutual_consistency(b.idx, b_rl.idx)

    # bearings (unit-z rays) in each camera
    r1 = cm.unproject(cam_l, kp_l.xy)  # (Nl,3)
    r2_all = cm.unproject(cam_r, kp_r.xy)
    r2 = r2_all[b.idx]
    # parallax between the rays expressed in the LEFT frame
    r2_in_l = jnp.einsum("ji,nj->ni", R_rl, r2)  # R_lr = R_rl^T
    cosp = jnp.sum(r1 * r2_in_l, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2_in_l, axis=-1)
    )
    accept = accept & (cosp < min_parallax_cos)

    # batched DLT: P1 = [I|0], P2 = [R_rl|t_rl], normalized coords = ray xy
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R_rl, t_rl[:, None]], axis=1)
    X = tv.triangulate_dlt(P1, P2, r1[:, :2], r2[:, :2])  # (Nl,3) left frame

    z1 = X[:, 2]
    xc2 = jnp.einsum("ij,nj->ni", R_rl, X) + t_rl
    z2 = xc2[:, 2]
    uv1 = cm.project(cam_l, X)
    uv2 = cm.project(cam_r, xc2)
    s2_l = level_sigma2[kp_l.level]
    s2_r = level_sigma2[kp_r.level][b.idx]
    e1 = jnp.sum((uv1 - kp_l.xy) ** 2, axis=-1)
    e2 = jnp.sum((uv2 - kp_r.xy[b.idx]) ** 2, axis=-1)
    accept = (
        accept
        & (z1 > 0.05)
        & (z2 > 0.05)
        & (e1 <= 5.991 * s2_l)
        & (e2 <= 5.991 * s2_r)
        & jnp.all(jnp.isfinite(X), axis=-1)
    )
    return FisheyeStereoMatches(
        depth=jnp.where(accept, z1, -1.0),
        x3d=X,
        idx=b.idx,
        valid=accept,
    )


def stereo_subpixel_refine(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    xy_l: jnp.ndarray,
    right_u: jnp.ndarray,
    valid: jnp.ndarray,
    win: int = 5,
    search: int = 5,
):
    """SAD sliding-window subpixel disparity refinement (reference
    Frame::ComputeStereoMatches correlation stage, Frame.cc:1005-1056):
    an 11x11 patch around the left keypoint is compared against the right
    image at integer offsets in [-search, search] around the Hamming match,
    and the best SAD is polished with a parabola fit.

    Whole batch at once: (N, 2*search+1) SAD matrix from gathered patches.
    Returns (refined_right_u, ok) — ok mirrors the reference's rejection of
    refinements that run off the search range.
    """
    h, w = img_l.shape
    n = xy_l.shape[0]
    d = 2 * win + 1
    yy = jnp.clip(jnp.round(xy_l[:, 1]).astype(jnp.int32), win, h - win - 1)
    xl = jnp.clip(jnp.round(xy_l[:, 0]).astype(jnp.int32), win + search, w - win - search - 1)
    xr0 = jnp.clip(jnp.round(right_u).astype(jnp.int32), win + search, w - win - search - 1)
    oy, ox = jnp.meshgrid(jnp.arange(-win, win + 1), jnp.arange(-win, win + 1), indexing="ij")
    flat_l = img_l.reshape(-1)
    flat_r = img_r.reshape(-1)
    # left patches (N, d*d)
    idx_l = (yy[:, None] + oy.reshape(-1)[None, :]) * w + (xl[:, None] + ox.reshape(-1)[None, :])
    pl = flat_l[idx_l]
    # normalize by the center pixel as the reference does (Frame.cc:1007-1012)
    pl = pl - pl[:, (d * d) // 2 : (d * d) // 2 + 1]
    offs = jnp.arange(-search, search + 1)
    sads = []
    for k in range(2 * search + 1):
        idx_r = (yy[:, None] + oy.reshape(-1)[None, :]) * w + (
            xr0[:, None] + offs[k] + ox.reshape(-1)[None, :]
        )
        pr = flat_r[idx_r]
        pr = pr - pr[:, (d * d) // 2 : (d * d) // 2 + 1]
        sads.append(jnp.sum(jnp.abs(pl - pr), axis=-1))
    sad = jnp.stack(sads, axis=-1)  # (N, 2s+1)
    best = jnp.argmin(sad, axis=-1)
    interior = (best > 0) & (best < 2 * search)
    bi = jnp.clip(best, 1, 2 * search - 1)
    c = jnp.take_along_axis(sad, bi[:, None], axis=1)[:, 0]
    m = jnp.take_along_axis(sad, (bi - 1)[:, None], axis=1)[:, 0]
    p = jnp.take_along_axis(sad, (bi + 1)[:, None], axis=1)[:, 0]
    denom = jnp.maximum(m + p - 2.0 * c, 1e-6)
    delta = jnp.clip(0.5 * (m - p) / denom, -1.0, 1.0)
    refined = xr0.astype(jnp.float32) + (bi - search).astype(jnp.float32) + delta
    ok = valid & interior
    return jnp.where(ok, refined, right_u), ok
