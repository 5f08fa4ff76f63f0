"""ORB feature extraction pipeline: pyramid -> FAST -> NMS -> select ->
orientation -> rotated-BRIEF descriptors.

TPU-native replacement for the fork's TBB-parallel ``ORBextractor``
(``/root/reference/src/ORBextractor.cc``): the nested
levels x rows x cols x keypoints TBB loops (764-884, 1063-1101) become a
handful of whole-image batched ops per pyramid level inside ONE jitted
program; the sequential quad-tree ``DistributeOctTree`` (557-757) becomes a
vectorized per-cell ranked selection with identical intent (spatially even
top-response keypoints, SURVEY.md §7 "hard parts").

Output is a fixed-capacity SoA ``Keypoints`` batch (static shapes, validity
mask) — the XLA-friendly stand-in for ``vector<cv::KeyPoint>``.

Descriptors are 256-bit rotated BRIEF stored *unpacked* as (N,256) int8 in
{0,1}: Hamming distance then becomes an int8 MXU matmul (see ops/hamming.py).
The sampling pattern is generated once from a fixed seed, i.i.d. Gaussian
clipped to a radius-13 disc (classic BRIEF construction) — descriptor *parity*
with OpenCV's learned pattern is not required (ATE is the gate), but the
pattern is deterministic and versioned for map/vocabulary compatibility.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.ops import fast as fast_ops
from orb_slam3_fast_tpu.ops import image as image_ops

EDGE_BORDER = 16  # reference minBorder = EDGE_THRESHOLD - 3 (ORBextractor.cc:762)
PATCH_RADIUS = 15  # HALF_PATCH_SIZE (ORBextractor.cc:73)


class ExtractorConfig(NamedTuple):
    n_features: int = 1024
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    cell: int = 32  # NMS/selection cell (reference uses 35px, ORBextractor.cc:788)
    cand_per_cell: int = 8


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint batch; coordinates in level-0 pixels."""

    xy: jnp.ndarray  # (N,2) float32 [x, y] level-0 scale
    level: jnp.ndarray  # (N,) int32
    angle: jnp.ndarray  # (N,) float32 radians
    response: jnp.ndarray  # (N,) float32
    desc: jnp.ndarray  # (N,256) int8 in {0,1}
    valid: jnp.ndarray  # (N,) bool

    @property
    def n(self):
        return self.xy.shape[0]


def per_level_budget(n_features: int, n_levels: int, scale_factor: float) -> list[int]:
    """Geometric per-level feature budget (reference ctor ORBextractor.cc:427-446)."""
    factor = 1.0 / scale_factor
    n_first = n_features * (1 - factor) / (1 - factor**n_levels)
    budget = []
    acc = 0
    for l in range(n_levels - 1):
        k = int(round(n_first * factor**l))
        budget.append(k)
        acc += k
    budget.append(max(n_features - acc, 0))
    return budget


# ---------------------------------------------------------------------------
# BRIEF pattern + orientation tables (host-side constants)
# ---------------------------------------------------------------------------


def make_brief_pattern(seed: int = 42, n_bits: int = 256, radius: float = 13.0) -> np.ndarray:
    """(n_bits, 4) int32 [x1,y1,x2,y2], i.i.d. N(0, (2r/5)^2) clipped to the
    radius disc so rotated samples stay inside the 16px border."""
    rng = np.random.default_rng(seed)
    pts = np.empty((n_bits * 2, 2), dtype=np.float64)
    got = 0
    while got < n_bits * 2:
        cand = rng.normal(0.0, radius * 2 / 5, size=(n_bits * 4, 2))
        keep = cand[np.linalg.norm(cand, axis=1) <= radius]
        take = min(len(keep), n_bits * 2 - got)
        pts[got : got + take] = keep[:take]
        got += take
    p = np.round(pts).astype(np.int32)
    return np.concatenate([p[:n_bits], p[n_bits:]], axis=1)  # x1 y1 x2 y2


BRIEF_PATTERN = make_brief_pattern()


def _circular_umax(radius: int = PATCH_RADIUS) -> np.ndarray:
    """Half-width of the circular patch per row (reference umax, ORBextractor.cc:452-469)."""
    umax = np.zeros(radius + 1, dtype=np.int32)
    vmax = int(math.floor(radius * math.sqrt(2.0) / 2 + 1))
    vmin = int(math.ceil(radius * math.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(math.sqrt(radius * radius - v * v)))
    v0 = 0
    for v in range(radius, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def _circular_mask(radius: int = PATCH_RADIUS) -> np.ndarray:
    """(2r+1, 2r+1) bool circular mask matching the reference's umax patch."""
    umax = _circular_umax(radius)
    d = 2 * radius + 1
    m = np.zeros((d, d), dtype=bool)
    for v in range(-radius, radius + 1):
        u = umax[abs(v)]
        m[v + radius, radius - u : radius + u + 1] = True
    return m


CIRC_MASK = _circular_mask()
_ys, _xs = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
IC_X = (_xs * CIRC_MASK).astype(np.float32)
IC_Y = (_ys * CIRC_MASK).astype(np.float32)


# ---------------------------------------------------------------------------
# Keypoint selection (octree-NMS equivalent)
# ---------------------------------------------------------------------------


def select_keypoints(score: jnp.ndarray, n_target: int, cell: int, cand_per_cell: int):
    """Spatially-even top-response selection.

    Equivalent in intent to ``DistributeOctTree`` (ORBextractor.cc:557-757):
    every cell's best corner is preferred over any cell's second-best, then
    second-bests compete, etc.; ties broken by response.  Returns
    (xy (n,2) int32, resp (n,), valid (n,)).
    """
    h, w = score.shape
    ph, pw = (-h) % cell, (-w) % cell
    sp = jnp.pad(score, ((0, ph), (0, pw)), constant_values=0.0)
    gh, gw = (h + ph) // cell, (w + pw) // cell
    cells = sp.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    top_v, top_i = jax.lax.top_k(cells, cand_per_cell)  # (C, K)
    # flat pixel coords of candidates
    cy = (jax.lax.broadcasted_iota(jnp.int32, (gh * gw, cand_per_cell), 0) // gw) * cell
    cx = (jax.lax.broadcasted_iota(jnp.int32, (gh * gw, cand_per_cell), 0) % gw) * cell
    py = cy + top_i // cell
    px = cx + top_i % cell
    rank = jax.lax.broadcasted_iota(jnp.int32, (gh * gw, cand_per_cell), 1)
    # priority: smaller is better; invalid (zero score) -> +inf
    prio = rank.astype(jnp.float32) * 1.0e6 - jnp.minimum(top_v, 0.99e6)
    prio = jnp.where(top_v > 0.0, prio, jnp.inf)
    flat_prio = prio.reshape(-1)
    sel_v, sel = jax.lax.top_k(-flat_prio, n_target)
    xy = jnp.stack([px.reshape(-1)[sel], py.reshape(-1)[sel]], axis=-1)
    resp = top_v.reshape(-1)[sel]
    valid = jnp.isfinite(-sel_v)
    return xy, resp, valid


# ---------------------------------------------------------------------------
# Orientation + descriptors
# ---------------------------------------------------------------------------


def subpixel_refine(score: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Parabolic subpixel refinement of keypoint positions on the DENSE
    (pre-NMS) corner response map.  Neither OpenCV FAST nor the reference
    does this — integer keypoint quantization puts a ~0.3 px RMS noise floor
    under every reprojection residual, which on rotation-dominant motion
    biases pose optimization toward far points (near-point residuals at a
    slightly-wrong prediction exceed the chi2 gate) and starves triangulation.
    On TPU the refinement is six gathers + a fused ratio.

    IMPORTANT: ``score`` must be the dense response BEFORE non-max
    suppression — fitting on the post-NMS map (where neighbors are zeroed)
    biases the parabola toward the center and was measured to *degrade*
    tracking (round-1 note).  Returns (N,2) float offsets in [-0.5, 0.5].
    """
    h, w = score.shape
    x = xy[:, 0]
    y = xy[:, 1]
    flat = score.reshape(-1)

    def at(dy, dx):
        yy = jnp.clip(y + dy, 0, h - 1)
        xx = jnp.clip(x + dx, 0, w - 1)
        return flat[yy * w + xx]

    c = at(0, 0)
    xm, xp = at(0, -1), at(0, 1)
    ym, yp = at(-1, 0), at(1, 0)
    dx_den = 2.0 * c - xp - xm  # curvature (>0 at a maximum)
    dy_den = 2.0 * c - yp - ym
    ox = jnp.where(dx_den > 1e-6, 0.5 * (xp - xm) / jnp.maximum(dx_den, 1e-6), 0.0)
    oy = jnp.where(dy_den > 1e-6, 0.5 * (yp - ym) / jnp.maximum(dy_den, 1e-6), 0.0)
    return jnp.stack([jnp.clip(ox, -0.5, 0.5), jnp.clip(oy, -0.5, 0.5)], axis=-1)


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (reference IC_Angle, ORBextractor.cc:75-100).

    xy: (N,2) int32 pixel coords on this level.  Returns (N,) radians.
    Out-of-range keypoints read clamped patches — callers mask them.

    NOTE a dense whole-image moment convolution (31x31 kernel, 2 output
    channels) was tried here and REVERTED: with a single input channel XLA
    TPU lowers the conv to rank-1 MXU work and the tracking step regressed
    ~35x (bench r04).  Per-keypoint patch slices are the fast path.
    """
    r = PATCH_RADIUS
    pad = jnp.pad(img, r, mode="edge")
    icx = jnp.asarray(IC_X)
    icy = jnp.asarray(IC_Y)

    def one(p):
        patch = jax.lax.dynamic_slice(pad, (p[1], p[0]), (2 * r + 1, 2 * r + 1))
        m10 = jnp.sum(patch * icx)
        m01 = jnp.sum(patch * icy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


def brief_descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Rotated-BRIEF (reference computeOrbDescriptor, ORBextractor.cc:102-147).

    img_blur: blurred level image.  xy (N,2) int32, angle (N,).  Returns
    (N,256) int8 in {0,1}.  Sampling is nearest-neighbor of the rotated
    integer pattern, as in the reference (cvRound of rotated offsets).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(BRIEF_PATTERN, dtype=jnp.float32)  # (256,4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    # rotate both endpoints of every pair: (N,256)
    x1 = pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None]
    y1 = pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None]
    x2 = pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None]
    y2 = pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None]
    cx = xy[:, 0:1].astype(jnp.float32)
    cy = xy[:, 1:2].astype(jnp.float32)
    ix1 = jnp.clip(jnp.round(cx + x1).astype(jnp.int32), 0, w - 1)
    iy1 = jnp.clip(jnp.round(cy + y1).astype(jnp.int32), 0, h - 1)
    ix2 = jnp.clip(jnp.round(cx + x2).astype(jnp.int32), 0, w - 1)
    iy2 = jnp.clip(jnp.round(cy + y2).astype(jnp.int32), 0, h - 1)
    flat = img_blur.reshape(-1)
    v1 = flat[iy1 * w + ix1]
    v2 = flat[iy2 * w + ix2]
    return (v1 < v2).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------


def total_capacity(cfg: ExtractorConfig) -> int:
    return sum(per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor))


def slot_levels(cfg: ExtractorConfig) -> np.ndarray:
    """Static per-slot pyramid level (the keypoint layout is fixed per
    config: budgets[l] slots per level, concatenated in level order)."""
    budgets = per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    return np.concatenate(
        [np.full(n, l, dtype=np.int32) for l, n in enumerate(budgets)]
    )


def slot_scales(cfg: ExtractorConfig) -> np.ndarray:
    """Static per-slot scale factor (sf^level), built on HOST and meant to be
    passed INTO device programs as an input array.  TPU lowering note (bench
    r4): computing this in-graph (exp/gather of the level vector) gets fused
    per-ELEMENT into any (N,N) consumer and costs ~20 ms; as an input buffer
    it is free."""
    return (cfg.scale_factor ** slot_levels(cfg).astype(np.float32)).astype(np.float32)


# --- patch-stage constants -------------------------------------------------
BRIEF_RADIUS = 14  # |rotated pattern offset| <= 13 (+0.5 rounding) < 14
_BRIEF_PD = 2 * BRIEF_RADIUS + 1  # 29
_BRIEF_PD_PAD = 32  # lane-aligned patch dim for the one-hot matmuls


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(N, 2r+1, 2r+1) square patches centered on xy (int32, in-border).

    Callers guarantee ``radius <= EDGE_BORDER`` and xy clamped to the
    EDGE_BORDER interior, so no image padding is needed.  vmapped
    ``dynamic_slice`` lowers to an efficient contiguous-rows gather on TPU —
    measured ~5x faster than per-sample flat gathers (bench r5).
    """
    d = 2 * radius + 1

    def one(p):
        return jax.lax.dynamic_slice(img, (p[1] - radius, p[0] - radius), (d, d))

    return jax.vmap(one)(xy)


def ic_angles_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation from (N,31,31) patches (reference
    IC_Angle, ORBextractor.cc:75-100): two masked moment reductions."""
    m10 = jnp.sum(patches * jnp.asarray(IC_X), axis=(1, 2))
    m01 = jnp.sum(patches * jnp.asarray(IC_Y), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_from_patches(patches: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF from (N,29,29) blurred patches via SEPARABLE ONE-HOT
    batched matmuls — the TPU-native form of the reference's per-keypoint
    rotated gather (computeOrbDescriptor, ORBextractor.cc:102-147).

    A per-sample gather (flat or take_along_axis) is the slow path on TPU
    (measured 4.7 / 17.8 ms per image, bench r5); expressing the nearest
    sample as  v_s = onehot(y_s) . P . onehot(x_s)  turns the whole stage
    into one (N,512,32)x(N,32,32) batched matmul + a masked reduce
    (2.2 ms measured, bit-identical to the gather up to edge clamping).
    """
    n = patches.shape[0]
    P = jnp.pad(
        patches,
        ((0, 0), (0, _BRIEF_PD_PAD - _BRIEF_PD), (0, _BRIEF_PD_PAD - _BRIEF_PD)),
    ).astype(jnp.bfloat16)
    pat = jnp.asarray(BRIEF_PATTERN, dtype=jnp.float32)  # (256,4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    x1 = pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None]
    y1 = pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None]
    x2 = pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None]
    y2 = pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None]
    ix = jnp.clip(
        jnp.round(jnp.concatenate([x1, x2], 1)).astype(jnp.int32) + BRIEF_RADIUS,
        0,
        _BRIEF_PD - 1,
    )  # (N,512)
    iy = jnp.clip(
        jnp.round(jnp.concatenate([y1, y2], 1)).astype(jnp.int32) + BRIEF_RADIUS,
        0,
        _BRIEF_PD - 1,
    )
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _BRIEF_PD_PAD), 2)
    oh_y = (iy[:, :, None] == ar).astype(jnp.bfloat16)  # (N,512,32)
    oh_x = (ix[:, :, None] == ar).astype(jnp.bfloat16)
    rows = jnp.einsum("nsp,npq->nsq", oh_y, P)  # (N,512,32)
    v = jnp.sum(rows * oh_x, axis=2)  # (N,512)
    return (v[:, :256] < v[:, 256:]).astype(jnp.int8)


def _extract(img: jnp.ndarray, cfg: ExtractorConfig = ExtractorConfig()) -> Keypoints:
    """Full ORB extraction on one grayscale image (H,W) float32 in [0,255].

    One jitted program covering what the reference spreads over
    ``ComputePyramid`` + TBB keypoint/descriptor loops
    (ORBextractor.cc:1015-1106).

    Structure (r5, after bisecting the r4 regression): dense stages
    (pyramid / FAST / NMS / selection / subpixel) run PER LEVEL — their cost
    is pixel-proportional and the r4 "flattened pyramid" gathers measured 2x
    slower than this layout on the real device.  Each level then slices its
    keypoints' square patches (contiguous-rows gather, cheap); orientation
    and rotated BRIEF run ONCE over the concatenated (N,d,d) patch stack as
    masked reductions / one-hot MXU matmuls with no image-sized gathers at
    all.
    """
    levels = image_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    xy_parts, resp_parts, valid_parts, sub_parts = [], [], [], []
    icp_parts, brp_parts = [], []
    for l, (lvl_img, n_l) in enumerate(zip(levels, budgets)):
        h, w = lvl_img.shape
        score_raw = fast_ops.fast_with_fallback(lvl_img, cfg.ini_th_fast, cfg.min_th_fast)
        score = fast_ops.nonmax_3x3(score_raw)
        # keep clear of the descriptor border
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inb = (
            (yy >= EDGE_BORDER)
            & (yy < h - EDGE_BORDER)
            & (xx >= EDGE_BORDER)
            & (xx < w - EDGE_BORDER)
        )
        score = jnp.where(inb, score, 0.0)
        score_raw_inb = jnp.where(inb, score_raw, 0.0)  # dense, pre-NMS
        xy, resp, valid = select_keypoints(score, n_l, cfg.cell, cfg.cand_per_cell)
        # clamp invalid/padded selections into the border-safe interior so
        # patch slices below never leave the level
        xq = jnp.clip(xy[:, 0], EDGE_BORDER, w - EDGE_BORDER - 1)
        yq = jnp.clip(xy[:, 1], EDGE_BORDER, h - EDGE_BORDER - 1)
        xyq = jnp.stack([xq, yq], axis=1)
        # subpixel parabola on the DENSE pre-NMS response (the sparse
        # post-NMS fit was the round-1 regression)
        sub_parts.append(subpixel_refine(score_raw_inb, xyq))
        blur = image_ops.gaussian_blur(lvl_img)
        icp_parts.append(extract_patches(lvl_img, xyq, PATCH_RADIUS))
        brp_parts.append(extract_patches(blur, xyq, BRIEF_RADIUS))
        xy_parts.append(xyq)
        resp_parts.append(resp)
        valid_parts.append(valid)

    xy_all = jnp.concatenate(xy_parts)  # (N,2) int32, level-local coords
    resp = jnp.concatenate(resp_parts)
    valid = jnp.concatenate(valid_parts)
    sub = jnp.concatenate(sub_parts)

    # keypoint stages fused over ALL levels' patches (no per-level kernels)
    ang = ic_angles_from_patches(jnp.concatenate(icp_parts))
    desc = brief_from_patches(jnp.concatenate(brp_parts), ang)

    k_scale = jnp.asarray(slot_scales(cfg))  # static host constant
    return Keypoints(
        xy=(xy_all.astype(jnp.float32) + sub) * k_scale[:, None],
        level=jnp.asarray(slot_levels(cfg)),
        angle=ang,
        response=resp,
        desc=desc,
        valid=valid,
    )


extract = partial(jax.jit, static_argnames=("cfg",))(_extract)


@partial(jax.jit, static_argnames=("cfg",))
def extract_batch(imgs: jnp.ndarray, cfg: ExtractorConfig = ExtractorConfig()) -> Keypoints:
    """Batched ORB extraction on (B,H,W) images — ONE program for the whole
    stereo pair instead of two sequential dispatches (the reference runs
    left/right extraction on two std::threads, Frame.cc:200-203; here the
    batch dim doubles every op's parallelism so the VPU/MXU stay fed).
    Returns Keypoints with a leading batch axis on every field.
    """
    return jax.vmap(lambda im: _extract(im, cfg))(imgs)


def split_batch(kp: Keypoints, i: int) -> Keypoints:
    """Slice one image's keypoints out of an ``extract_batch`` result."""
    return Keypoints(*[getattr(kp, f)[i] for f in Keypoints._fields])


BASE_SIGMA = 1.0  # px at level 0 (reference mvLevelSigma2 convention)


def level_sigma2(cfg: ExtractorConfig) -> np.ndarray:
    """Per-level keypoint variance (reference mvLevelSigma2) for chi2 gates.

    sigma=1px at level 0 as in the reference.  NOTE: our detector has no
    subpixel refinement, so residuals of correct associations run ~1.5-2px;
    loosening ALL chi2 gates to match was tried and degraded corridor
    stereo/RGB-D (more marginal associations reach BA) — only the
    new-landmark triangulation gate is loosened instead
    (MapperConfig.tri_chi2_scale)."""
    return (BASE_SIGMA**2 * cfg.scale_factor ** (2.0 * np.arange(cfg.n_levels))).astype(
        np.float32
    )
