"""FAST-16 corner detection, whole-image and branchless.

TPU-native replacement for ``cv::FAST`` as used by the reference extractor
(``/root/reference/src/ORBextractor.cc:810-825``: per-cell FAST at
``iniThFAST=20`` falling back to ``minThFAST=7``).  Instead of per-cell
scalar loops (the fork's TBB rows x cols grid), the segment test runs over
the full image as 16 shifted comparisons + a bit-trick run-length check —
pure VPU work with zero data-dependent control flow.

Corner test: pixel p is a corner if >= 9 contiguous pixels on the radius-3
Bresenham circle are all brighter than p + t or all darker than p - t.
Contiguity of 9 on a 16-bit circular mask is computed with log-step AND-shift
reductions on a doubled 32-bit mask.

Score: sum of |I_k - I_p| - t over the qualifying arc's polarity (the
standard SAD corner score used by most GPU FAST implementations); used only
for non-max suppression and keypoint ranking, so exact parity with OpenCV's
arc-min score is not required (accuracy gate is ATE, SURVEY.md §7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# radius-3 Bresenham circle, clockwise from 12 o'clock (dy, dx); matches the
# standard FAST-16 layout.
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift image so that out[y,x] = img[y+dy, x+dx] (zero border)."""
    h, w = img.shape
    out = img
    out = jnp.roll(out, (-dy, -dx), axis=(0, 1))
    return out


def _has_run9(mask16: jnp.ndarray) -> jnp.ndarray:
    """mask16: int32 array of 16-bit circle masks -> bool, has a circular run
    of >= 9 set bits.  Log-step AND-shift on the doubled mask."""
    m = mask16 | (mask16 << 16)  # doubled for circular wrap
    r = m & (m >> 1)  # runs >= 2
    r = r & (r >> 2)  # runs >= 4
    r = r & (r >> 4)  # runs >= 8
    r = r & (m >> 8)  # runs >= 9
    return (r & 0xFFFF) != 0


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST corner response.  (H,W) float image -> (H,W) float score,
    zero where the segment test fails.  Border of 3 px is always zero."""
    return fast_score_maps(img, (threshold,))[0]


def fast_score_maps(img: jnp.ndarray, thresholds: tuple) -> list[jnp.ndarray]:
    """FAST responses at SEVERAL thresholds from ONE set of 16 shifted reads.

    The reference runs cv::FAST twice per cell (iniThFAST then minThFAST,
    ORBextractor.cc:810-825); sharing the shifted-diff pass between the two
    thresholds halves the dominant VPU/HBM work of detection.
    """
    h, w = img.shape
    n_th = len(thresholds)
    bright_mask = [jnp.zeros((h, w), dtype=jnp.int32) for _ in range(n_th)]
    dark_mask = [jnp.zeros((h, w), dtype=jnp.int32) for _ in range(n_th)]
    bright_sum = [jnp.zeros((h, w), dtype=img.dtype) for _ in range(n_th)]
    dark_sum = [jnp.zeros((h, w), dtype=img.dtype) for _ in range(n_th)]
    for k in range(16):
        dy, dx = int(CIRCLE[k, 0]), int(CIRCLE[k, 1])
        diff = _shift2d(img, dy, dx) - img
        for i, t in enumerate(thresholds):
            b = diff > t
            d = diff < -t
            bright_mask[i] = bright_mask[i] | (b.astype(jnp.int32) << k)
            dark_mask[i] = dark_mask[i] | (d.astype(jnp.int32) << k)
            bright_sum[i] = bright_sum[i] + jnp.where(b, diff - t, 0.0)
            dark_sum[i] = dark_sum[i] + jnp.where(d, -diff - t, 0.0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    out = []
    for i in range(n_th):
        score = jnp.where(_has_run9(bright_mask[i]), bright_sum[i], 0.0) + jnp.where(
            _has_run9(dark_mask[i]), dark_sum[i], 0.0
        )
        # kill the 3px border (circle reads wrap garbage there)
        out.append(jnp.where(inb, score, 0.0))
    return out


def nonmax_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep score only at strict local maxima."""
    h, w = score.shape
    neigh = jnp.full((h, w), -jnp.inf, dtype=score.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, _shift2d(score, dy, dx))
    return jnp.where(score > neigh, score, 0.0)


def fast_with_fallback(img: jnp.ndarray, ini_th: float, min_th: float) -> jnp.ndarray:
    """Reference behavior: detect at ini_th; *in image cells where nothing
    fires*, fall back to min_th (ORBextractor.cc:810-825, 35px cells).

    Here the fallback is decided per 32x32 cell on the dense response: cells
    with at least one ini_th corner keep only those; empty cells use the
    min_th response.  Fully vectorized via cell-max broadcasting.
    """
    s_hi, s_lo = fast_score_maps(img, (ini_th, min_th))
    h, w = img.shape
    c = 32
    ph, pw = (-h) % c, (-w) % c
    hi_pad = jnp.pad(s_hi, ((0, ph), (0, pw)))
    gh, gw = (h + ph) // c, (w + pw) // c
    cell_has_hi = hi_pad.reshape(gh, c, gw, c).max(axis=(1, 3)) > 0
    cell_mask = jnp.repeat(jnp.repeat(cell_has_hi, c, axis=0), c, axis=1)[:h, :w]
    return jnp.where(cell_mask, s_hi, s_lo)
