"""Image primitives: pyramid, separable Gaussian blur, bilinear resize.

TPU-native replacement for the reference's OpenCV image ops
(``ORBextractor::ComputePyramid``, ``/root/reference/src/ORBextractor.cc:1108``;
``cv::GaussianBlur(…, Size(7,7), 2, 2)`` at ORBextractor.cc:1069).

All shapes are static: the pyramid is a Python list of per-level arrays whose
sizes are computed at trace time from the input shape and scale factor, so a
single jit covers the whole chain.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur on a single-channel (H,W) image, SAME border
    (reflect padding to approximate OpenCV's BORDER_REFLECT_101)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    # vertical pass: sum of shifted rows (unrolled small conv — XLA fuses)
    v = jnp.zeros_like(img)
    for i in range(ksize):
        v = v + k[i] * jax.lax.dynamic_slice_in_dim(x, i, img.shape[0], axis=0)
    x = jnp.pad(v, ((0, 0), (r, r)), mode="reflect")
    h = jnp.zeros_like(img)
    for i in range(ksize):
        h = h + k[i] * jax.lax.dynamic_slice_in_dim(x, i, img.shape[1], axis=1)
    return h


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (H,W) -> out_hw, matching cv::resize INTER_LINEAR
    semantics (half-pixel centers)."""
    return jax.image.resize(img, out_hw, method="linear", antialias=False)


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> list[tuple[int, int]]:
    shapes = []
    for l in range(n_levels):
        s = 1.0 / (scale_factor**l)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2
) -> list[jnp.ndarray]:
    """Compute the scale pyramid.  Level 0 is the input image.

    The reference resizes each level from the previous (ORBextractor.cc:1108);
    chained bilinear introduces accumulation blur similar to OpenCV's — we
    mirror the chain for parity of detector behavior.
    """
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return levels
