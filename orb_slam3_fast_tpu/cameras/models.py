"""Camera models: pin-hole (+ radial-tangential distortion) and Kannala-Brandt fisheye.

TPU-native replacement for the reference's polymorphic ``GeometricCamera``
hierarchy (``/root/reference/include/CameraModels/GeometricCamera.h:43-96``,
``src/CameraModels/Pinhole.cpp``, ``src/CameraModels/KannalaBrandt8.cpp``).

Instead of virtual dispatch we use a tiny pytree ``Camera`` carrying a static
``kind`` (resolved at trace time — each sequence has a fixed camera model, so
there is no runtime dispatch to pay for) and a parameter vector.  All
functions broadcast over leading batch dims and are jit/vmap/grad-safe.

Parameter layout (``params``):
  * PINHOLE: ``[fx, fy, cx, cy, k1, k2, p1, p2, k3]`` (distortion optional,
    zeros = pre-rectified; reference "Rectified"/"PinHole" types,
    Settings.h:48).
  * KB8 fisheye: ``[fx, fy, cx, cy, k1, k2, k3, k4]`` — equidistant
    polynomial d(theta) = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9
    (reference KannalaBrandt8.cpp:31-95).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PINHOLE = "pinhole"
KB8 = "kb8"

_EPS = 1e-9


class Camera(NamedTuple):
    """Static-kind camera. ``kind`` is a Python string (not traced)."""

    kind: str
    params: jnp.ndarray  # (P,) float32

    @staticmethod
    def pinhole(fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0, 0.0)) -> "Camera":
        d = tuple(dist) + (0.0,) * (5 - len(dist))
        return Camera(PINHOLE, jnp.asarray([fx, fy, cx, cy, *d], dtype=jnp.float32))

    @staticmethod
    def kb8(fx, fy, cx, cy, k1, k2, k3, k4) -> "Camera":
        return Camera(KB8, jnp.asarray([fx, fy, cx, cy, k1, k2, k3, k4], dtype=jnp.float32))

    @property
    def fx(self):
        return self.params[0]

    @property
    def fy(self):
        return self.params[1]

    @property
    def cx(self):
        return self.params[2]

    @property
    def cy(self):
        return self.params[3]

    def K(self) -> jnp.ndarray:
        fx, fy, cx, cy = self.params[0], self.params[1], self.params[2], self.params[3]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx]),
                jnp.stack([z, fy, cy]),
                jnp.stack([z, z, o]),
            ]
        )


# `kind` is metadata (static), `params` is the traced leaf.
jax.tree_util.register_pytree_node(
    Camera,
    lambda c: ((c.params,), c.kind),
    lambda kind, leaves: Camera(kind, leaves[0]),
)


def _distort_radtan(params, xn):
    """Apply rad-tan distortion to normalized coords xn=(...,2)."""
    k1, k2, p1, p2, k3 = (params[4], params[5], params[6], params[7], params[8])
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(cam: Camera, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3-D point(s) (...,3) -> pixel coords (...,2).

    Mirrors ``Pinhole::project`` (Pinhole.cpp:31-44) and
    ``KannalaBrandt8::project`` (KannalaBrandt8.cpp:31-60).
    """
    p = cam.params
    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    if cam.kind == PINHOLE:
        z = xc[..., 2]
        z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
        xn = xc[..., :2] / z_safe[..., None]
        xd = _distort_radtan(p, xn)
        return jnp.stack([fx * xd[..., 0] + cx, fy * xd[..., 1] + cy], axis=-1)
    elif cam.kind == KB8:
        k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
        x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
        r2 = x * x + y * y
        r = jnp.sqrt(r2 + _EPS * _EPS)
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = d / r
        return jnp.stack([fx * scale * x + cx, fy * scale * y + cy], axis=-1)
    raise ValueError(f"unknown camera kind {cam.kind}")


def project_jac(cam: Camera, xc: jnp.ndarray) -> jnp.ndarray:
    """Jacobian d(uv)/d(xc): (...,3) -> (...,2,3).

    Reference: ``Pinhole::projectJac`` (Pinhole.cpp:64-77),
    ``KannalaBrandt8::projectJac`` (KannalaBrandt8.cpp:186-227).  Here we use
    AD (jacfwd under vmap) — XLA fuses it into closed form.
    """
    flat = xc.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(lambda v: project(cam, v)))(flat)
    return J.reshape(xc.shape[:-1] + (2, 3))


def unproject(cam: Camera, uv: jnp.ndarray, newton_iters: int = 10) -> jnp.ndarray:
    """Pixel coords (...,2) -> unit-z normalized ray (...,3) [x/z, y/z, 1].

    Pinhole: iterative rad-tan undistortion (compensates cv::undistortPoints,
    Frame.cc:853 UndistortKeyPoints).  KB8: Newton on the distortion
    polynomial (KannalaBrandt8.cpp:116-148), fixed iteration count so the
    loop is unrollable/compilable.
    """
    p = cam.params
    fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    if cam.kind == PINHOLE:
        has_dist = jnp.any(jnp.abs(p[4:]) > 0)
        xd = jnp.stack([mx, my], axis=-1)

        def undistort_step(_, xn):
            # fixed-point: xn <- xd - (distort(xn) - xn)
            return xd - (_distort_radtan(p, xn) - xn)

        xn = jax.lax.fori_loop(0, newton_iters, undistort_step, xd)
        xn = jnp.where(has_dist, xn, xd)
        return jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    elif cam.kind == KB8:
        k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
        d = jnp.sqrt(mx * mx + my * my)  # = distorted radius = d(theta)
        d = jnp.clip(d, 0.0, jnp.pi)  # reference clips to pi/2 on wp; keep wide FoV

        def newton_step(_, theta):
            t2 = theta * theta
            poly = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
            dpoly = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
            return theta - (poly - d) / jnp.where(jnp.abs(dpoly) < _EPS, _EPS, dpoly)

        theta = jax.lax.fori_loop(0, newton_iters, newton_step, d)
        scale = jnp.where(d < _EPS, 1.0, jnp.tan(theta) / jnp.maximum(d, _EPS))
        return jnp.concatenate(
            [(mx * scale)[..., None], (my * scale)[..., None], jnp.ones_like(mx)[..., None]],
            axis=-1,
        )
    raise ValueError(f"unknown camera kind {cam.kind}")


def unproject_bearing(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> unit-norm bearing vector (for MLPnP-style solvers)."""
    ray = unproject(cam, uv)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def stereo_project(cam: Camera, xc: jnp.ndarray, bf: jnp.ndarray) -> jnp.ndarray:
    """Rectified-stereo projection (u_l, v_l, u_r) with u_r = u_l - bf/z.

    Matches the reference's 3-D stereo observation used by EdgeStereo
    (G2oTypes.h:380-420): bf = baseline * fx.
    """
    uv = project(cam, xc)
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    ur = uv[..., 0] - bf / z_safe
    return jnp.concatenate([uv, ur[..., None]], axis=-1)
