"""Lie-group math for the TPU-native SLAM engine.

TPU-first replacement for the reference's header-only Sophus library
(``/root/reference/Thirdparty/Sophus/sophus/{so3,se3,sim3}.hpp``) and the SO3
helpers in ``/root/reference/src/G2oTypes.cc`` (``ExpSO3``/``LogSO3``/
``RightJacobianSO3``/``InverseRightJacobianSO3``) and
``/root/reference/src/ImuTypes.cc:41-104``.

Design notes (idiomatic JAX, not a translation):
  * Everything is a pure function on ``jnp`` arrays; rotations are 3x3
    matrices (MXU-friendly — composing N poses is one batched matmul),
    translations are 3-vectors.  All functions broadcast over leading batch
    dimensions and are safe under ``jit``/``vmap``/``grad``.
  * Small-angle branches use ``jnp.where`` with Taylor expansions on *both*
    branches evaluated (no data-dependent control flow — XLA requirement).
    Care is taken that the untaken branch never produces NaN/Inf (the classic
    ``where`` gradient trap), by clamping denominators away from zero.
  * SE3/Sim3 are named tuples of (R, t[, s]) rather than 4x4 homogeneous
    matrices: keeps the MXU contraction dims tight and avoids wasted lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2: jnp.ndarray):
    """Return (A, B) = (sin t / t, (1-cos t)/t^2) with Taylor fallbacks.

    theta2 is the *squared* angle; both branches are NaN-safe.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    return a, b


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) tangent -> (...,3,3) rotation matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> unit quaternion (...,4) ordered [w, x, y, z].

    Branchless Shepperd extraction: compute all four candidate quaternions
    (each stable in a different region) and select the one whose pivot
    element is largest.  NaN-safe and vmap/grad friendly.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22
    # four pivots: 1+tr, 1+2*rii-tr for i=0,1,2 (all >= 0 for a rotation)
    pw = jnp.maximum(1.0 + tr, 0.0)
    px = jnp.maximum(1.0 + r00 - r11 - r22, 0.0)
    py = jnp.maximum(1.0 - r00 + r11 - r22, 0.0)
    pz = jnp.maximum(1.0 - r00 - r11 + r22, 0.0)
    sw = jnp.sqrt(pw + _EPS)
    sx = jnp.sqrt(px + _EPS)
    sy = jnp.sqrt(py + _EPS)
    sz = jnp.sqrt(pz + _EPS)
    qw = jnp.stack([sw, (r21 - r12) / sw, (r02 - r20) / sw, (r10 - r01) / sw], axis=-1)
    qx = jnp.stack([(r21 - r12) / sx, sx, (r01 + r10) / sx, (r02 + r20) / sx], axis=-1)
    qy = jnp.stack([(r02 - r20) / sy, (r01 + r10) / sy, sy, (r12 + r21) / sy], axis=-1)
    qz = jnp.stack([(r10 - r01) / sz, (r02 + r20) / sz, (r12 + r21) / sz, sz], axis=-1)
    pivots = jnp.stack([pw, px, py, pz], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = 0.5 * q
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> tangent vector, (...,3,3) -> (...,3).

    Robust near identity and near pi via quaternion extraction:
    w = 2 * atan2(|qv|, qw) * qv/|qv|.
    """
    q = rotation_to_quaternion(R)
    qw, qv = q[..., 0], q[..., 1:]
    # NaN-safe norm: d|qv|/dqv at qv=0 would be NaN; the additive tiny keeps
    # the sqrt differentiable and the chain rule kills the gradient cleanly.
    nv = jnp.sqrt(jnp.sum(qv * qv, axis=-1) + 1e-24)
    theta = 2.0 * jnp.arctan2(nv, qw)
    # theta / nv with small-angle fallback (theta ~ 2*nv/qw for small nv)
    small = nv < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.maximum(nv, _EPS))
    return scale[..., None] * qv


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr(w) of SO(3) (reference: ImuTypes.cc:41-63)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    W = hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS * _EPS * _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * W2


def so3_right_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian (reference: ImuTypes.cc:65-83)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    W = hat(w)
    W2 = W @ W
    denom = 2.0 * theta * jnp.sin(theta)  # may be negative for theta > pi
    denom_safe = jnp.where(jnp.abs(denom) < _EPS, jnp.where(denom < 0, -_EPS, _EPS), denom)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.maximum(theta2, _EPS * _EPS)) - (1.0 + jnp.cos(theta)) / denom_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef[..., None, None] * W2


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian Jl(w) = Jr(-w)."""
    return so3_right_jacobian(-w)


def normalize_rotation_np(R):
    """Host-numpy SVD re-orthonormalization.

    CRITICAL numerics note: our SE3 stores a raw 3x3 (the reference's Sophus
    stores a quaternion, normalized by construction).  The tracker's
    velocity-model chain  vel = R_est @ R_last^T;  pred = vel @ R_last
    amplifies any orthonormality defect ~x8 PER FRAME in float32 — measured:
    ||RR^T - I|| goes 1e-7 -> 4e-4 by frame 10 -> 4e-2 by frame 15 -> overflow
    — which silently corrupted pose optimization (reprojection is largely
    scale-invariant, so chi2 inliers stayed high while the pose skewed) and
    collapsed every e2e benchmark around frame 14-18.  Rotations must be
    projected back to SO(3) at every per-frame storage boundary."""
    import numpy as _np

    u, _, vt = _np.linalg.svd(_np.asarray(R, dtype=_np.float64))
    d = _np.sign(_np.linalg.det(u @ vt))
    u[..., :, 2] *= d[..., None] if _np.ndim(d) else d
    return (u @ vt).astype(_np.float32)


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a near-rotation matrix via SVD (ImuTypes.cc:35-39)."""
    u, _, vt = jnp.linalg.svd(R)
    # guard reflection: det(u @ vt) must be +1
    det = jnp.linalg.det(u @ vt)
    fix = jnp.ones_like(u[..., :1, :]).repeat(3, axis=-2)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    return (u * d[..., None, :]) @ vt


class SE3(NamedTuple):
    """Rigid transform: x -> R @ x + t.  Broadcasts over leading dims."""

    R: jnp.ndarray  # (...,3,3)
    t: jnp.ndarray  # (...,3)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        return SE3(self.R @ other.R, jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def matrix(self) -> jnp.ndarray:
        """(...,4,4) homogeneous matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), batch + (1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def identity(dtype=jnp.float32, batch=()) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
        t = jnp.zeros(batch + (3,), dtype=dtype)
        return SE3(R, t)


def se3_exp(xi: jnp.ndarray) -> SE3:
    """se(3) exp; xi = (..., 6) ordered [rho(3), phi(3)] (translation first)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return SE3(R, t)


def se3_log(T: SE3) -> jnp.ndarray:
    phi = so3_log(T.R)
    Vinv = jnp.swapaxes(so3_right_jacobian_inv(-phi), -1, -2)
    # Jl(phi)^-1 = Jr(-phi)^-1 transposed relation: Jl(w) = Jr(w)^T is wrong in
    # general; but Jl(w) = Jr(-w), so Jl^{-1}(w) = Jr^{-1}(-w).
    Vinv = so3_right_jacobian_inv(-phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([rho, phi], axis=-1)


class Sim3(NamedTuple):
    """Similarity transform: x -> s * R @ x + t (reference Sim3Solver / sim3.hpp)."""

    R: jnp.ndarray  # (...,3,3)
    t: jnp.ndarray  # (...,3)
    s: jnp.ndarray  # (...,)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.R @ other.R,
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
            self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t), s_inv)

    @staticmethod
    def identity(dtype=jnp.float32, batch=()) -> "Sim3":
        return Sim3(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
            jnp.zeros(batch + (3,), dtype=dtype),
            jnp.ones(batch, dtype=dtype),
        )

    @staticmethod
    def from_se3(T: SE3, s=None) -> "Sim3":
        scale = jnp.ones(T.t.shape[:-1], dtype=T.t.dtype) if s is None else s
        return Sim3(T.R, T.t, scale)


def _sim3_W_coeffs(theta2: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (C, A, B) of Ws = C*I + A*hat(phi) + B*hat(phi)^2 where
    Ws = integral_0^1 e^{sigma u} R(u phi) du (Strasdat thesis eq. 5.7).

    A = int e^{su} sin(u th) du / th,  B = int e^{su} (1-cos(u th)) du / th^2,
    C = int e^{su} du.  Four numerically separated branches with a float32-
    appropriate switch at tau=0.05: the naive closed form suffers
    catastrophic cancellation (error >> 1) for small angles in f32.
    """
    TAU = 0.05
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small_t = theta < TAU
    small_s = jnp.abs(sigma) < TAU
    th = jnp.where(small_t, TAU, theta)  # safe theta for generic formulas
    sg = jnp.where(small_s, TAU, sigma)  # safe sigma for generic formulas
    s_sg = jnp.exp(sg)

    # C is stable for all sigma via expm1
    sg_any = jnp.where(jnp.abs(sigma) < 1e-12, 1.0, sigma)
    C = jnp.where(jnp.abs(sigma) < 1e-12, 1.0 + sigma / 2.0, jnp.expm1(sigma) / sg_any)

    # branch DD: theta, sigma both small — double Taylor
    s2 = sigma * sigma
    A_dd = 0.5 + sigma / 3.0 + s2 / 8.0 - theta2 / 24.0 - sigma * theta2 / 30.0
    B_dd = 1.0 / 6.0 + sigma / 8.0 + s2 / 20.0 - theta2 / 120.0 - sigma * theta2 / 144.0

    # branch TS: theta small, sigma large — theta-Taylor, exact sigma
    # En = int_0^1 u^n e^{sigma u} du (closed forms)
    E1 = (s_sg * (sg - 1.0) + 1.0) / sg**2
    E2 = (s_sg * (sg * sg - 2.0 * sg + 2.0) - 2.0) / sg**3
    E3 = (s_sg * (sg**3 - 3.0 * sg**2 + 6.0 * sg - 6.0) + 6.0) / sg**4
    E4 = (s_sg * (sg**4 - 4.0 * sg**3 + 12.0 * sg**2 - 24.0 * sg + 24.0) - 24.0) / sg**5
    A_ts = E1 - theta2 / 6.0 * E3
    B_ts = E2 / 2.0 - theta2 / 24.0 * E4

    # branch ST: theta large, sigma small — sigma-series, exact theta
    sinth, costh = jnp.sin(th), jnp.cos(th)
    I0s = (1.0 - costh) / th  # int sin(u th) du
    I1s = (sinth - th * costh) / th**2  # int u sin
    I2s = (2.0 * th * sinth + (2.0 - th * th) * costh - 2.0) / th**3  # int u^2 sin
    I0c = 1.0 - sinth / th  # int (1 - cos)
    I1c = 0.5 - (costh + th * sinth - 1.0) / th**2
    I2c = 1.0 / 3.0 - ((th * th - 2.0) * sinth + 2.0 * th * costh) / th**3
    A_st = (I0s + sigma * I1s + 0.5 * s2 * I2s) / th
    B_st = (I0c + sigma * I1c + 0.5 * s2 * I2c) / (th * th)

    # branch GG: both large — classic closed form (Sophus sim3.hpp calc_W)
    a_ = s_sg * sinth
    b_ = s_sg * costh
    cden = sg * sg + th * th
    C_g = (s_sg - 1.0) / sg
    A_gg = (a_ * sg + (1.0 - b_) * th) / (th * cden)
    B_gg = (C_g - ((b_ - 1.0) * sg + a_ * th) / cden) / (th * th)

    A = jnp.where(small_t, jnp.where(small_s, A_dd, A_ts), jnp.where(small_s, A_st, A_gg))
    B = jnp.where(small_t, jnp.where(small_s, B_dd, B_ts), jnp.where(small_s, B_st, B_gg))
    return C, A, B


def sim3_exp(xi: jnp.ndarray) -> Sim3:
    """sim(3) exp; xi = (...,7) ordered [rho(3), phi(3), sigma(1)]."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    C, A, B = _sim3_W_coeffs(theta2, sigma)
    Ws = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Ws, rho)
    return Sim3(R, t, s)


def sim3_log(S: Sim3) -> jnp.ndarray:
    """Inverse of :func:`sim3_exp`: rebuild Ws and solve Ws rho = t."""
    phi = so3_log(S.R)
    sigma = jnp.log(S.s)
    theta2 = jnp.sum(phi * phi, axis=-1)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    C, A, B = _sim3_W_coeffs(theta2, sigma)
    Ws = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
    rho = jnp.linalg.solve(Ws, S.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
