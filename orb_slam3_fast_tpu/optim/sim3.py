"""Sim3 estimation between two keyframes: Horn closed form, batched RANSAC,
and LM refinement.

TPU-native replacement for the reference's ``Sim3Solver``
(``/root/reference/src/Sim3Solver.cc``: 3-point Horn ``ComputeSim3`` inside a
sequential ``iterate`` RANSAC with two-image reprojection inlier checks) and
``Optimizer::OptimizeSim3`` (``/root/reference/src/Optimizer.cc:2164-2425``:
one ``VertexSim3Expmap`` with paired forward/inverse projection edges, Huber
delta = sqrt(10), inlier reclassification mid-way).

Here all RANSAC hypotheses are solved & scored in one jitted program
(3-point Horn is a tiny closed form — vmap over hypotheses), and the LM
refinement is a fixed-iteration Gauss-Newton on the 7-dof tangent with
IRLS Huber weights and a mid-way chi2 re-gate, mirroring the reference's
"optimize 5, drop outliers, optimize 10 more" schedule (Optimizer.cc:2340-2400).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.utils import lie

CHI2_SIM3 = 9.210  # Sim3Solver.cc mvnMaxError scale (2-DoF 99%)
HUBER_SIM3 = jnp.sqrt(10.0)  # Optimizer.cc:2208 deltaHuber


def horn_sim3(x: jnp.ndarray, y: jnp.ndarray, fix_scale: bool = False) -> lie.Sim3:
    """Closed-form similarity y = s R x + t from paired points (N>=3).

    Horn's method (Sim3Solver::ComputeSim3, Sim3Solver.cc:319-404), with the
    quaternion eigen-problem replaced by the SVD orthogonal-Procrustes form.
    ``fix_scale=True`` pins s=1 (stereo/RGB-D loop closing, SetRansacParameters
    ``bFixScale``).
    """
    mx = x.mean(0)
    my = y.mean(0)
    xc = x - mx
    yc = y - my
    M = yc.T @ xc
    u, _, vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    R = (u.at[:, 2].multiply(d)) @ vt
    # symmetric scale (Horn eq. 40): s = sqrt(sum|yc|^2 / sum|xc|^2)
    s = jnp.sqrt(jnp.sum(yc * yc) / jnp.maximum(jnp.sum(xc * xc), 1e-12))
    s = jnp.where(fix_scale, 1.0, s)
    t = my - s * (R @ mx)
    return lie.Sim3(R, t, s)


class Sim3Result(NamedTuple):
    S12: lie.Sim3  # maps KF2-camera coords -> KF1-camera coords
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    cam1: cam_models.Camera,
    cam2: cam_models.Camera,
    xc1: jnp.ndarray,
    xc2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    key,
    n_hyp: int = 128,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Sim3Result:
    """Batched 3-point Sim3 RANSAC between two keyframes.

    Inputs are the matched landmark pairs expressed in each KF's CAMERA frame
    (the reference precomputes mvX3Dc1/mvX3Dc2, Sim3Solver.cc:66-115) plus
    their pixel observations for the two-image inlier check
    (``CheckInliers``, Sim3Solver.cc:406-440).
    """
    n = xc1.shape[0]
    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)  # (H,3) distinct valid rows

    def solve(sub):
        S = horn_sim3(xc2[sub], xc1[sub], fix_scale=fix_scale)
        return S

    S_h = jax.vmap(solve)(idx)  # batched Sim3 (H,...)
    S_b = lie.Sim3(S_h.R[:, None], S_h.t[:, None], S_h.s[:, None])  # (H,1,...)

    # two-sided reprojection check for every hypothesis x point
    x2_in_1 = S_b.apply(xc2[None, :, :])  # (H,N,3)
    x1_in_2 = S_b.inverse().apply(xc1[None, :, :])
    p1 = cam_models.project(cam1, x2_in_1)
    p2 = cam_models.project(cam2, x1_in_2)
    e1 = jnp.sum((p1 - uv1[None]) ** 2, -1) * inv_sigma2_1[None]
    e2 = jnp.sum((p2 - uv2[None]) ** 2, -1) * inv_sigma2_2[None]
    inl = (e1 < CHI2_SIM3) & (e2 < CHI2_SIM3) & valid[None]
    inl &= (x2_in_1[..., 2] > 0) & (x1_in_2[..., 2] > 0)
    scores = inl.sum(1)
    best = jnp.argmax(scores)
    S_best = lie.Sim3(S_h.R[best], S_h.t[best], S_h.s[best])
    finite = (
        jnp.all(jnp.isfinite(S_best.R))
        & jnp.all(jnp.isfinite(S_best.t))
        & jnp.isfinite(S_best.s)
        & (S_best.s > 1e-3)
        & (S_best.s < 1e3)
    )
    return Sim3Result(S_best, inl[best], scores[best], (scores[best] >= min_inliers) & finite)


# ---------------------------------------------------------------------------
# OptimizeSim3 (LM on the 7-dof tangent, IRLS Huber)
# ---------------------------------------------------------------------------


def _sim3_residuals(cam1, cam2, S12: lie.Sim3, xc1, xc2, uv1, uv2):
    """Paired forward/inverse reprojection residuals (EdgeSim3ProjectXYZ /
    EdgeInverseSim3ProjectXYZ, OptimizableTypes.h:192-240)."""
    x2_in_1 = S12.apply(xc2)
    x1_in_2 = S12.inverse().apply(xc1)
    r1 = cam_models.project(cam1, x2_in_1) - uv1
    r2 = cam_models.project(cam2, x1_in_2) - uv2
    return r1, r2, x2_in_1[..., 2], x1_in_2[..., 2]


@partial(jax.jit, static_argnames=("fix_scale", "iters"))
def optimize_sim3(
    cam1: cam_models.Camera,
    cam2: cam_models.Camera,
    S0: lie.Sim3,
    xc1: jnp.ndarray,
    xc2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fix_scale: bool = False,
    iters: int = 15,
    chi2_th: float = 9.210,
):
    """Gauss-Newton refinement of S12 with Huber IRLS and a mid-way outlier
    re-gate (Optimizer::OptimizeSim3 semantics: 5 iters, drop chi2>th2, 10
    more; :2340-2400).  Returns (S12, inliers, n_inliers)."""
    half = iters // 3

    def gate(S, mask):
        r1, r2, z1, z2 = _sim3_residuals(cam1, cam2, S, xc1, xc2, uv1, uv2)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        return mask & (c1 < chi2_th) & (c2 < chi2_th) & (z1 > 0) & (z2 > 0)

    def gn_step(S, mask):
        def res_of(xi):
            Sx = lie.sim3_exp(xi).compose(S)
            r1, r2, _, _ = _sim3_residuals(cam1, cam2, Sx, xc1, xc2, uv1, uv2)
            return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

        zero = jnp.zeros(7)
        r = res_of(zero)
        J = jax.jacfwd(res_of)(zero)  # (4N, 7)
        # per-residual weights: info * huber * validity
        r1n = jnp.sqrt(jnp.sum(r[: xc1.shape[0] * 2].reshape(-1, 2) ** 2, -1) * inv_sigma2_1)
        r2n = jnp.sqrt(jnp.sum(r[xc1.shape[0] * 2 :].reshape(-1, 2) ** 2, -1) * inv_sigma2_2)
        w1 = jnp.minimum(1.0, HUBER_SIM3 / jnp.maximum(r1n, 1e-9)) * inv_sigma2_1 * mask
        w2 = jnp.minimum(1.0, HUBER_SIM3 / jnp.maximum(r2n, 1e-9)) * inv_sigma2_2 * mask
        w = jnp.concatenate([jnp.repeat(w1, 2), jnp.repeat(w2, 2)])
        H = (J * w[:, None]).T @ J
        b = (J * w[:, None]).T @ r
        if fix_scale:
            # zero out the scale DOF (VertexSim3Expmap _fix_scale)
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-6 * jnp.eye(7)
        dx = -jnp.linalg.solve(H, b)
        Sn = lie.sim3_exp(dx).compose(S)
        return lie.Sim3(lie.normalize_rotation(Sn.R), Sn.t, Sn.s)

    mask = valid
    S = S0
    S = jax.lax.fori_loop(0, half, lambda _, s: gn_step(s, mask), S)
    mask = gate(S, mask)
    S = jax.lax.fori_loop(0, iters - half, lambda _, s: gn_step(s, mask), S)
    inl = gate(S, mask)
    return S, inl, inl.sum()
