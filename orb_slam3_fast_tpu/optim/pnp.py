"""Batched PnP RANSAC for relocalization.

TPU-native replacement for the reference's ``MLPnPsolver``
(``/root/reference/src/MLPnPsolver.cpp``): Urban et al.'s
maximum-likelihood PnP with a sequential RANSAC loop (min set 6,
``iterate`` h:79-84, chi2 = 5.991) becomes **hypothesis-parallel** DLT-PnP:
all ``n_hyp`` minimal 6-point subsets are sampled, solved (one vmapped
12x12 SVD each), and scored in a single jitted program — the batched-
hypothesis RANSAC pattern from SURVEY.md §7 ("evaluate all hypotheses in
parallel instead of early-exit").  Like the reference, the solver works on
camera-model-free rays (bearings via ``unproject``), so pinhole and fisheye
share the code path; the winning pose is refined by the LM pose optimizer
(the reference refines with ``PoseOptimization``, Tracking.cc:3604).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.utils import lie

CHI2_MONO = 5.991  # MLPnPsolver.h RansacParameters th2 (2-DoF 95%)
MIN_SET = 6


class PnPResult(NamedTuple):
    R: jnp.ndarray  # (3,3) T_cw rotation
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _procrustes(M: jnp.ndarray):
    """Closest proper rotation to M (orthogonal Procrustes with det fix)."""
    u, s, vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    R = (u * jnp.array([1.0, 1.0, 1.0])[None, :]).at[:, 2].multiply(d) @ vt
    return R, s.mean()


def _solve_dlt(xw: jnp.ndarray, xn: jnp.ndarray):
    """6-point DLT for P = [R|t] mapping world -> normalized image plane.

    xw: (6,3) world points, xn: (6,2) normalized coords (x/z, y/z).
    The homogeneous solution has a global sign ambiguity; both sign
    candidates are returned as separate pose hypotheses (the subsequent
    all-points scoring resolves cheirality, so no branching here).
    """
    X = jnp.concatenate([xw, jnp.ones((MIN_SET, 1))], axis=1)  # (6,4)
    z = jnp.zeros((MIN_SET, 4))
    # rows: [X 0 -x*X ; 0 X -y*X]
    r1 = jnp.concatenate([X, z, -xn[:, 0:1] * X], axis=1)
    r2 = jnp.concatenate([z, X, -xn[:, 1:2] * X], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (12,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    p = vt[-1].reshape(3, 4)

    def decomp(P):
        R, scale = _procrustes(P[:, :3])
        t = P[:, 3] / jnp.maximum(scale, 1e-12)
        return R, t

    R1, t1 = decomp(p)
    R2, t2 = decomp(-p)
    return jnp.stack([R1, R2]), jnp.stack([t1, t2])


def _refine_gn(R, t, xw, xn, iters: int = 4):
    """Gauss-Newton refinement of a pose hypothesis on its own sample points
    (the MLPnP solver's internal ``mlpnp_gn``, MLPnPsolver.h:169-178):
    minimizes normalized-plane reprojection, se3 left-increment updates."""

    def residual(xi, R, t):
        dR = lie.so3_exp(xi[:3])
        Rn = dR @ R
        tn = dR @ t + xi[3:]
        xc = xw @ Rn.T + tn
        z = jnp.where(jnp.abs(xc[:, 2]) < 1e-6, 1e-6, xc[:, 2])
        return (xc[:, :2] / z[:, None] - xn).reshape(-1)

    def step(_, Rt):
        R, t = Rt
        zero = jnp.zeros(6)
        r = residual(zero, R, t)
        J = jax.jacfwd(residual)(zero, R, t)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(H, J.T @ r)
        dR = lie.so3_exp(dx[:3])
        return (lie.normalize_rotation(dR @ R), dR @ t + dx[3:])

    R, t = jax.lax.fori_loop(0, iters, step, (R, t))
    return R, t


def _sample_subsets(key, valid, n_hyp):
    """(n_hyp, MIN_SET) indices of valid points (Gumbel top-k, no replacement)."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, MIN_SET)
    return idx


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(
    cam: cam_models.Camera,
    xw: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    key,
    n_hyp: int = 256,
    min_inliers: int = 15,
) -> PnPResult:
    """All-hypotheses-parallel PnP RANSAC.

    xw (N,3) world points, uv (N,2) observed pixels, inv_sigma2 (N,) per-point
    information (1/mvLevelSigma2[octave], the reference's RANSAC scaling,
    MLPnPsolver.cpp SetRansacParameters), valid (N,) candidate mask.
    """
    n = xw.shape[0]
    xn_all = cam_models.unproject(cam, uv)[:, :2]
    idx = _sample_subsets(key, valid, n_hyp)  # (H,6)

    # Hartley-style conditioning: DLT on centered/scaled world coordinates
    # (the minimal 6-pt system is ill-conditioned in metric coords).
    ctr = jnp.sum(jnp.where(valid[:, None], xw, 0.0), 0) / jnp.maximum(valid.sum(), 1)
    spread = jnp.sqrt(
        jnp.sum(jnp.where(valid, jnp.sum((xw - ctr) ** 2, -1), 0.0)) / jnp.maximum(valid.sum(), 1)
    )
    spread = jnp.maximum(spread, 1e-6)
    xw_n = (xw - ctr) / spread

    def solve_one(sub):
        Rs, ts = _solve_dlt(xw_n[sub], xn_all[sub])  # (2,3,3), (2,3)
        # undo conditioning: x_c = R((x-ctr)/spread)+t  =>  t_metric = t*spread? no:
        # with x_n=(x-ctr)/s, xc ~ R x_n + t (up to the projective scale the
        # DLT fixes); metric pose: R_m = R, t_m = s*t - R ctr ... derived from
        # R((x-ctr)/s)+t == (1/s)(R x + (s t - R ctr)); projective scale 1/s
        # drops out of the normalized-plane projection.
        t_m = spread * ts - (Rs @ ctr)
        Rr, tr = jax.vmap(lambda R, t: _refine_gn(R, t, xw[sub], xn_all[sub]))(Rs, t_m)
        return Rr, tr

    Rs, ts = jax.vmap(solve_one)(idx)  # (H,2,3,3), (H,2,3) — both sign candidates
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)

    # score every hypothesis against every point: (H,N) reprojection chi2
    xc = jnp.einsum("hij,nj->hni", Rs, xw) + ts[:, None, :]
    proj = cam_models.project(cam, xc)
    err2 = jnp.sum((proj - uv[None, :, :]) ** 2, axis=-1) * inv_sigma2[None, :]
    front = xc[..., 2] > 0.0
    inl = (err2 < CHI2_MONO) & front & valid[None, :]
    scores = inl.sum(axis=1)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]
    inliers = inl[best]
    n_inl = scores[best]
    finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    return PnPResult(R, t, inliers, n_inl, (n_inl >= min_inliers) & finite)
