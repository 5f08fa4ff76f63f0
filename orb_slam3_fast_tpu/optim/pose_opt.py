"""Pose-only optimization (motion-only BA) with chi2 outlier reclassification.

TPU-native replacement for ``Optimizer::PoseOptimization``
(``/root/reference/src/Optimizer.cc:781-1107``): a single SE3 vertex with
unary mono/stereo reprojection edges, Huber kernels (delta = sqrt(5.991)
mono, sqrt(7.815) stereo), optimized in 4 rounds of 10 LM iterations with
chi2-based inlier/outlier reclassification between rounds
(Optimizer.cc:984-1094).

Idiomatic-JAX design: all edges are evaluated batched (vmap-free einsums),
the LM loop is a ``lax.fori_loop`` with branchless accept/reject damping, and
outlier masks are boolean weights instead of g2o "level 1" edge banishment —
one jitted program, zero host round-trips.

Pose convention: ``T_cw`` maps world -> camera; the update is left
multiplication ``T_cw <- exp(xi) * T_cw`` (g2o SE3 expmap convention).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.utils import lie

CHI2_MONO = 5.991  # Optimizer.cc:858 (2-DoF 95%)
CHI2_STEREO = 7.815  # Optimizer.cc:863 (3-DoF 95%)


class PoseObs(NamedTuple):
    """Batched unary reprojection edges for one frame (fixed capacity N)."""

    xw: jnp.ndarray  # (N,3) landmark world positions
    uv: jnp.ndarray  # (N,3) observed [u, v, u_r]; u_r = -1 for mono edges
    inv_sigma2: jnp.ndarray  # (N,) information scale (1/mvLevelSigma2[octave])
    is_stereo: jnp.ndarray  # (N,) bool
    valid: jnp.ndarray  # (N,) bool


def _residuals(cam, bf, T: lie.SE3, obs: PoseObs):
    """(N,3) residuals [du, dv, dur]; mono edges get dur=0."""
    xc = T.apply(obs.xw)
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = obs.uv - uvr
    r = r.at[:, 2].set(jnp.where(obs.is_stereo, r[:, 2], 0.0))
    # behind-camera points are invalid for this iteration
    pos_depth = xc[:, 2] > 0.05
    return r, xc, pos_depth


def _chi2(r: jnp.ndarray, inv_sigma2: jnp.ndarray, is_stereo: jnp.ndarray):
    return jnp.sum(r * r, axis=-1) * inv_sigma2


def _huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel: 1 inside, delta/|r| outside."""
    w = jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    return w


def _build_normal_eqs(cam, bf, T: lie.SE3, obs: PoseObs, inlier: jnp.ndarray):
    r, xc, pos_depth = _residuals(cam, bf, T, obs)
    active = obs.valid & inlier & pos_depth
    chi2 = _chi2(r, obs.inv_sigma2, obs.is_stereo)
    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
    w_huber = _huber_weight(chi2, delta2)
    w = jnp.where(active, w_huber * obs.inv_sigma2, 0.0)

    # d(uvr)/d(xc): (N,3,3)   [stereo row = du/dxc - bf/z^2 dz... handled by AD]
    Jproj = jax.vmap(jax.jacfwd(lambda x: cam_models.stereo_project(cam, x, bf)))(xc)
    Jproj = jnp.where(obs.is_stereo[:, None, None], Jproj, Jproj.at[:, 2, :].set(0.0))
    # d(xc)/d(xi) with xi=[rho,phi], left-mult update: [I | -hat(xc)]
    dxc = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (xc.shape[0], 3, 3)), -lie.hat(xc)], axis=-1
    )  # (N,3,6)
    J = -jnp.einsum("nij,njk->nik", Jproj, dxc)  # (N,3,6) d r / d xi
    H = jnp.einsum("nij,n,nik->jk", J, w, J)  # (6,6)
    g = -jnp.einsum("nij,n,ni->j", J, w, r)  # (6,)  (gradient of 0.5 w r^2)
    cost = jnp.sum(jnp.where(active, w_huber * chi2, 0.0))
    return H, g, cost, chi2, active


def _lm_rounds(cam, bf, T0: lie.SE3, obs: PoseObs, n_rounds: int, iters_per_round: int):
    inlier = jnp.ones(obs.uv.shape[0], dtype=bool)
    T = T0

    def lm_iter(carry, _):
        T, lam = carry
        H, g, cost, _, _ = _build_normal_eqs(cam, bf, T, obs, inlier_ref[0])
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        dx = jnp.linalg.solve(Hd, g)
        T_new = lie.se3_exp(dx).compose(T)
        _, _, cost_new, _, _ = _build_normal_eqs(cam, bf, T_new, obs, inlier_ref[0])
        accept = cost_new < cost
        T = lie.SE3(
            jnp.where(accept, T_new.R, T.R), jnp.where(accept, T_new.t, T.t)
        )
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e4))
        return (T, lam), None

    # NOTE: we close over a one-element list so each round's python loop sees
    # the updated inlier mask while staying inside one trace.
    inlier_ref = [inlier]
    for _ in range(n_rounds):
        (T, _), _ = jax.lax.scan(lm_iter, (T, jnp.float32(1e-2)), None, length=iters_per_round)
        # reclassify: chi2 at current pose (reference Optimizer.cc:1009-1090)
        r, xc, pos_depth = _residuals(cam, bf, T, obs)
        chi2 = _chi2(r, obs.inv_sigma2, obs.is_stereo)
        delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier_ref[0] = obs.valid & (chi2 <= delta2) & pos_depth
    return T, inlier_ref[0]


@partial(jax.jit, static_argnames=("n_rounds", "iters_per_round"))
def pose_optimization(
    cam: cam_models.Camera,
    bf: jnp.ndarray,
    T0: lie.SE3,
    obs: PoseObs,
    n_rounds: int = 4,
    iters_per_round: int = 10,
):
    """Optimize T_cw given fixed landmarks.  Returns (T, inlier_mask, n_inliers)."""
    T, inlier = _lm_rounds(cam, bf, T0, obs, n_rounds, iters_per_round)
    return T, inlier, jnp.sum(inlier.astype(jnp.int32))
