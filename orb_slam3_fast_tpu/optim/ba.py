"""Bundle adjustment as batched Levenberg-Marquardt with camera/landmark
Schur-complement reduction.

TPU-native replacement for the g2o-based builders in the reference:
``Optimizer::LocalBundleAdjustment`` (``/root/reference/src/Optimizer.cc:
1109-1516``), ``BundleAdjustment/GlobalBundleAdjustemnt`` (47-373): the
pointer-hypergraph + ``BlockSolver_6_3`` sparse Schur machinery becomes a
fixed-shape observation table (COO triplets kf/lm/uv) whose residuals,
Jacobians, and Schur blocks are built with segment-sums and einsums — every
step is a dense batched op that XLA tiles onto the MXU.

Structure per LM iteration (classic pose-landmark Schur):
  Hpp (K,6,6) pose blocks, Hll (M,3,3) landmark blocks,
  W (per-obs 6x3 coupling) scatter-added into Z (M,K,6,3),
  reduced camera system  S = Hpp - Z Hll^-1 Z^T  solved dense (the local
  window is <= ~100 poses, SURVEY.md §7 "sparse linear algebra"), landmarks
  back-substituted in closed form.

The reference's two-phase schedule is preserved: optimize, reclassify
outliers by chi2 (5.991/7.815), optimize again (Optimizer.cc:1347-1398).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, _huber_weight
from orb_slam3_fast_tpu.utils import lie


class BAProblem(NamedTuple):
    R: jnp.ndarray  # (K,3,3) T_cw rotations
    t: jnp.ndarray  # (K,3)
    pose_fixed: jnp.ndarray  # (K,) bool — gauge/boundary poses
    xw: jnp.ndarray  # (M,3) landmarks
    lm_valid: jnp.ndarray  # (M,)
    obs_kf: jnp.ndarray  # (O,) int32
    obs_lm: jnp.ndarray  # (O,) int32
    obs_uv: jnp.ndarray  # (O,3) [u,v,ur] with ur=-1 for mono
    obs_inv_sigma2: jnp.ndarray  # (O,)
    obs_is_stereo: jnp.ndarray  # (O,)
    obs_valid: jnp.ndarray  # (O,)


def _obs_residuals(cam, bf, R, t, xw, prob: BAProblem):
    """(O,3) residuals + camera-frame points + positive-depth mask."""
    Rk = R[prob.obs_kf]  # (O,3,3)
    tk = t[prob.obs_kf]
    xo = xw[prob.obs_lm]
    xc = jnp.einsum("oij,oj->oi", Rk, xo) + tk
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = prob.obs_uv - uvr
    r = r.at[:, 2].set(jnp.where(prob.obs_is_stereo, r[:, 2], 0.0))
    return r, xc, xc[:, 2] > 0.05


def _robust_cost(r, prob, active):
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    # Huber rho(chi2): chi2 inside, 2*delta*sqrt(chi2)-delta2 outside
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    )
    return jnp.sum(jnp.where(active, rho, 0.0)), chi2



def build_normal_blocks(cam, bf, R, t, xw, prob: BAProblem, inlier):
    """Per-shard normal-equation blocks from an observation subset.

    Factored out of the LM step so the distributed path (parallel/dist_ba.py)
    can build partial sums per device and psum them: every output is a plain
    sum over observations, hence shardable over the obs axis.
    Returns (Hpp, Hll, bp, bl, Z, w_sum_per_lm, cost)."""
    K = R.shape[0]
    M = xw.shape[0]
    r, xc, posd = _obs_residuals(cam, bf, R, t, xw, prob)
    active = prob.obs_valid & inlier & posd & prob.lm_valid[prob.obs_lm]
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    w = jnp.where(active, _huber_weight(chi2, delta2) * prob.obs_inv_sigma2, 0.0)

    Jproj = jax.vmap(jax.jacfwd(lambda x: cam_models.stereo_project(cam, x, bf)))(xc)
    Jproj = jnp.where(prob.obs_is_stereo[:, None, None], Jproj, Jproj.at[:, 2, :].set(0.0))
    dxc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), (xc.shape[0], 3, 3)), -lie.hat(xc)], axis=-1
    )  # (O,3,6)
    Jp = -jnp.einsum("oij,ojk->oik", Jproj, dxc_dxi)  # (O,3,6)
    Jl = -jnp.einsum("oij,ojk->oik", Jproj, R[prob.obs_kf])  # (O,3,3)
    free = ~prob.pose_fixed
    Jp = Jp * free[prob.obs_kf][:, None, None]

    Hpp = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(jnp.einsum("oij,o,oik->ojk", Jp, w, Jp))
    Hll = jnp.zeros((M, 3, 3)).at[prob.obs_lm].add(jnp.einsum("oij,o,oik->ojk", Jl, w, Jl))
    bp = jnp.zeros((K, 6)).at[prob.obs_kf].add(-jnp.einsum("oij,o,oi->oj", Jp, w, r))
    bl = jnp.zeros((M, 3)).at[prob.obs_lm].add(-jnp.einsum("oij,o,oi->oj", Jl, w, r))
    Wob = jnp.einsum("oij,o,oik->ojk", Jp, w, Jl)  # (O,6,3)
    Z = jnp.zeros((M, K, 6, 3)).at[prob.obs_lm, prob.obs_kf].add(Wob)
    w_lm = jnp.zeros((M,)).at[prob.obs_lm].add(w)
    cost, _ = _robust_cost(r, prob, active)
    return Hpp, Hll, bp, bl, Z, w_lm, cost


def schur_solve(Hpp, Hll, bp, bl, Z, w_lm, pose_fixed, lm_valid, lam):
    """Damped pose-landmark Schur solve from assembled blocks.
    Returns (dp (K,6), dl (M,3))."""
    K = Hpp.shape[0]
    Hpp_d = Hpp + (lam * jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-3))[
        :, :, None
    ] * jnp.eye(6)
    Hll_d = Hll + (lam * jnp.maximum(jnp.diagonal(Hll, axis1=1, axis2=2), 1e-3))[
        :, :, None
    ] * jnp.eye(3)
    lm_seen = w_lm > 0
    Hll_d = jnp.where(lm_seen[:, None, None], Hll_d, jnp.eye(3))
    Vinv = jnp.linalg.inv(Hll_d)

    ZV = jnp.einsum("mkab,mbc->mkac", Z, Vinv)
    S_coup = jnp.einsum("mkac,mjbc->kajb", ZV, Z)
    S = jnp.zeros((K, 6, K, 6))
    diag_idx = jnp.arange(K)
    S = S.at[diag_idx, :, diag_idx, :].add(Hpp_d)
    S = S - S_coup
    b_s = bp - jnp.einsum("mkac,mc->ka", ZV, bl)

    free_f = (~pose_fixed).astype(S.dtype)
    S = S * free_f[:, None, None, None] * free_f[None, None, :, None]
    S = S.at[diag_idx, :, diag_idx, :].add((1.0 - free_f)[:, None, None] * jnp.eye(6))
    b_s = b_s * free_f[:, None]

    Sd = S.reshape(K * 6, K * 6) + 1e-6 * jnp.eye(K * 6)
    dp = jnp.linalg.solve(Sd, b_s.reshape(-1)).reshape(K, 6)
    dp = dp * free_f[:, None]
    Wt_dp = jnp.einsum("mkab,ka->mb", Z, dp)
    dl = jnp.einsum("mab,mb->ma", Vinv, bl - Wt_dp)
    dl = dl * (lm_seen & lm_valid)[:, None]
    return dp, dl


def apply_update(R, t, xw, dp, dl):
    dT = lie.se3_exp(dp)
    R_new = jnp.einsum("kij,kjl->kil", dT.R, R)
    t_new = jnp.einsum("kij,kj->ki", dT.R, t) + dT.t
    return R_new, t_new, xw + dl


@partial(jax.jit, static_argnames=("iters1", "iters2"))
def bundle_adjust(
    cam: cam_models.Camera,
    bf: jnp.ndarray,
    prob: BAProblem,
    iters1: int = 5,
    iters2: int = 10,
):
    """Two-phase robust BA.  Returns (R, t, xw, obs_inlier_mask)."""
    K = prob.R.shape[0]
    M = prob.xw.shape[0]

    def lm_step(R, t, xw, inlier, lam):
        Hpp, Hll, bp, bl, Z, w_lm, cost_old = build_normal_blocks(
            cam, bf, R, t, xw, prob, inlier
        )
        dp, dl = schur_solve(
            Hpp, Hll, bp, bl, Z, w_lm, prob.pose_fixed, prob.lm_valid, lam
        )
        R_new, t_new, xw_new = apply_update(R, t, xw, dp, dl)

        r_new, _, posd_new = _obs_residuals(cam, bf, R_new, t_new, xw_new, prob)
        active_new = prob.obs_valid & inlier & posd_new & prob.lm_valid[prob.obs_lm]
        cost_new, _ = _robust_cost(r_new, prob, active_new)
        accept = cost_new < cost_old
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xw = jnp.where(accept, xw_new, xw)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        return R, t, xw, lam

    def run_phase(R, t, xw, inlier, n_iters):
        def body(carry, _):
            R, t, xw, lam = carry
            R, t, xw, lam = lm_step(R, t, xw, inlier, lam)
            return (R, t, xw, lam), None

        (R, t, xw, _), _ = jax.lax.scan(body, (R, t, xw, jnp.float32(1e-4)), None, length=n_iters)
        return R, t, xw

    inlier = jnp.ones(prob.obs_uv.shape[0], dtype=bool)
    R, t, xw = run_phase(prob.R, prob.t, prob.xw, inlier, iters1)
    # outlier reclassification (Optimizer.cc:1347-1365)
    r, _, posd = _obs_residuals(cam, bf, R, t, xw, prob)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = (chi2 <= delta2) & posd & prob.obs_valid
    R, t, xw = run_phase(R, t, xw, inlier, iters2)
    # final classification (Optimizer.cc:1398-1420)
    r, _, posd = _obs_residuals(cam, bf, R, t, xw, prob)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    inlier = (chi2 <= delta2) & posd & prob.obs_valid
    return R, t, xw, inlier
