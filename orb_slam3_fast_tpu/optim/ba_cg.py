"""Scalable bundle adjustment: implicit-Schur Levenberg-Marquardt with
block-Jacobi preconditioned conjugate gradients.

The dense Schur path (``optim/ba.py``) materializes the camera-landmark
coupling tensor ``Z:(M,K,6,3)`` and the reduced system ``(K,6,K,6)`` — exact
and fast for local windows (K <= ~64) but a memory wall at global-BA scale
(reference ``Optimizer::GlobalBundleAdjustemnt`` covers ALL keyframes and
points, ``/root/reference/src/Optimizer.cc:47-373``; at 3k KFs / 100k points
Z would be hundreds of GB).  This module never builds Z: the reduced camera
system ``S = Hpp - Z Hll^-1 Z^T`` is applied as an OPERATOR whose matvec is
three observation-wise segment ops (gather -> 6x3 einsum -> scatter-add),
i.e. the Ceres ITERATIVE_SCHUR formulation recast as fixed-shape batched
TPU ops.  Memory is O(K*36 + M*9 + O*18) — a 500-KF / 20k-landmark / 100k-obs
GBA fits in ~10 MB.

Everything is a plain sum over observations, so the distributed path shards
the observation table over the device mesh and reduces with two small psums
per CG matvec ((M,3) and (K,6)) instead of psumming a dense Z
(``parallel/dist_ba.make_distributed_ba_cg``).

The LM schedule mirrors the reference GBA (Optimizer.cc:984-1094 applied
globally): robust phase 1, chi2 reclassification, phase 2 on inliers.
Segmented entry points (``lm_segment`` / ``classify``) let the host run a
few LM iterations per device dispatch and poll an abort flag in between —
the reference's interruptible GBA (``Optimizer.cc:1206`` setForceStopFlag,
``LoopClosing.cc:1072-1086`` mbStopGBA).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import ba as ba_mod
from orb_slam3_fast_tpu.optim.ba import BAProblem
from orb_slam3_fast_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, _huber_weight
from orb_slam3_fast_tpu.utils import lie


def _noreduce(x):
    return x


def build_blocks(cam, bf, R, t, xw, prob: BAProblem, inlier):
    """Per-observation normal-equation pieces WITHOUT the dense Z tensor.

    Returns (Hpp (K,6,6), Hll (M,3,3), bp (K,6), bl (M,3), Wob (O,6,3),
    w_lm (M,), cost).  All outputs except Wob are plain segment sums over
    observations (psum-able); Wob stays per-observation (sharded in the
    distributed path)."""
    K = R.shape[0]
    M = xw.shape[0]
    r, xc, posd = ba_mod._obs_residuals(cam, bf, R, t, xw, prob)
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
    Jp = Jp * (~prob.pose_fixed)[prob.obs_kf][:, None, None]

    Hpp = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(jnp.einsum("oij,o,oik->ojk", Jp, w, Jp))
    Hll = jnp.zeros((M, 3, 3)).at[prob.obs_lm].add(jnp.einsum("oij,o,oik->ojk", Jl, w, Jl))
    bp = jnp.zeros((K, 6)).at[prob.obs_kf].add(-jnp.einsum("oij,o,oi->oj", Jp, w, r))
    bl = jnp.zeros((M, 3)).at[prob.obs_lm].add(-jnp.einsum("oij,o,oi->oj", Jl, w, r))
    Wob = jnp.einsum("oij,o,oik->ojk", Jp, w, Jl)  # (O,6,3)
    w_lm = jnp.zeros((M,)).at[prob.obs_lm].add(w)
    cost, _ = ba_mod._robust_cost(r, prob, active)
    return Hpp, Hll, bp, bl, Wob, w_lm, cost


def implicit_schur_solve(
    Hpp, Hll, bp, bl, Wob, obs_kf, obs_lm, w_lm,
    pose_fixed, lm_valid, lam, cg_iters: int,
    reduce_k=_noreduce, reduce_m=_noreduce,
):
    """PCG on the reduced camera system applied implicitly.

    ``reduce_k``/``reduce_m`` are identity on one device and ``psum`` over
    the obs mesh axis in the distributed path (Hpp/Hll/bp/bl/w_lm must
    already be globally reduced by the caller there).
    Returns (dp (K,6), dl (M,3))."""
    K = Hpp.shape[0]
    M = Hll.shape[0]
    Hpp_d = Hpp + (lam * jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-3))[
        :, :, None
    ] * jnp.eye(6)
    Hll_d = Hll + (lam * jnp.maximum(jnp.diagonal(Hll, axis1=1, axis2=2), 1e-3))[
        :, :, None
    ] * jnp.eye(3)
    lm_seen = w_lm > 0
    Hll_d = jnp.where(lm_seen[:, None, None], Hll_d, jnp.eye(3))
    Vinv = jnp.linalg.inv(Hll_d)
    free = ~pose_fixed
    free_f = free.astype(jnp.float32)

    def Zt_v(v):  # (K,6) -> (M,3)
        tmp = jnp.einsum("oab,oa->ob", Wob, v[obs_kf])
        return reduce_m(jnp.zeros((M, 3)).at[obs_lm].add(tmp))

    def Z_y(y):  # (M,3) -> (K,6)
        tmp = jnp.einsum("oab,ob->oa", Wob, y[obs_lm])
        return reduce_k(jnp.zeros((K, 6)).at[obs_kf].add(tmp))

    def S_mv(v):
        v = v * free_f[:, None]
        hv = jnp.einsum("kab,kb->ka", Hpp_d, v)
        y = jnp.einsum("mab,mb->ma", Vinv, Zt_v(v))
        return (hv - Z_y(y)) * free_f[:, None]

    # rhs: b_s = bp - Z Hll^-1 bl
    y0 = jnp.einsum("mab,mb->ma", Vinv, bl)
    b_s = (bp - Z_y(y0)) * free_f[:, None]

    # block-Jacobi preconditioner: exact diagonal 6x6 blocks of S
    diag_coup = jnp.einsum("oab,obc,odc->oad", Wob, Vinv[obs_lm], Wob)  # (O,6,6)
    D = Hpp_d - reduce_k(jnp.zeros((K, 6, 6)).at[obs_kf].add(diag_coup))
    D = jnp.where(free[:, None, None], D, jnp.eye(6))
    # damping keeps D positive-definite; add a floor for safety
    Dinv = jnp.linalg.inv(D + 1e-5 * jnp.eye(6))

    def precond(r):
        return jnp.einsum("kab,kb->ka", Dinv, r) * free_f[:, None]

    x = jnp.zeros_like(b_s)
    r = b_s
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = S_mv(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.maximum(pAp, 1e-20)
        # freeze once converged (rz ~ 0) so extra iterations are no-ops
        ok = rz > 1e-12
        alpha = jnp.where(ok, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z_new = precond(r)
        rz_new = jnp.sum(r * z_new)
        beta = jnp.where(ok, rz_new / jnp.maximum(rz, 1e-20), 0.0)
        p = z_new + beta * p
        return (x, r, z_new, p, rz_new), None

    (x, r, z, p, rz), _ = jax.lax.scan(body, (x, r, z, p, rz), None, length=cg_iters)
    dp = x * free_f[:, None]
    dl = jnp.einsum("mab,mb->ma", Vinv, bl - Zt_v(dp))
    dl = dl * (lm_seen & lm_valid)[:, None]
    return dp, dl


def _lm_step(cam, bf, prob, R, t, xw, inlier, lam, cg_iters,
             reduce_k=_noreduce, reduce_m=_noreduce, reduce_s=_noreduce):
    """One damped LM iteration with cost-gated acceptance."""
    blocks = build_blocks(cam, bf, R, t, xw, prob, inlier)
    Hpp, Hll, bp, bl, Wob, w_lm, cost = blocks
    Hpp, Hll, bp, bl, w_lm = (
        reduce_s(Hpp), reduce_s(Hll), reduce_s(bp), reduce_s(bl), reduce_s(w_lm),
    )
    cost = reduce_s(cost)
    dp, dl = implicit_schur_solve(
        Hpp, Hll, bp, bl, Wob, prob.obs_kf, prob.obs_lm, w_lm,
        prob.pose_fixed, prob.lm_valid, lam, cg_iters,
        reduce_k=reduce_k, reduce_m=reduce_m,
    )
    R_new, t_new, xw_new = ba_mod.apply_update(R, t, xw, dp, dl)
    r_new, _, posd_new = ba_mod._obs_residuals(cam, bf, R_new, t_new, xw_new, prob)
    active_new = prob.obs_valid & inlier & posd_new & prob.lm_valid[prob.obs_lm]
    cost_new, _ = ba_mod._robust_cost(r_new, prob, active_new)
    cost_new = reduce_s(cost_new)
    accept = cost_new < cost
    R = jnp.where(accept, R_new, R)
    t = jnp.where(accept, t_new, t)
    xw = jnp.where(accept, xw_new, xw)
    lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
    return R, t, xw, lam, cost


@partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
def lm_segment(cam, bf, prob: BAProblem, R, t, xw, inlier, lam,
               n_iters: int = 2, cg_iters: int = 32):
    """``n_iters`` LM iterations as one device program; the host checks the
    GBA abort flag between segments (LoopClosing.cc:1072-1086 semantics).
    Returns (R, t, xw, lam, last_cost)."""
    def body(carry, _):
        R, t, xw, lam = carry
        R, t, xw, lam, cost = _lm_step(cam, bf, prob, R, t, xw, inlier, lam, cg_iters)
        return (R, t, xw, lam), cost

    (R, t, xw, lam), costs = jax.lax.scan(body, (R, t, xw, lam), None, length=n_iters)
    return R, t, xw, lam, costs[-1]


@jax.jit
def classify(cam, bf, prob: BAProblem, R, t, xw):
    """chi2 inlier gate (Optimizer.cc:1347-1365)."""
    r, _, posd = ba_mod._obs_residuals(cam, bf, R, t, xw, prob)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    return (chi2 <= delta2) & posd & prob.obs_valid


def bundle_adjust_cg(cam, bf, prob: BAProblem, iters1: int = 5, iters2: int = 10,
                     cg_iters: int = 32, seg: int = 5, abort_flag=None):
    """Two-phase robust BA via implicit Schur + PCG, host-segmented so an
    abort can land mid-solve.  Drop-in result contract of
    ``ba.bundle_adjust``: (R, t, xw, inlier) — plus ``aborted`` flag.

    ``abort_flag``: object with ``is_set()`` polled between segments; when it
    fires the current state is returned with aborted=True (the reference
    discards an aborted GBA, LoopClosing.cc:2412-2422 checks mbStopGBA).
    """
    R, t, xw = prob.R, prob.t, prob.xw
    lam = jnp.float32(1e-4)
    inlier = jnp.ones(prob.obs_uv.shape[0], dtype=bool)

    def run_phase(R, t, xw, inlier, lam, total):
        done = 0
        while done < total:
            n = min(seg, total - done)
            R, t, xw, lam, _ = lm_segment(
                cam, bf, prob, R, t, xw, inlier, lam, n_iters=n, cg_iters=cg_iters
            )
            done += n
            if abort_flag is not None and abort_flag.is_set():
                return R, t, xw, lam, True
        return R, t, xw, lam, False

    R, t, xw, lam, aborted = run_phase(R, t, xw, inlier, lam, iters1)
    if aborted:
        return R, t, xw, inlier, True
    inlier = classify(cam, bf, prob, R, t, xw)
    R, t, xw, lam, aborted = run_phase(R, t, xw, inlier, jnp.float32(1e-4), iters2)
    inlier = classify(cam, bf, prob, R, t, xw)
    return R, t, xw, inlier, aborted
