"""Implicit-Schur CG bundle adjustment: parity with the dense path on small
problems, convergence at global-BA scale WITHOUT subsampling, and mid-solve
abortability (the reference's interruptible GBA, Optimizer.cc:1206 /
LoopClosing.cc:1072-1086)."""
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import ba, ba_cg
from orb_slam3_fast_tpu.utils import lie

from tests.test_ba import BF, CAM, make_ba_problem, reproj_rmse


def test_cg_matches_dense_small(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, noise=0.1)
    R, t, xw, inl, aborted = ba_cg.bundle_adjust_cg(CAM, BF, prob, cg_iters=48)
    assert not aborted
    rmse = reproj_rmse(prob, R, t, xw)
    assert rmse < 0.3, f"rmse {rmse}"
    c_est = -np.einsum("kji,kj->ki", np.asarray(R), np.asarray(t))
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    assert np.linalg.norm(c_est - c_gt, axis=1).max() < 0.02


def test_cg_outlier_classification(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, noise=0.3)
    uvr = np.array(prob.obs_uv)
    n_out = 200
    uvr[:n_out, :2] += rng.uniform(15, 50, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uvr))
    R, t, xw, inl, _ = ba_cg.bundle_adjust_cg(CAM, BF, prob, cg_iters=48)
    inl = np.asarray(inl)
    assert inl[:n_out].mean() < 0.1
    assert inl[n_out:].mean() > 0.85


def make_large_problem(rng, K=512, M=20480, obs_per_lm=6, noise=0.25,
                       pose_pert=0.01, lm_pert=0.05):
    """Trajectory-shaped sparse problem: cameras on an arc, each landmark
    observed by a temporal run of keyframes (the real GBA sparsity)."""
    th = np.linspace(0, 2 * np.pi * 0.8, K)
    c_gt = np.stack([10 * np.sin(th), 0.1 * np.sin(3 * th), 10 - 10 * np.cos(th)], -1)
    R_gt = np.zeros((K, 3, 3), np.float32)
    t_gt = np.zeros((K, 3), np.float32)
    for k in range(K):
        yaw = th[k] * 0.9
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        R_gt[k] = Rwc.T
        t_gt[k] = -Rwc.T @ c_gt[k]
    # each landmark anchored near one keyframe, in front of it
    anchor = rng.integers(0, K, M)
    xc_local = np.stack(
        [rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(5, 15, M)], -1
    ).astype(np.float32)
    xw_gt = np.einsum("mji,mj->mi", R_gt[anchor], xc_local - 0) - np.einsum(
        "mji,mj->mi", R_gt[anchor], t_gt[anchor]
    )
    # observed by anchor + nearby KFs
    kf_l, lm_l = [], []
    for d in range(obs_per_lm):
        kf_l.append(np.clip(anchor + d - obs_per_lm // 2, 0, K - 1))
        lm_l.append(np.arange(M))
    kf = np.concatenate(kf_l).astype(np.int32)
    lm = np.concatenate(lm_l).astype(np.int32)
    xc = np.einsum("oij,oj->oi", R_gt[kf], xw_gt[lm]) + t_gt[kf]
    uvr = np.array(cam_models.stereo_project(CAM, jnp.asarray(xc), BF))
    uvr[:, :2] += rng.normal(0, noise, (len(kf), 2)).astype(np.float32)
    uvr[:, 2] = -1.0
    valid = (
        (xc[:, 2] > 0.5)
        & (uvr[:, 0] > 0) & (uvr[:, 0] < 640) & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
    )
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    for k in range(1, K):
        dxi = rng.normal(0, pose_pert, 6).astype(np.float32)
        dT = lie.se3_exp(jnp.asarray(dxi))
        R0[k] = np.asarray(dT.R) @ R0[k]
        t0[k] = np.asarray(dT.R) @ t0[k] + np.asarray(dT.t)
    xw0 = xw_gt + rng.normal(0, lm_pert, xw_gt.shape).astype(np.float32)
    prob = ba.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
        xw=jnp.asarray(xw0), lm_valid=jnp.ones(M, dtype=bool),
        obs_kf=jnp.asarray(kf), obs_lm=jnp.asarray(lm),
        obs_uv=jnp.asarray(uvr), obs_inv_sigma2=jnp.ones(len(kf)),
        obs_is_stereo=jnp.zeros(len(kf), bool), obs_valid=jnp.asarray(valid),
    )
    return prob, R_gt, t_gt, xw_gt


@pytest.mark.slow
def test_cg_global_scale(rng):
    """512 KFs / 20k landmarks / 120k observations, NO subsampling — the
    scale the dense-Z path cannot touch (VERDICT r3 missing #2)."""
    prob, R_gt, t_gt, xw_gt = make_large_problem(rng)
    rmse0 = reproj_rmse(prob, prob.R, prob.t, prob.xw)
    R, t, xw, inl, aborted = ba_cg.bundle_adjust_cg(
        CAM, BF, prob, iters1=4, iters2=6, cg_iters=24
    )
    assert not aborted
    rmse1 = reproj_rmse(prob, R, t, xw)
    assert rmse0 > 2.0
    assert rmse1 < 0.5, f"rmse {rmse1}"
    inl = np.asarray(inl)[np.asarray(prob.obs_valid)]
    assert inl.mean() > 0.9


def test_cg_abort_mid_solve(rng):
    """The abort flag set between segments stops the solve early."""
    prob, *_ = make_ba_problem(rng)

    class CountingFlag:
        def __init__(self, after):
            self.n = 0
            self.after = after

        def is_set(self):
            self.n += 1
            return self.n > self.after

    flag = CountingFlag(after=1)
    R, t, xw, inl, aborted = ba_cg.bundle_adjust_cg(
        CAM, BF, prob, iters1=10, iters2=10, seg=2, abort_flag=flag
    )
    assert aborted
    # only ~1 segment ran before the abort landed
    assert flag.n <= 3
