"""Bundle-adjustment tests: synthetic multi-view reconstruction refinement."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import ba
from orb_slam3_fast_tpu.utils import lie

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
BF = jnp.float32(40.0)


def make_ba_problem(rng, K=8, M=300, noise=0.3, pose_pert=0.02, lm_pert=0.05, stereo=False):
    """K cameras on a line looking at a point cloud; perturbed initialization."""
    xw_gt = np.stack(
        [rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(6, 14, M)], -1
    ).astype(np.float32)
    R_gt = np.zeros((K, 3, 3), np.float32)
    t_gt = np.zeros((K, 3), np.float32)
    for k in range(K):
        xi = np.array([0.3 * k, 0.02 * k, 0.0, 0.0, 0.01 * k, 0.0], np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        R_gt[k] = np.asarray(T.R)
        t_gt[k] = np.asarray(T.t)

    # observations: every landmark seen by every camera (dense, simple)
    kf = np.repeat(np.arange(K), M).astype(np.int32)
    lm = np.tile(np.arange(M), K).astype(np.int32)
    xc = np.einsum("oij,oj->oi", R_gt[kf], xw_gt[lm]) + t_gt[kf]
    uvr = np.array(cam_models.stereo_project(CAM, jnp.asarray(xc), BF))
    uvr[:, :2] += rng.normal(0, noise, (len(kf), 2))
    if not stereo:
        uvr[:, 2] = -1.0
    in_img = (
        (uvr[:, 0] > 0) & (uvr[:, 0] < 640) & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
    )

    # perturb init (keep pose 0 fixed as gauge)
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    for k in range(1, K):
        dxi = rng.normal(0, pose_pert, 6).astype(np.float32)
        dT = lie.se3_exp(jnp.asarray(dxi))
        R0[k] = np.asarray(dT.R) @ R0[k]
        t0[k] = np.asarray(dT.R) @ t0[k] + np.asarray(dT.t)
    xw0 = xw_gt + rng.normal(0, lm_pert, xw_gt.shape).astype(np.float32)

    prob = ba.BAProblem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
        xw=jnp.asarray(xw0),
        lm_valid=jnp.ones(M, dtype=bool),
        obs_kf=jnp.asarray(kf),
        obs_lm=jnp.asarray(lm),
        obs_uv=jnp.asarray(uvr),
        obs_inv_sigma2=jnp.ones(len(kf)),
        obs_is_stereo=jnp.full(len(kf), stereo),
        obs_valid=jnp.asarray(in_img),
    )
    return prob, R_gt, t_gt, xw_gt


def reproj_rmse(prob, R, t, xw):
    r, _, _ = ba._obs_residuals(CAM, BF, R, t, xw, prob)
    r = np.asarray(r)[np.asarray(prob.obs_valid)]
    return float(np.sqrt((r[:, :2] ** 2).sum(1).mean()))


def test_ba_reduces_reprojection_error(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng)
    rmse0 = reproj_rmse(prob, prob.R, prob.t, prob.xw)
    R, t, xw, inl = ba.bundle_adjust(CAM, BF, prob)
    rmse1 = reproj_rmse(prob, R, t, xw)
    assert rmse0 > 5.0  # perturbation is visible
    assert rmse1 < 0.6, f"rmse {rmse1}"  # down to the noise floor
    assert np.asarray(inl).mean() > 0.9


def test_ba_recovers_poses(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, noise=0.1)
    R, t, xw, inl = ba.bundle_adjust(CAM, BF, prob)
    # compare camera centers: c = -R^T t
    c_est = -np.einsum("kji,kj->ki", np.asarray(R), np.asarray(t))
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    err = np.linalg.norm(c_est - c_gt, axis=1)
    assert err.max() < 0.01, f"center err {err}"


def test_ba_gauge_fixed(rng):
    prob, *_ = make_ba_problem(rng)
    R, t, xw, _ = ba.bundle_adjust(CAM, BF, prob)
    np.testing.assert_allclose(np.asarray(R[0]), np.asarray(prob.R[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(prob.t[0]), atol=1e-6)


def test_ba_stereo(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, noise=0.2, stereo=True)
    R, t, xw, inl = ba.bundle_adjust(CAM, BF, prob)
    rmse1 = reproj_rmse(prob, R, t, xw)
    assert rmse1 < 0.5
    assert np.asarray(inl).mean() > 0.85


def test_ba_with_outliers(rng):
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, noise=0.3)
    uvr = np.array(prob.obs_uv)
    n_out = 200
    uvr[:n_out, :2] += rng.uniform(15, 50, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uvr))
    R, t, xw, inl = ba.bundle_adjust(CAM, BF, prob)
    inl = np.asarray(inl)
    assert inl[:n_out].mean() < 0.1  # outliers flagged
    c_est = -np.einsum("kji,kj->ki", np.asarray(R), np.asarray(t))
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    assert np.linalg.norm(c_est - c_gt, axis=1).max() < 0.05
