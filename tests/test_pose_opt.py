"""Pose-only LM optimization tests: convergence from perturbed poses,
outlier rejection, stereo edges."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import pose_opt
from orb_slam3_fast_tpu.utils import lie

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
BF = jnp.float32(400.0 * 0.1)


def make_scene(rng, n=200, noise=0.3, outlier_frac=0.0, stereo=False):
    xw = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(4, 12, n),
        ],
        axis=-1,
    ).astype(np.float32)
    # ground-truth pose: modest rotation+translation
    xi_gt = np.array([0.2, -0.1, 0.15, 0.04, -0.03, 0.05], np.float32)
    T_gt = lie.se3_exp(jnp.asarray(xi_gt))
    xc = np.asarray(T_gt.apply(jnp.asarray(xw)))
    uvr = np.array(cam_models.stereo_project(CAM, jnp.asarray(xc), BF))
    uvr[:, :2] += rng.normal(0, noise, (n, 2))
    if not stereo:
        uvr[:, 2] = -1.0
    n_out = int(n * outlier_frac)
    if n_out:
        uvr[:n_out, :2] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    obs = pose_opt.PoseObs(
        xw=jnp.asarray(xw),
        uv=jnp.asarray(uvr),
        inv_sigma2=jnp.ones(n),
        is_stereo=jnp.full(n, stereo),
        valid=jnp.ones(n, dtype=bool),
    )
    return T_gt, obs, n_out


def pose_err(T_est, T_gt):
    dT = T_est.compose(T_gt.inverse())
    return float(jnp.linalg.norm(lie.se3_log(dT)))


def test_converges_from_perturbation(rng):
    T_gt, obs, _ = make_scene(rng, noise=0.0)
    T0 = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.1, 0.02, 0.03, -0.02])).compose(T_gt)
    T, inl, n_inl = pose_opt.pose_optimization(CAM, BF, T0, obs)
    assert pose_err(T, T_gt) < 1e-3
    assert int(n_inl) == obs.uv.shape[0]


def test_noise_robustness(rng):
    T_gt, obs, _ = make_scene(rng, noise=0.5)
    T0 = lie.se3_exp(jnp.asarray([0.05, 0.05, -0.08, 0.01, -0.02, 0.01])).compose(T_gt)
    T, inl, n_inl = pose_opt.pose_optimization(CAM, BF, T0, obs)
    assert pose_err(T, T_gt) < 0.01
    assert int(n_inl) > 180


def test_outlier_rejection(rng):
    T_gt, obs, n_out = make_scene(rng, noise=0.3, outlier_frac=0.25)
    T0 = lie.se3_exp(jnp.asarray([0.05, 0.0, -0.05, 0.01, 0.0, 0.01])).compose(T_gt)
    T, inl, n_inl = pose_opt.pose_optimization(CAM, BF, T0, obs)
    assert pose_err(T, T_gt) < 0.02, f"pose err {pose_err(T, T_gt)}"
    inl = np.asarray(inl)
    # outliers (first n_out) must be flagged out
    assert inl[:n_out].mean() < 0.1
    assert inl[n_out:].mean() > 0.9


def test_stereo_edges(rng):
    T_gt, obs, _ = make_scene(rng, noise=0.2, stereo=True)
    T0 = lie.se3_exp(jnp.asarray([0.1, 0.02, -0.03, 0.02, 0.01, -0.01])).compose(T_gt)
    T, inl, n_inl = pose_opt.pose_optimization(CAM, BF, T0, obs)
    assert pose_err(T, T_gt) < 0.005
    assert int(n_inl) > 190


def test_fisheye_pose_opt(rng):
    c = cam_models.Camera.kb8(
        190.978, 190.973, 254.93, 256.9, 0.00348, 0.000715, -0.00205, 0.000202
    )
    n = 150
    xw = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(2, 8, n)], -1
    ).astype(np.float32)
    T_gt = lie.se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.03, 0.02, -0.04]))
    uv = np.asarray(cam_models.project(c, T_gt.apply(jnp.asarray(xw))))
    uv = uv + rng.normal(0, 0.2, uv.shape)
    uvr = np.concatenate([uv, -np.ones((n, 1))], -1).astype(np.float32)
    obs = pose_opt.PoseObs(
        xw=jnp.asarray(xw),
        uv=jnp.asarray(uvr),
        inv_sigma2=jnp.ones(n),
        is_stereo=jnp.zeros(n, dtype=bool),
        valid=jnp.ones(n, dtype=bool),
    )
    T0 = lie.se3_exp(jnp.asarray([0.05, 0.05, -0.05, 0.01, -0.01, 0.02])).compose(T_gt)
    T, inl, n_inl = pose_opt.pose_optimization(c, jnp.float32(0.0), T0, obs)
    assert pose_err(T, T_gt) < 0.01
    assert int(n_inl) > 130
