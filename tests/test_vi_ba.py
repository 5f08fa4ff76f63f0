"""Visual-inertial BA test: simulated flight + landmarks, perturbed states."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import vi_ba
from orb_slam3_fast_tpu.utils import lie
from tests.test_inertial import CAM, simulate_trajectory, preintegrate_segments


def build_vi_problem(rng, n_kf=6, n_lm=200, noise=0.3, pert=0.03):
    states, segments, dt = simulate_trajectory(rng, n_kf=n_kf)
    preints = preintegrate_segments(segments, dt)
    R_gt = np.stack([s[0] for s in states]).astype(np.float32)
    p_gt = np.stack([s[1] for s in states]).astype(np.float32)
    v_gt = np.stack([s[2] for s in states]).astype(np.float32)
    xw = np.stack(
        [rng.uniform(-5, 5, n_lm), rng.uniform(-4, 4, n_lm), rng.uniform(4, 14, n_lm)], -1
    ).astype(np.float32)
    # observations: all kfs x all lms (camera = body)
    kf = np.repeat(np.arange(n_kf), n_lm).astype(np.int32)
    lm = np.tile(np.arange(n_lm), n_kf).astype(np.int32)
    R_bw = np.transpose(R_gt, (0, 2, 1))
    xc = np.einsum("oij,oj->oi", R_bw[kf], xw[lm] - p_gt[kf])
    uv = np.array(cam_models.project(CAM, jnp.asarray(xc)))
    uv += rng.normal(0, noise, uv.shape)
    valid = (xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    uvr = np.concatenate([uv, -np.ones((len(kf), 1))], -1).astype(np.float32)

    # perturb all but state 0
    R0 = R_gt.copy()
    p0 = p_gt.copy()
    v0 = v_gt.copy()
    for k in range(1, n_kf):
        R0[k] = R0[k] @ np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, pert, 3).astype(np.float32))))
        p0[k] = p0[k] + rng.normal(0, pert, 3)
        v0[k] = v0[k] + rng.normal(0, pert * 3, 3)
    xw0 = xw + rng.normal(0, 0.03, xw.shape).astype(np.float32)

    prob = vi_ba.VIBAProblem(
        R_wb=jnp.asarray(R0),
        p_wb=jnp.asarray(p0),
        v_w=jnp.asarray(v0),
        bias=jnp.zeros((n_kf, 6)),
        state_fixed=jnp.asarray(np.arange(n_kf) == 0),
        xw=jnp.asarray(xw0),
        lm_valid=jnp.ones(n_lm, dtype=bool),
        obs_kf=jnp.asarray(kf),
        obs_lm=jnp.asarray(lm),
        obs_uv=jnp.asarray(uvr),
        obs_inv_sigma2=jnp.ones(len(kf)),
        obs_is_stereo=jnp.zeros(len(kf), dtype=bool),
        obs_valid=jnp.asarray(valid),
        edge_i=jnp.arange(n_kf - 1),
        edge_j=jnp.arange(1, n_kf),
        edge_valid=jnp.ones(n_kf - 1, dtype=bool),
        preint=preints,
    )
    return prob, R_gt, p_gt, v_gt, xw


def test_vi_ba_converges(rng):
    prob, R_gt, p_gt, v_gt, xw_gt = build_vi_problem(rng)
    R, p, v, b, xw, inlier = vi_ba.vi_bundle_adjust(
        CAM, jnp.float32(0.0), lie.SE3.identity(), prob
    )
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    v_err = np.linalg.norm(np.asarray(v) - v_gt, axis=1)
    assert p_err.max() < 0.01, f"pos err {p_err}"
    assert v_err.max() < 0.05, f"vel err {v_err}"
    assert np.asarray(inlier).mean() > 0.9
    # rotations
    for k in range(len(R_gt)):
        dR = np.asarray(R[k]) @ R_gt[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"kf {k} rot err {ang}"


def test_vi_ba_uses_imu_when_vision_is_weak(rng):
    """With very few visual obs, the inertial chain must still constrain the
    trajectory (velocities/relative motion)."""
    prob, R_gt, p_gt, v_gt, xw_gt = build_vi_problem(rng, n_lm=25, pert=0.05)
    R, p, v, b, xw, inlier = vi_ba.vi_bundle_adjust(
        CAM, jnp.float32(0.0), lie.SE3.identity(), prob
    )
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    assert p_err.max() < 0.05, f"pos err {p_err}"
