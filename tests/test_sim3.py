"""Sim3 solver + OptimizeSim3 tests (loop-closing geometric verification)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import sim3 as sim3_mod
from orb_slam3_fast_tpu.utils import lie

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)


def _make_pair(rng, n=120, scale=1.3, noise=0.0, outlier_frac=0.0):
    """Points seen from two keyframes whose 'camera-frame' coordinates are
    related by a ground-truth Sim3 (the Sim3Solver input contract)."""
    xc2 = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], axis=1
    ).astype(np.float32)
    xi = np.array([0.2, -0.1, 0.3, 0.04, 0.08, -0.05, np.log(scale)], np.float32)
    S_gt = lie.sim3_exp(jnp.asarray(xi))
    xc1 = np.asarray(S_gt.apply(jnp.asarray(xc2)))
    uv1 = np.array(cam_models.project(CAM, jnp.asarray(xc1)))
    uv2 = np.array(cam_models.project(CAM, jnp.asarray(xc2)))
    uv1 += rng.normal(0, noise, uv1.shape).astype(np.float32)
    uv2 += rng.normal(0, noise, uv2.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    out = rng.choice(n, n_out, replace=False)
    # corrupt the 3D pairing (wrong data association)
    xc2_bad = xc2.copy()
    xc2_bad[out] = xc2[rng.permutation(n)[:n_out]] + rng.normal(0, 2.0, (n_out, 3))
    valid = np.ones(n, bool)
    return xc1, xc2_bad, uv1, uv2, valid, S_gt, out


def _sim3_close(S, S_gt, atol_R=1e-2, atol_t=5e-2, atol_s=2e-2):
    np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_gt.R), atol=atol_R)
    np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=atol_t)
    np.testing.assert_allclose(float(S.s), float(S_gt.s), atol=atol_s)


def test_horn_exact():
    rng = np.random.default_rng(0)
    xc1, xc2, *_ , S_gt, _ = _make_pair(rng, n=10)
    S = sim3_mod.horn_sim3(jnp.asarray(xc2), jnp.asarray(xc1))
    _sim3_close(S, S_gt, 1e-4, 1e-4, 1e-4)


def test_horn_fix_scale():
    rng = np.random.default_rng(1)
    xc2 = rng.uniform(-3, 3, (20, 3)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.03, -0.06, 0.1]))
    xc1 = np.asarray(T.apply(jnp.asarray(xc2)))
    S = sim3_mod.horn_sim3(jnp.asarray(xc2), jnp.asarray(xc1), fix_scale=True)
    assert float(S.s) == 1.0
    np.testing.assert_allclose(np.asarray(S.R), np.asarray(T.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(S.t), np.asarray(T.t), atol=1e-4)


def test_ransac_with_outliers():
    rng = np.random.default_rng(2)
    xc1, xc2, uv1, uv2, valid, S_gt, out = _make_pair(
        rng, noise=0.3, outlier_frac=0.35
    )
    ones = jnp.ones(len(xc1))
    res = sim3_mod.sim3_ransac(
        CAM, CAM, jnp.asarray(xc1), jnp.asarray(xc2), jnp.asarray(uv1),
        jnp.asarray(uv2), ones, ones, jnp.asarray(valid), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    _sim3_close(res.S12, S_gt, 3e-2, 1e-1, 5e-2)
    inl = np.asarray(res.inliers)
    assert inl[out].mean() < 0.2  # bad associations rejected


def test_optimize_sim3_refines():
    rng = np.random.default_rng(3)
    xc1, xc2, uv1, uv2, valid, S_gt, out = _make_pair(
        rng, noise=0.3, outlier_frac=0.25
    )
    ones = jnp.ones(len(xc1))
    # perturbed start
    dxi = jnp.asarray([0.05, -0.03, 0.02, 0.01, -0.02, 0.015, 0.03])
    S0 = lie.sim3_exp(dxi).compose(S_gt)
    S, inl, n_inl = sim3_mod.optimize_sim3(
        CAM, CAM, S0, jnp.asarray(xc1), jnp.asarray(xc2), jnp.asarray(uv1),
        jnp.asarray(uv2), ones, ones, jnp.asarray(valid),
    )
    assert int(n_inl) > 60
    _sim3_close(S, S_gt, 1e-2, 3e-2, 2e-2)


def test_optimize_sim3_fix_scale():
    rng = np.random.default_rng(4)
    xc1, xc2, uv1, uv2, valid, S_gt, _ = _make_pair(rng, scale=1.0, noise=0.2)
    ones = jnp.ones(len(xc1))
    S0 = lie.Sim3(S_gt.R, S_gt.t + 0.1, jnp.float32(1.0))
    S, inl, n_inl = sim3_mod.optimize_sim3(
        CAM, CAM, S0, jnp.asarray(xc1), jnp.asarray(xc2), jnp.asarray(uv1),
        jnp.asarray(uv2), ones, ones, jnp.asarray(valid), fix_scale=True,
    )
    assert abs(float(S.s) - 1.0) < 1e-5
    np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=3e-2)
