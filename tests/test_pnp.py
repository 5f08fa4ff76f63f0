"""PnP RANSAC tests (relocalization solver, MLPnPsolver equivalent)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import pnp
from orb_slam3_fast_tpu.utils import lie

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)


def _scene(rng, n=200, outlier_frac=0.0, noise=0.0):
    xw = np.stack(
        [rng.uniform(-6, 6, n), rng.uniform(-4, 4, n), rng.uniform(4, 20, n)], axis=1
    ).astype(np.float32)
    rvec = np.array([0.05, -0.1, 0.03], np.float32)
    T = lie.se3_exp(jnp.asarray(np.concatenate([rvec, [0.3, -0.2, 0.5]])))
    xc = np.asarray(T.apply(jnp.asarray(xw)))
    uv = np.array(cam_models.project(CAM, jnp.asarray(xc)))
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    out_ids = rng.choice(n, n_out, replace=False)
    uv[out_ids] = rng.uniform((0, 0), (640, 480), (n_out, 2)).astype(np.float32)
    valid = (xc[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
    return xw, uv.astype(np.float32), valid, np.asarray(T.R), np.asarray(T.t), out_ids


def _run(rng_seed, **kw):
    rng = np.random.default_rng(rng_seed)
    xw, uv, valid, R_gt, t_gt, out_ids = _scene(rng, **kw)
    res = pnp.pnp_ransac(
        CAM,
        jnp.asarray(xw),
        jnp.asarray(uv),
        jnp.ones(len(xw)),
        jnp.asarray(valid),
        jax.random.PRNGKey(0),
    )
    return res, R_gt, t_gt, out_ids, valid


def test_pnp_clean():
    res, R_gt, t_gt, _, _ = _run(0)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=5e-3)


def test_pnp_outliers():
    res, R_gt, t_gt, out_ids, valid = _run(1, outlier_frac=0.4, noise=0.3)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=8e-2)
    # outliers rejected
    inl = np.asarray(res.inliers)
    assert inl[out_ids].mean() < 0.2


def test_pnp_too_few_points():
    rng = np.random.default_rng(2)
    xw, uv, valid, *_ = _scene(rng, n=64)
    valid = valid & (np.arange(64) < 5)  # below minimal set
    res = pnp.pnp_ransac(
        CAM, jnp.asarray(xw), jnp.asarray(uv), jnp.ones(64), jnp.asarray(valid),
        jax.random.PRNGKey(0),
    )
    assert not bool(res.ok)


def test_pnp_fisheye():
    """Camera-generic path: same solver through a KB8 fisheye model."""
    rng = np.random.default_rng(3)
    cam = cam_models.Camera.kb8(280.0, 280.0, 320.0, 240.0, 0.08, 0.01, -0.003, 0.0005)
    n = 150
    xw = np.stack(
        [rng.uniform(-8, 8, n), rng.uniform(-6, 6, n), rng.uniform(3, 15, n)], axis=1
    ).astype(np.float32)
    T = lie.se3_exp(jnp.asarray([0.02, 0.05, -0.01, 0.1, 0.05, -0.2]))
    xc = np.asarray(T.apply(jnp.asarray(xw)))
    uv = np.asarray(cam_models.project(cam, jnp.asarray(xc)))
    valid = (xc[:, 2] > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    res = pnp.pnp_ransac(
        cam, jnp.asarray(xw), jnp.asarray(uv), jnp.ones(n), jnp.asarray(valid),
        jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(T.R), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(T.t), atol=2e-2)
