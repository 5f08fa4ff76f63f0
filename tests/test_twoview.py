"""Two-view reconstruction tests: general scene (F path) and planar scene (H path)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.ops import twoview
from orb_slam3_fast_tpu.utils import lie

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)


def project_pair(xw, T10):
    uv0 = cam_models.project(CAM, jnp.asarray(xw))
    x1 = T10.apply(jnp.asarray(xw))
    uv1 = cam_models.project(CAM, x1)
    return np.array(uv0), np.array(uv1)


def make_general_scene(rng, n=300, noise=0.3):
    xw = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], -1
    ).astype(np.float32)
    T10 = lie.se3_exp(jnp.asarray([0.8, 0.05, 0.02, 0.01, -0.06, 0.01]))  # baseline 0.8
    uv0, uv1 = project_pair(xw, T10)
    uv0 += rng.normal(0, noise, uv0.shape)
    uv1 += rng.normal(0, noise, uv1.shape)
    inb = (
        (uv0[:, 0] > 0) & (uv0[:, 0] < 640) & (uv0[:, 1] > 0) & (uv0[:, 1] < 480)
        & (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
    )
    return xw, T10, uv0, uv1, inb


def rot_err_deg(R_est, R_gt):
    dR = np.asarray(R_est) @ np.asarray(R_gt).T
    c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(c))


def dir_err_deg(t_est, t_gt):
    a = np.asarray(t_est) / np.linalg.norm(t_est)
    b = np.asarray(t_gt) / np.linalg.norm(t_gt)
    return np.degrees(np.arccos(np.clip(np.abs(a @ b), -1, 1)))


def test_general_scene_f_model(rng):
    xw, T10, uv0, uv1, inb = make_general_scene(rng)
    res = twoview.reconstruct(
        CAM, jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(inb), jax.random.PRNGKey(0)
    )
    assert bool(res.success), f"init failed; good={int(res.good.sum())}"
    assert not bool(res.used_h)
    assert rot_err_deg(res.R, T10.R) < 1.0
    assert dir_err_deg(res.t, T10.t) < 2.0
    # triangulated structure: scale-normalized comparison
    good = np.asarray(res.good)
    assert good.sum() > 150
    X = np.asarray(res.X)[good]
    scale = np.median(np.linalg.norm(X, axis=1) / np.linalg.norm(xw[good], axis=1))
    err = np.linalg.norm(X / scale - xw[good], axis=1)
    assert np.median(err) < 0.2, f"structure err {np.median(err)}"


def test_planar_scene_h_model(rng):
    n = 300
    # points on the z=8 plane
    xw = np.stack(
        [rng.uniform(-5, 5, n), rng.uniform(-4, 4, n), np.full(n, 8.0)], -1
    ).astype(np.float32)
    T10 = lie.se3_exp(jnp.asarray([0.6, 0.1, 0.05, 0.02, -0.04, 0.02]))
    uv0, uv1 = project_pair(xw, T10)
    uv0 += rng.normal(0, 0.2, uv0.shape)
    uv1 += rng.normal(0, 0.2, uv1.shape)
    inb = (
        (uv0[:, 0] > 0) & (uv0[:, 0] < 640) & (uv0[:, 1] > 0) & (uv0[:, 1] < 480)
        & (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
    )
    res = twoview.reconstruct(
        CAM, jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(inb), jax.random.PRNGKey(1)
    )
    assert bool(res.used_h), "planar scene must select the H model"
    assert bool(res.success)
    assert rot_err_deg(res.R, T10.R) < 1.5
    assert dir_err_deg(res.t, T10.t) < 3.0


def test_pure_rotation_rejected(rng):
    """Pure rotation (no baseline): must NOT report success (no parallax)."""
    n = 300
    xw = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(5, 15, n)], -1
    ).astype(np.float32)
    T10 = lie.se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, -0.05, 0.01]))
    uv0, uv1 = project_pair(xw, T10)
    uv0 += rng.normal(0, 0.3, uv0.shape)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    inb = np.ones(n, dtype=bool)
    res = twoview.reconstruct(
        CAM, jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(inb), jax.random.PRNGKey(2)
    )
    assert not bool(res.success)


def test_triangulate_dlt_exact(rng):
    xw = np.stack(
        [rng.uniform(-2, 2, 50), rng.uniform(-2, 2, 50), rng.uniform(4, 10, 50)], -1
    ).astype(np.float32)
    T10 = lie.se3_exp(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.02, 0.0]))
    P0 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    P1 = np.concatenate([np.asarray(T10.R), np.asarray(T10.t)[:, None]], 1).astype(np.float32)
    x0 = xw[:, :2] / xw[:, 2:]
    xc1 = xw @ np.asarray(T10.R).T + np.asarray(T10.t)
    x1 = xc1[:, :2] / xc1[:, 2:]
    X = twoview.triangulate_dlt(jnp.asarray(P0), jnp.asarray(P1), jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(X), xw, atol=1e-2)
