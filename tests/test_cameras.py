"""Camera model tests (project/unproject consistency, jacobians)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam


def euroc_pinhole():
    # EuRoC cam0 intrinsics (Examples/Monocular/EuRoC.yaml)
    return cam.Camera.pinhole(
        458.654, 457.296, 367.215, 248.375, dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0)
    )


def tumvi_kb8():
    # TUM-VI 512 fisheye intrinsics (Examples/Monocular-Inertial/TUM_512.yaml)
    return cam.Camera.kb8(
        190.978477, 190.973307, 254.931706, 256.897442,
        0.003482389402, 0.000715034845, -0.002053236141, 0.000202936736,
    )


def random_points(rng, n, depth=(0.5, 10.0), spread=0.6):
    z = rng.uniform(*depth, size=n)
    x = rng.uniform(-spread, spread, size=n) * z
    y = rng.uniform(-spread, spread, size=n) * z
    return jnp.asarray(np.stack([x, y, z], -1), dtype=jnp.float32)


def test_pinhole_project_unproject_roundtrip(rng):
    c = euroc_pinhole()
    xc = random_points(rng, 200)
    uv = cam.project(c, xc)
    ray = cam.unproject(c, uv)
    # ray is [x/z, y/z, 1]
    expected = np.asarray(xc) / np.asarray(xc[..., 2:])
    np.testing.assert_allclose(np.asarray(ray), expected, atol=2e-3)


def test_pinhole_no_distortion_is_linear(rng):
    c = cam.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
    xc = random_points(rng, 50)
    uv = cam.project(c, xc)
    expected_u = 400.0 * np.asarray(xc[:, 0] / xc[:, 2]) + 320.0
    np.testing.assert_allclose(np.asarray(uv[:, 0]), expected_u, rtol=1e-5)


def test_kb8_project_unproject_roundtrip(rng):
    c = tumvi_kb8()
    # wide FoV points
    xc = random_points(rng, 200, spread=1.5)
    uv = cam.project(c, xc)
    ray = cam.unproject(c, uv)
    expected = np.asarray(xc) / np.asarray(xc[..., 2:])
    np.testing.assert_allclose(np.asarray(ray), expected, atol=5e-3)


def test_project_jac_matches_fd(rng):
    for c in [euroc_pinhole(), tumvi_kb8()]:
        xc = random_points(rng, 20)
        J = cam.project_jac(c, xc)
        eps = 1e-3
        for k in range(3):
            d = np.zeros(3, dtype=np.float32)
            d[k] = eps
            fd = (np.asarray(cam.project(c, xc + d)) - np.asarray(cam.project(c, xc - d))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[..., k]), fd, rtol=2e-2, atol=2e-2)


def test_stereo_project(rng):
    c = cam.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
    xc = random_points(rng, 10)
    bf = jnp.float32(400.0 * 0.11)  # EuRoC-ish baseline
    obs = cam.stereo_project(c, xc, bf)
    disparity = np.asarray(obs[:, 0] - obs[:, 2])
    np.testing.assert_allclose(disparity, float(bf) / np.asarray(xc[:, 2]), rtol=1e-4)


def test_jit_vmap(rng):
    c = tumvi_kb8()
    xc = random_points(rng, 64)
    f = jax.jit(lambda x: cam.project(c, x))
    np.testing.assert_allclose(np.asarray(f(xc)), np.asarray(cam.project(c, xc)), rtol=1e-6)
    g = jax.vmap(lambda x: cam.project(c, x))(xc)
    np.testing.assert_allclose(np.asarray(g), np.asarray(cam.project(c, xc)), rtol=1e-6)


def test_camera_is_pytree():
    c = euroc_pinhole()
    c2 = jax.tree.map(lambda x: x, c)
    assert c2.kind == c.kind
    leaves = jax.tree.leaves(c)
    assert len(leaves) == 1
