"""IMU preintegration tests: closed-form motions, bias correction, masking."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.utils import lie

NOISE = pre.ImuNoise.from_continuous(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)


def test_constant_acceleration():
    """Body at rest, accelerating at a in body frame: dV = a t, dP = 0.5 a t^2."""
    n = 200
    dt = 1.0 / 200.0
    a = np.array([0.5, -0.2, 9.81], dtype=np.float32)
    acc = jnp.asarray(np.tile(a, (n, 1)))
    gyro = jnp.zeros((n, 3))
    dts = jnp.full((n,), dt)
    p = pre.preintegrate(acc, gyro, dts, jnp.zeros(6), NOISE)
    t = n * dt
    np.testing.assert_allclose(float(p.dT), t, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p.dV), a * t, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p.dP), 0.5 * a * t * t, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(p.dR), np.eye(3), atol=1e-6)


def test_constant_rotation():
    n = 100
    dt = 1.0 / 200.0
    w = np.array([0.1, 0.7, -0.3], dtype=np.float32)
    acc = jnp.zeros((n, 3))
    gyro = jnp.asarray(np.tile(w, (n, 1)))
    dts = jnp.full((n,), dt)
    p = pre.preintegrate(acc, gyro, dts, jnp.zeros(6), NOISE)
    expected = np.asarray(lie.so3_exp(jnp.asarray(w * n * dt)))
    np.testing.assert_allclose(np.asarray(p.dR), expected, atol=1e-4)


def test_bias_correction_first_order(rng):
    """First-order bias-corrected deltas should approximate full reintegration."""
    n = 100
    dt = 1.0 / 200.0
    acc = jnp.asarray(rng.normal(size=(n, 3)) * 2.0 + np.array([0, 0, 9.81]), dtype=jnp.float32)
    gyro = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, dtype=jnp.float32)
    dts = jnp.full((n,), dt)
    b0 = jnp.zeros(6)
    p0 = pre.preintegrate(acc, gyro, dts, b0, NOISE)
    db = jnp.asarray(rng.normal(size=6) * 0.01, dtype=jnp.float32)
    p1 = pre.preintegrate(acc, gyro, dts, b0 + db, NOISE)  # exact reintegration
    # first-order correction of p0 at new bias
    dR_corr = pre.delta_rotation(p0, b0 + db)
    dV_corr = pre.delta_velocity(p0, b0 + db)
    dP_corr = pre.delta_position(p0, b0 + db)
    np.testing.assert_allclose(np.asarray(dR_corr), np.asarray(p1.dR), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dV_corr), np.asarray(p1.dV), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dP_corr), np.asarray(p1.dP), atol=5e-3)


def test_mask_padding_is_noop(rng):
    n = 64
    acc = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    gyro = jnp.asarray(rng.normal(size=(n, 3)) * 0.2, dtype=jnp.float32)
    dts = jnp.full((n,), 1.0 / 200.0)
    valid = jnp.arange(n) < 40
    p_masked = pre.preintegrate(acc, gyro, dts, jnp.zeros(6), NOISE, valid=valid)
    p_exact = pre.preintegrate(acc[:40], gyro[:40], dts[:40], jnp.zeros(6), NOISE)
    np.testing.assert_allclose(float(p_masked.dT), float(p_exact.dT), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_masked.dR), np.asarray(p_exact.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_masked.dP), np.asarray(p_exact.dP), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_masked.C), np.asarray(p_exact.C), atol=1e-9)


def test_covariance_psd_and_growing(rng):
    n = 200
    acc = jnp.asarray(rng.normal(size=(n, 3)) + np.array([0, 0, 9.81]), dtype=jnp.float32)
    gyro = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, dtype=jnp.float32)
    dts = jnp.full((n,), 1.0 / 200.0)
    p = pre.preintegrate(acc, gyro, dts, jnp.zeros(6), NOISE)
    C = np.asarray(p.C, dtype=np.float64)
    C = 0.5 * (C + C.T)
    eig = np.linalg.eigvalsh(C)
    assert eig.min() > -1e-12
    assert np.trace(C) > 0


def test_predict_state_freefall():
    """No IMU motion (free fall, zero acc in body): p = p0 + v t + 0.5 g t^2."""
    n = 100
    dt = 1.0 / 200.0
    p = pre.preintegrate(jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.full((n,), dt), jnp.zeros(6), NOISE)
    R0 = jnp.eye(3)
    p0 = jnp.asarray([1.0, 2.0, 3.0])
    v0 = jnp.asarray([0.5, 0.0, 0.0])
    R2, p2, v2 = pre.predict_state(R0, p0, v0, p, jnp.zeros(6))
    t = n * dt
    g = np.array([0, 0, -9.81])
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v0) + g * t, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(p0) + np.asarray(v0) * t + 0.5 * g * t * t, rtol=1e-4
    )
