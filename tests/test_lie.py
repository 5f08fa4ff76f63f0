"""Unit tests for the Lie-group module (SURVEY.md §7 step 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.utils import lie


def random_rotvec(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, dtype=jnp.float32)


def test_hat_vee_roundtrip(rng):
    w = random_rotvec(rng, 16)
    np.testing.assert_allclose(lie.vee(lie.hat(w)), w, rtol=1e-6)


def test_so3_exp_is_rotation(rng):
    w = random_rotvec(rng, 32)
    R = lie.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-6, 1e-3, 0.5, 2.0]:
        w = random_rotvec(rng, 64, scale)
        # keep |w| < pi so log is unique
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = jnp.where(norm > 3.0, w * (3.0 / norm), w)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=5e-4)


def test_so3_log_near_pi(rng):
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    for angle in [np.pi - 1e-4, np.pi - 1e-2]:
        w = jnp.asarray(axis * angle, dtype=jnp.float32)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        # axis sign may flip at pi; compare rotations not tangents
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_right_jacobian_finite_diff(rng):
    """Jr satisfies exp(w+dw) ~ exp(w) exp(Jr(w) dw)."""
    w = random_rotvec(rng, 8, 0.7)
    dw = random_rotvec(rng, 8, 1e-4)
    lhs = lie.so3_exp(w + dw)
    Jr = lie.so3_right_jacobian(w)
    rhs = lie.so3_exp(w) @ lie.so3_exp(jnp.einsum("...ij,...j->...i", Jr, dw))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_right_jacobian_inverse(rng):
    w = random_rotvec(rng, 16, 1.2)
    J = lie.so3_right_jacobian(w)
    Jinv = lie.so3_right_jacobian_inv(w)
    eye = jnp.broadcast_to(jnp.eye(3), J.shape)
    np.testing.assert_allclose(np.asarray(J @ Jinv), np.asarray(eye), atol=1e-5)


def test_se3_compose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    Tinv = T.inverse()
    TT = T.compose(Tinv)
    np.testing.assert_allclose(np.asarray(TT.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(TT.t), 0.0, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)) * 0.8, dtype=jnp.float32)
    xi2 = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_apply_matches_matrix(rng):
    xi = jnp.asarray(rng.normal(size=(4, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    x = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    M = T.matrix()
    xh = jnp.concatenate([x, jnp.ones((4, 1))], axis=-1)
    np.testing.assert_allclose(
        np.asarray(T.apply(x)), np.asarray(jnp.einsum("...ij,...j->...i", M, xh)[..., :3]), atol=1e-5
    )


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, dtype=jnp.float32)
    S = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(S)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_sim3_compose_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
    S = lie.sim3_exp(xi)
    I = S.compose(S.inverse())
    np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)


def test_sim3_zero_rotation(rng):
    """Small/zero rotation limits of sim3_exp must be finite and correct."""
    xi = jnp.zeros((1, 7), dtype=jnp.float32)
    xi = xi.at[0, :3].set(jnp.asarray([1.0, 2.0, 3.0]))
    xi = xi.at[0, 6].set(0.3)
    S = lie.sim3_exp(xi)
    assert np.all(np.isfinite(np.asarray(S.t)))
    np.testing.assert_allclose(np.asarray(S.s), np.exp(0.3), rtol=1e-5)
    # with zero rotation: t = (e^sigma - 1)/sigma * rho
    expected = (np.exp(0.3) - 1.0) / 0.3 * np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(S.t[0]), expected, rtol=1e-4)


def test_jit_and_grad_safe(rng):
    """exp/log must be differentiable without NaNs (where-branch trap)."""
    w = random_rotvec(rng, 4, 0.5)

    def f(w):
        return jnp.sum(lie.so3_log(lie.so3_exp(w)) ** 2)

    g = jax.grad(f)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(f)(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_normalize_rotation(rng):
    w = random_rotvec(rng, 8)
    R = lie.so3_exp(w) + jnp.asarray(rng.normal(size=(8, 3, 3)) * 1e-3, dtype=jnp.float32)
    Rn = lie.normalize_rotation(R)
    eye = np.broadcast_to(np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(np.asarray(Rn @ jnp.swapaxes(Rn, -1, -2)), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(Rn)), 1.0, atol=1e-5)


def test_sim3_exp_fuzz_vs_expm():
    """sim3_exp must stay accurate across tangent magnitudes 1e-7..3 in f32
    (regression: the naive closed-form Ws coefficients cancel catastrophically
    for small theta/sigma and once produced |t| errors > 1 for |xi| ~ 5e-4)."""
    import jax.numpy as jnp
    import scipy.linalg as sla

    from orb_slam3_fast_tpu.utils import lie

    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(500):
        scale = 10 ** rng.uniform(-7, 0.5)
        xi = rng.normal(0, scale, 7).astype(np.float32)
        if np.linalg.norm(xi[3:6]) > 3.1:
            continue
        S = lie.sim3_exp(jnp.asarray(xi))
        G = np.zeros((4, 4))
        phi, sig = xi[3:6], xi[6]
        G[:3, :3] = np.array(
            [[sig, -phi[2], phi[1]], [phi[2], sig, -phi[0]], [-phi[1], phi[0], sig]]
        )
        G[:3, 3] = xi[:3]
        M = sla.expm(G.astype(np.float64))
        terr = np.abs(np.asarray(S.t) - M[:3, 3]).max() / max(np.abs(M[:3, 3]).max(), 1e-3)
        xi2 = np.asarray(lie.sim3_log(S))
        rt = np.abs(xi2 - xi).max() / max(np.abs(xi).max(), 1e-4)
        worst = max(worst, terr, rt)
    assert worst < 3e-3, f"sim3 exp/log worst rel err {worst}"
