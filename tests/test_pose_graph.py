"""Essential-graph (Sim3 / 4-DoF pose graph) tests: a drifted loop snaps back
once the loop-closure edge is added (OptimizeEssentialGraph contract)."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.optim import pose_graph as pg
from orb_slam3_fast_tpu.utils import lie


def _circle_gt(K, radius=5.0):
    """Ground-truth camera-from-world poses on a circle, camera looking along
    the tangent."""
    Rs, ts = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        # world->cam: rotate by -a about z then translate
        c, s = np.cos(a), np.sin(a)
        Rwc = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        cw = np.array([radius * c, radius * s, 0], np.float32)  # camera center
        R = Rwc.T
        t = -R @ cw
        Rs.append(R)
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


def _rel_sim3(Ri, ti, si, Rj, tj, sj):
    """S_ij = S_iw * S_jw^-1 (numpy)."""
    R = Ri @ Rj.T
    s = si / sj
    t = -s * (R @ (tj / sj)) + ti
    return R, t, s


def _build_drifted(K, rot_noise=0.01, t_noise=0.02, s_drift=1.01, seed=0, yaw_only=False):
    rng = np.random.default_rng(seed)
    R_gt, t_gt = _circle_gt(K)
    s_gt = np.ones(K, np.float32)
    # odometry measurements: noisy true relatives with scale drift
    meas = []
    for k in range(K - 1):
        R, t, s = _rel_sim3(R_gt[k + 1], t_gt[k + 1], 1.0, R_gt[k], t_gt[k], 1.0)
        w = rng.normal(0, rot_noise, 3).astype(np.float32)
        if yaw_only:
            w[:2] = 0.0  # drift only about gravity, the 4-DoF-correctable gauge
        dR = np.asarray(lie.so3_exp(jnp.asarray(w)))
        meas.append((dR @ R, t + rng.normal(0, t_noise, 3).astype(np.float32), s * s_drift))
    # integrate odometry -> drifted estimates
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    s_est = [1.0]
    for k in range(K - 1):
        R, t, s = meas[k]  # S_{k+1,k}
        R_est.append(R @ R_est[k])
        t_est.append(s * (R @ t_est[k]) + t)
        s_est.append(s * s_est[k])
    return (np.stack(R_est), np.stack(t_est), np.asarray(s_est, np.float32),
            R_gt, t_gt, s_gt, meas)


def _ate(R_est, t_est, s_est, R_gt, t_gt):
    c_est = -np.einsum("kji,kj->ki", R_est, t_est) / s_est[:, None]
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    return np.sqrt(((c_est - c_gt) ** 2).sum(-1).mean())


def test_sim3_graph_closes_loop():
    K = 40
    R0, t0, s0, R_gt, t_gt, s_gt, meas = _build_drifted(K)
    ate_before = _ate(R0, t0, s0, R_gt, t_gt)
    # edges: odometry chain (i=k+1, j=k) + exact loop edge (0, K-1)
    E = K + 8
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    mR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    mt = np.zeros((E, 3), np.float32)
    ms = np.ones(E, np.float32)
    ev = np.zeros(E, bool)
    for k in range(K - 1):
        ei[k], ej[k] = k + 1, k
        mR[k], mt[k], ms[k] = meas[k]
        ev[k] = True
    # loop edge with the TRUE relative Sim3 (what Sim3Solver would return)
    R, t, s = _rel_sim3(R_gt[0], t_gt[0], 1.0, R_gt[K - 1], t_gt[K - 1], 1.0)
    ei[K - 1], ej[K - 1] = 0, K - 1
    mR[K - 1], mt[K - 1], ms[K - 1] = R, t, s
    ev[K - 1] = True
    fixed = np.zeros(K, bool)
    fixed[0] = True
    g = pg.Sim3Graph(
        R=jnp.asarray(R0), t=jnp.asarray(t0), s=jnp.asarray(s0),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_R=jnp.asarray(mR), meas_t=jnp.asarray(mt), meas_s=jnp.asarray(ms),
        edge_valid=jnp.asarray(ev), fixed=jnp.asarray(fixed),
        edge_w=jnp.ones(E),
    )
    Rn, tn, sn = pg.optimize_sim3_graph(g, iters=15)
    ate_after = _ate(np.asarray(Rn), np.asarray(tn), np.asarray(sn), R_gt, t_gt)
    assert ate_before > 0.5, f"test setup: drift too small ({ate_before})"
    assert ate_after < 0.25 * ate_before, f"{ate_before:.3f} -> {ate_after:.3f}"
    # scale drift removed: the last KF's scale must return near 1
    assert abs(float(sn[-1]) - 1.0) < 0.05


def test_4dof_graph_closes_loop():
    K = 30
    R0, t0, s0, R_gt, t_gt, s_gt, meas = _build_drifted(
        K, rot_noise=0.015, t_noise=0.02, s_drift=1.0, seed=1, yaw_only=True
    )
    ate_before = _ate(R0, t0, s0, R_gt, t_gt)
    E = K + 4
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    mR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    mt = np.zeros((E, 3), np.float32)
    ev = np.zeros(E, bool)
    # Edge4DoF convention: e = log(T_ij * T_jw * T_iw^-1) -> measurement is
    # T_ij mapping j-cam to i-cam
    for k in range(K - 1):
        ei[k], ej[k] = k + 1, k
        R, t, _ = meas[k]
        mR[k], mt[k] = R, t
        ev[k] = True
    R, t, _ = _rel_sim3(R_gt[0], t_gt[0], 1.0, R_gt[K - 1], t_gt[K - 1], 1.0)
    ei[K - 1], ej[K - 1] = 0, K - 1
    mR[K - 1], mt[K - 1] = R, t
    ev[K - 1] = True
    fixed = np.zeros(K, bool)
    fixed[0] = True
    g = pg.SE3Graph(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_R=jnp.asarray(mR), meas_t=jnp.asarray(mt),
        edge_valid=jnp.asarray(ev), fixed=jnp.asarray(fixed), edge_w=jnp.ones(E),
    )
    Rn, tn = pg.optimize_4dof_graph(g, iters=15)
    ate_after = _ate(np.asarray(Rn), np.asarray(tn), np.ones(K), R_gt, t_gt)
    assert ate_before > 0.2
    assert ate_after < 0.3 * ate_before, f"{ate_before:.3f} -> {ate_after:.3f}"


def test_correct_landmarks_preserves_camera_frame():
    rng = np.random.default_rng(2)
    K, M = 8, 50
    R_old = np.stack([np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.3, 3).astype(np.float32)))) for _ in range(K)])
    t_old = rng.normal(0, 1, (K, 3)).astype(np.float32)
    s_old = np.exp(rng.normal(0, 0.1, K)).astype(np.float32)
    R_new = np.stack([np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.3, 3).astype(np.float32)))) for _ in range(K)])
    t_new = rng.normal(0, 1, (K, 3)).astype(np.float32)
    s_new = np.exp(rng.normal(0, 0.1, K)).astype(np.float32)
    lm = rng.normal(0, 5, (M, 3)).astype(np.float32)
    ref = rng.integers(0, K, M)
    out = np.asarray(pg.correct_landmarks(
        jnp.asarray(lm), jnp.asarray(ref), jnp.asarray(R_old), jnp.asarray(t_old),
        jnp.asarray(s_old), jnp.asarray(R_new), jnp.asarray(t_new), jnp.asarray(s_new),
    ))
    # invariant: S_new(x') == S_old(x) (same camera-frame coordinates)
    for m in range(M):
        k = ref[m]
        xc_old = s_old[k] * (R_old[k] @ lm[m]) + t_old[k]
        xc_new = s_new[k] * (R_new[k] @ out[m]) + t_new[k]
        np.testing.assert_allclose(xc_new, xc_old, atol=1e-4)


# ---------------------------------------------------------------------------
# implicit-CG path (r4 verdict weak #6: the essential graph must scale past
# the dense (K,K,7,7) Hessian — Optimizer.cc:1518-1827 runs over ALL KFs)
# ---------------------------------------------------------------------------


def _sim3_graph_from_drift(K, loop=True, seed=0):
    R0, t0, s0, R_gt, t_gt, s_gt, meas = _build_drifted(K, seed=seed)
    E = K + 8
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    mR = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    mt = np.zeros((E, 3), np.float32)
    ms = np.ones(E, np.float32)
    ev = np.zeros(E, bool)
    for k in range(K - 1):
        ei[k], ej[k] = k + 1, k
        mR[k], mt[k], ms[k] = meas[k]
        ev[k] = True
    if loop:
        R, t, s = _rel_sim3(R_gt[0], t_gt[0], 1.0, R_gt[K - 1], t_gt[K - 1], 1.0)
        ei[K - 1], ej[K - 1] = 0, K - 1
        mR[K - 1], mt[K - 1], ms[K - 1] = R, t, s
        ev[K - 1] = True
    fixed = np.zeros(K, bool)
    fixed[0] = True
    g = pg.Sim3Graph(
        R=jnp.asarray(R0), t=jnp.asarray(t0), s=jnp.asarray(s0),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_R=jnp.asarray(mR), meas_t=jnp.asarray(mt), meas_s=jnp.asarray(ms),
        edge_valid=jnp.asarray(ev), fixed=jnp.asarray(fixed), edge_w=jnp.ones(E),
    )
    return g, R0, t0, s0, R_gt, t_gt


def test_sim3_graph_cg_matches_dense():
    """The PCG solve path must reach the same optimum as the dense solve on
    an identical (small) graph."""
    g, R0, t0, s0, R_gt, t_gt = _sim3_graph_from_drift(40)
    Rd, td, sd = pg.optimize_sim3_graph(g, iters=15)
    try:
        pg._FORCE_CG = True
        pg.optimize_sim3_graph.clear_cache()
        Rc, tc, sc = pg.optimize_sim3_graph(g, iters=15)
    finally:
        pg._FORCE_CG = False
        pg.optimize_sim3_graph.clear_cache()
    ate_d = _ate(np.asarray(Rd), np.asarray(td), np.asarray(sd), R_gt, t_gt)
    ate_c = _ate(np.asarray(Rc), np.asarray(tc), np.asarray(sc), R_gt, t_gt)
    assert ate_c < max(1.1 * ate_d, 0.02), (ate_d, ate_c)
    assert abs(float(sc[-1]) - 1.0) < 0.05


import pytest  # noqa: E402


@pytest.mark.slow
def test_sim3_graph_scales_to_2048_kfs():
    """At 2048 vertices the dense Hessian would be (14336)^2 floats (~820 MB)
    + an O((7K)^3) solve; the implicit path must close the loop in bounded
    memory (per-edge blocks only)."""
    K = 2048
    g, R0, t0, s0, R_gt, t_gt = _sim3_graph_from_drift(
        K, seed=3
    )
    ate_before = _ate(R0, t0, s0, R_gt, t_gt)
    Rn, tn, sn = pg.optimize_sim3_graph(g, iters=15)
    ate_after = _ate(np.asarray(Rn), np.asarray(tn), np.asarray(sn), R_gt, t_gt)
    assert ate_before > 0.5
    assert ate_after < 0.25 * ate_before, f"{ate_before:.3f} -> {ate_after:.3f}"
    assert abs(float(sn[-1]) - 1.0) < 0.1
