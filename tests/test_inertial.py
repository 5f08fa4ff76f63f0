"""Inertial factor + IMU initialization tests on simulated trajectories."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.optim import imu_init, inertial
from orb_slam3_fast_tpu.utils import lie

NOISE = pre.ImuNoise.from_continuous(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)


def simulate_trajectory(rng, n_kf=8, hz=200.0, kf_dt=0.25, gyro_bias=None, acc_bias=None):
    """Body flies with sinusoidal acceleration and yaw rate; returns per-KF
    states and the IMU measurements between consecutive KFs."""
    steps_per_kf = int(kf_dt * hz)
    dt = 1.0 / hz
    g = np.array([0.0, 0.0, -9.81])
    bg = np.zeros(3) if gyro_bias is None else gyro_bias
    ba = np.zeros(3) if acc_bias is None else acc_bias
    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.3, 0.0, 0.0])
    states = [(R.copy(), p.copy(), v.copy())]
    segments = []
    t = 0.0
    for k in range(n_kf - 1):
        acc_list, gyr_list = [], []
        for i in range(steps_per_kf):
            a_w = np.array(
                [0.4 * np.sin(2 * t), 0.3 * np.cos(1.5 * t), 0.2 * np.sin(t)]
            )
            w_b = np.array([0.05 * np.sin(t), 0.08 * np.cos(2 * t), 0.3])
            acc_meas = R.T @ (a_w - g) + ba
            gyr_meas = w_b + bg
            acc_list.append(acc_meas)
            gyr_list.append(gyr_meas)
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b * dt)))
            t += dt
        states.append((R.copy(), p.copy(), v.copy()))
        segments.append((np.asarray(acc_list, np.float32), np.asarray(gyr_list, np.float32)))
    return states, segments, dt


def preintegrate_segments(segments, dt, bias=None):
    b = jnp.zeros(6) if bias is None else jnp.asarray(bias)
    ps = []
    for acc, gyr in segments:
        n = len(acc)
        ps.append(pre.preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.full((n,), dt), b, NOISE))
    return jax.tree.map(lambda *a: jnp.stack(a), *ps)


def test_inertial_residual_zero_at_truth(rng):
    states, segments, dt = simulate_trajectory(rng)
    preints = preintegrate_segments(segments, dt)
    for i in range(len(segments)):
        si = inertial.BodyState(
            jnp.asarray(states[i][0]), jnp.asarray(states[i][1]), jnp.asarray(states[i][2]), jnp.zeros(6)
        )
        sj = inertial.BodyState(
            jnp.asarray(states[i + 1][0]), jnp.asarray(states[i + 1][1]), jnp.asarray(states[i + 1][2]), jnp.zeros(6)
        )
        r = inertial.inertial_residual(si, sj, jax.tree.map(lambda a: a[i], preints))
        assert np.abs(np.asarray(r)).max() < 5e-3, f"edge {i}: {r}"


def test_pose_inertial_optimization_recovers_state(rng):
    states, segments, dt = simulate_trajectory(rng, n_kf=2)
    preints = preintegrate_segments(segments, dt)
    preint = jax.tree.map(lambda a: a[0], preints)
    s_prev = inertial.BodyState(
        jnp.asarray(states[0][0]), jnp.asarray(states[0][1]), jnp.asarray(states[0][2]), jnp.zeros(6)
    )
    s_true = inertial.BodyState(
        jnp.asarray(states[1][0]), jnp.asarray(states[1][1]), jnp.asarray(states[1][2]), jnp.zeros(6)
    )
    # visual observations of random landmarks from the true pose (body=camera)
    n = 150
    xw = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n)], -1).astype(np.float32)
    T_cb = lie.SE3.identity()
    R_bw = np.asarray(s_true.R).T
    xc = (xw - np.asarray(s_true.p)) @ R_bw.T
    uv = np.array(cam_models.project(CAM, jnp.asarray(xc)))
    uv += rng.normal(0, 0.3, uv.shape)
    obs = inertial.VIObs(
        xw=jnp.asarray(xw),
        uv=jnp.asarray(np.concatenate([uv, -np.ones((n, 1))], -1).astype(np.float32)),
        inv_sigma2=jnp.ones(n),
        is_stereo=jnp.zeros(n, bool),
        valid=jnp.ones(n, bool),
    )
    # start from the IMU prediction with a perturbation
    s0 = inertial.BodyState(
        s_true.R @ lie.so3_exp(jnp.asarray([0.02, -0.01, 0.015])),
        s_true.p + jnp.asarray([0.05, -0.03, 0.02]),
        s_true.v + jnp.asarray([0.1, 0.05, -0.05]),
        jnp.zeros(6),
    )
    s, inl, n_inl, H = inertial.pose_inertial_optimization(
        CAM, jnp.float32(0.0), T_cb, s_prev, preint, s0, obs
    )
    assert int(n_inl) > 140
    assert np.abs(np.asarray(s.p) - np.asarray(s_true.p)).max() < 0.01
    assert np.abs(np.asarray(s.R) - np.asarray(s_true.R)).max() < 2e-3
    assert np.abs(np.asarray(s.v) - np.asarray(s_true.v)).max() < 0.05
    # the returned marginal must be a usable prior: finite, symmetric, PSD-ish
    H = np.asarray(H)
    assert np.isfinite(H).all() and H.shape == (15, 15)
    assert np.abs(H - H.T).max() < 1e-3
    assert np.linalg.eigvalsh(H).min() > -1e-2

    # the LastFrame variant (previous state FREE under a prior,
    # PoseInertialOptimizationLastFrame Optimizer.cc:4933) must solve the
    # same problem to the same answer when the prior pins the previous state
    prior = inertial.PriorState(state=s_prev, H=jnp.asarray(1e4 * np.eye(15, dtype=np.float32)))
    s2, inl2, n2, H2 = inertial.pose_inertial_optimization_last_frame(
        CAM, jnp.float32(0.0), T_cb, s_prev, prior, preint, s0, obs
    )
    assert int(n2) > 140
    assert np.abs(np.asarray(s2.p) - np.asarray(s_true.p)).max() < 0.02
    H2 = np.asarray(H2)
    assert np.isfinite(H2).all() and H2.shape == (15, 15)
    assert np.linalg.eigvalsh(0.5 * (H2 + H2.T)).min() > -1e-2


def test_imu_init_recovers_gravity_scale_bias(rng):
    bg = np.array([0.02, -0.01, 0.015])
    ba = np.array([0.05, 0.08, -0.06])
    states, segments, dt = simulate_trajectory(rng, n_kf=10, gyro_bias=bg, acc_bias=ba)
    preints = preintegrate_segments(segments, dt)
    # visual SLAM provides poses in a rotated, scaled world:
    true_scale = 3.0
    rot = np.asarray(lie.so3_exp(jnp.asarray([0.15, -0.1, 0.0])))  # world tilt
    R_wb = np.stack([rot @ s[0] for s in states])
    p_wb = np.stack([rot @ s[1] / true_scale for s in states]).astype(np.float32)
    # refinement-stage priors (the default priorA=1e6 deliberately pins the
    # weakly-observable acc bias on the FIRST init, LocalMapping.cc:1244)
    init = imu_init.inertial_only_optimization(
        jnp.asarray(R_wb.astype(np.float32)), jnp.asarray(p_wb), preints,
        prior_gyro=1e-2, prior_acc=1e-2,
    )
    # recovered scale
    assert abs(float(init.scale) - true_scale) / true_scale < 0.02, float(init.scale)
    # gravity direction: g_est = Rwg @ gI must match rot @ [0,0,-g]
    g_est = np.asarray(init.Rwg) @ np.array([0, 0, -9.81])
    g_true = rot @ np.array([0, 0, -9.81])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.9995, f"gravity angle {np.degrees(np.arccos(cos)):.2f} deg"
    # biases
    assert np.abs(np.asarray(init.bias[:3]) - bg).max() < 5e-3
    assert np.abs(np.asarray(init.bias[3:]) - ba).max() < 0.05
    # velocities (scaled-world: v_world_est = rot @ v_true / s... the GS edge
    # estimates velocities in the *visual* frame scaled by s)
    v_true0 = rot @ states[0][2] / true_scale
    assert np.abs(np.asarray(init.vel[0]) - v_true0).max() < 0.05


def test_scale_gravity_refinement(rng):
    """ScaleRefinement: with velocities/poses frozen at a slightly mis-scaled
    state, the (gravity, scale) polish must recover the residual scale."""
    states, segments, dt = simulate_trajectory(rng, n_kf=10)
    preints = preintegrate_segments(segments, dt)
    resid_scale = 1.08  # map is 8% too small after the first init
    R_wb = np.stack([s[0] for s in states]).astype(np.float32)
    p_wb = np.stack([s[1] / resid_scale for s in states]).astype(np.float32)
    vel = np.stack([s[2] / resid_scale for s in states]).astype(np.float32)
    Rwg, s = imu_init.scale_gravity_refinement(
        jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(vel),
        jnp.zeros(6), preints,
    )
    assert abs(float(s) - resid_scale) < 0.01, float(s)
    g_est = np.asarray(Rwg) @ np.array([0, 0, -9.81])
    cos = g_est @ np.array([0, 0, -9.81]) / (np.linalg.norm(g_est) * 9.81)
    assert cos > 0.9995
