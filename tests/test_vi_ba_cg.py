"""FullInertialBA via implicit-Schur CG (optim/vi_ba_cg.py).

Covers the round-4 verdict's missing #2: the inertial GLOBAL bundle
adjustment must (a) cover all keyframes/landmarks/observations with no caps
(Optimizer.cc:374-780), (b) poll the abort flag between host segments
(mbStopGBA, LoopClosing.cc:1072-1086), and (c) hold the map lock around
gather and write-back when dispatched on the GBA thread (the race the r4
advisor flagged on the windowed fallback).
"""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.pipeline import AsyncBackend
from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import vi_tracker as vi_trk
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.optim import vi_ba, vi_ba_cg
from orb_slam3_fast_tpu.utils import lie
from tests.test_inertial import CAM, NOISE, simulate_trajectory, preintegrate_segments
from tests.test_vi_ba import build_vi_problem


def test_full_inertial_ba_cg_matches_dense(rng):
    """On a window-sized problem the CG engine must converge like the dense
    solver (same factors, same LM schedule family)."""
    prob, R_gt, p_gt, v_gt, xw_gt = build_vi_problem(rng)
    R, p, v, b, xw, inlier, aborted = vi_ba_cg.full_inertial_ba_cg(
        CAM, jnp.float32(0.0), lie.SE3.identity(), prob, cg_iters=32
    )
    assert not aborted
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    v_err = np.linalg.norm(np.asarray(v) - v_gt, axis=1)
    assert p_err.max() < 0.01, f"pos err {p_err}"
    assert v_err.max() < 0.05, f"vel err {v_err}"
    assert np.asarray(inlier).mean() > 0.9
    for k in range(len(R_gt)):
        dR = np.asarray(R[k]) @ R_gt[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"kf {k} rot err {ang}"


def test_full_inertial_ba_cg_abort_lands_mid_solve(rng):
    """An abort flag set during the first segment must stop the solve and
    report aborted=True (the caller then discards the state)."""
    prob, *_ = build_vi_problem(rng)
    polls = {"n": 0}

    class Flag:
        def is_set(self):
            polls["n"] += 1
            return polls["n"] >= 2  # let one segment through, then abort

    R, p, v, b, xw, inlier, aborted = vi_ba_cg.full_inertial_ba_cg(
        CAM, jnp.float32(0.0), lie.SE3.identity(), prob,
        iters1=6, iters2=6, seg=2, abort_flag=Flag(),
    )
    assert aborted
    assert polls["n"] == 2  # aborted right after the second segment poll


# ---------------------------------------------------------------------------
# large-scale world + GBA-thread dispatch
# ---------------------------------------------------------------------------


def make_inertial_world(rng, n_kf=200, n_lm=400, obs_per_kf=96,
                        noise=0.3, pose_pert=0.02, lm_pert=0.05):
    """WorldMap with an ``n_kf``-keyframe inertial chain (camera = body):
    ground-truth flight from ``simulate_trajectory``, per-KF preintegration
    windows stored in ``kf_preint``, perturbed poses/velocities/landmarks."""
    states, segments, dt = simulate_trajectory(rng, n_kf=n_kf, kf_dt=0.25)
    R_gt = np.stack([s[0] for s in states]).astype(np.float32)
    p_gt = np.stack([s[1] for s in states]).astype(np.float32)
    v_gt = np.stack([s[2] for s in states]).astype(np.float32)
    # landmarks sprinkled around the whole trajectory
    centers = p_gt[rng.integers(0, n_kf, n_lm)]
    xw_gt = (centers + rng.uniform(-6, 6, (n_lm, 3))).astype(np.float32)

    kp_cap = int(2 ** np.ceil(np.log2(obs_per_kf)))
    w = WorldMap(kp_cap=kp_cap, max_kf=int(2 ** np.ceil(np.log2(n_kf + 1))),
                 max_lm=2 * n_lm)
    w.n_lm = n_lm
    w.lm_valid[:n_lm] = True
    w.lm_pos[:n_lm] = xw_gt + rng.normal(0, lm_pert, (n_lm, 3)).astype(np.float32)
    w.lm_first_kf[:n_lm] = 0
    for k in range(n_kf):
        w.kf_valid[k] = True
        w.kf_ts[k] = 0.25 * k
        # camera = body: T_cw = T_bw = [R_wb^T, -R_wb^T p]
        R_cw = R_gt[k].T
        t_cw = -R_cw @ p_gt[k]
        # observations: nearest in-front landmarks
        xc = xw_gt @ R_cw.T + t_cw
        uv = np.array(cam_models.project(CAM, jnp.asarray(xc)))
        vis = (
            (xc[:, 2] > 0.5)
            & (uv[:, 0] > 10) & (uv[:, 0] < 630)
            & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        )
        cand = np.nonzero(vis)[0]
        take = cand[np.argsort(xc[cand, 2])][:obs_per_kf]
        n = len(take)
        w.kf_xy[k, :n] = uv[take] + rng.normal(0, noise, (n, 2)).astype(np.float32)
        w.kf_obs[k, :n] = take
        w.kf_kp_valid[k, :n] = True
        np.add.at(w.lm_n_obs, take, 1)
        # perturbed initial state (KF 0 exact: the gauge anchor)
        pert = pose_pert if k else 0.0
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, pert, 3).astype(np.float32))))
        R_wb0 = R_gt[k] @ dR
        p_wb0 = p_gt[k] + rng.normal(0, pert, 3).astype(np.float32)
        w.kf_R[k] = R_wb0.T
        w.kf_t[k] = -R_wb0.T @ p_wb0
        w.kf_vel[k] = v_gt[k] + rng.normal(0, 3 * pert, 3).astype(np.float32)
        w.kf_bias[k] = 0.0
    w.n_kf = n_kf
    w.imu_initialized = True
    # per-KF preintegration windows
    for k in range(1, n_kf):
        acc, gyr = segments[k - 1]
        w.kf_preint[k] = pre.preintegrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.full((len(acc),), dt),
            jnp.zeros(6), NOISE,
        )
    return w, R_gt, p_gt, v_gt, xw_gt


def _make_tracker(w):
    t = vi_trk.InertialTracker(
        CAM, world=w, noise=NOISE, mapper=Mapper(CAM)
    )
    return t


def _pose_errors(w, R_gt, p_gt):
    """(max position err, max velocity err) of body states vs ground truth."""
    R_wb = np.transpose(w.kf_R[: w.n_kf], (0, 2, 1))
    p_wb = -np.einsum("kij,kj->ki", R_wb, w.kf_t[: w.n_kf])
    return np.linalg.norm(p_wb - p_gt, axis=1)


class RecordingLock:
    """RLock that counts acquisitions (gather + write-back must each take it)."""

    def __init__(self):
        self._l = threading.RLock()
        self.acquisitions = 0

    def __enter__(self):
        self._l.acquire()
        self.acquisitions += 1
        return self

    def __exit__(self, *a):
        self._l.release()


@pytest.mark.slow
def test_full_inertial_gba_200kf_on_gba_thread(rng):
    """The r4 verdict's 'done' criterion: >=200 inertial KFs, GBA on the GBA
    thread, an abort lands mid-solve, write-back holds the lock."""
    w, R_gt, p_gt, v_gt, xw_gt = make_inertial_world(rng, n_kf=200)
    t = _make_tracker(w)
    err0 = _pose_errors(w, R_gt, p_gt)
    assert err0.max() > 0.01  # perturbation is real

    backend = AsyncBackend(t.mapper)
    lock = RecordingLock()
    backend.lock = lock
    started = threading.Event()

    def gba_thunk(abort_flag=None, map_lock=None):
        started.set()
        return t._full_inertial_ba(
            w, fixed_ids=np.asarray([0]), map_lock=map_lock,
            abort_flag=abort_flag,
        )

    # 1) superseded solve aborts mid-flight
    backend.request_gba(gba_thunk)
    assert started.wait(timeout=600)
    backend.request_gba(gba_thunk)  # supersedes -> aborts the first
    assert backend.wait_idle(timeout=1200)
    assert backend.gba_completed >= 1
    assert backend.gba_aborted >= 1
    assert not backend.errors, backend.errors[:1]
    backend.shutdown()

    # 2) the completed solve actually solved the whole chain: every state
    #    (not a window) moved toward truth
    err1 = _pose_errors(w, R_gt, p_gt)
    assert err1.max() < err0.max() * 0.5, (err0.max(), err1.max())
    assert err1.mean() < 0.02, err1.mean()

    # 3) gather + write-back both held the map lock
    assert lock.acquisitions >= 2


@pytest.mark.slow
def test_merge_inertial_ba_welding_window(rng):
    """Dedicated MergeInertialBA (Optimizer.cc:3996-4543, r4 verdict missing
    #4): a 6+6 window across both sides of a map weld, outer boundary fixed,
    per-side preintegration chains.  Synthetic merged map: one continuous
    GT flight whose ids 0..9 play the destination map and 10..19 the
    transplanted source map (no preintegration spans the weld 9->10, as in a
    real merge); the source-side window states are perturbed as an imperfect
    Sim3 weld would leave them.  After the welding BA the source window must
    return to GT and velocities must be consistent with the welded poses."""
    w, R_gt, p_gt, v_gt, xw_gt = make_inertial_world(
        rng, n_kf=20, n_lm=300, obs_per_kf=96, pose_pert=0.0
    )
    del w.kf_preint[10]  # the weld: two sessions, no preintegration across
    # perturb the source-side welding window (14..19): pose + velocity
    for k in range(14, 20):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        R_wb = R_gt[k] @ dR
        p_wb = p_gt[k] + rng.normal(0, 0.05, 3).astype(np.float32)
        w.kf_R[k] = R_wb.T
        w.kf_t[k] = -R_wb.T @ p_wb
        w.kf_vel[k] = v_gt[k] + rng.normal(0, 0.1, 3).astype(np.float32)
    t = _make_tracker(w)
    err0 = _pose_errors(w, R_gt, p_gt)[14:20]
    v_err0 = np.linalg.norm(w.kf_vel[14:20] - v_gt[14:20], axis=1)
    assert err0.max() > 0.02

    real = t._merge_inertial_ba(w, k_new=19, c2=8)
    assert real is not None
    # the window covered BOTH sides of the weld
    assert any(r >= 14 for r in real) and any(r <= 9 for r in real)

    err1 = _pose_errors(w, R_gt, p_gt)[14:20]
    v_err1 = np.linalg.norm(w.kf_vel[14:20] - v_gt[14:20], axis=1)
    assert err1.max() < 0.5 * err0.max(), (err0.max(), err1.max())
    assert v_err1.max() < 0.06, (v_err0.max(), v_err1.max())
    # biases stay near their (zero) truth — the RW chain held across the weld
    assert np.abs(w.kf_bias[14:20]).max() < 0.02
    # velocity consistent with welded positions across the weld itself:
    # v_14 ~ finite difference of neighbouring body positions
    R_wb = np.transpose(w.kf_R[:20], (0, 2, 1))
    p_wb = -np.einsum("kij,kj->ki", R_wb, w.kf_t[:20])
    dt = float(w.kf_ts[15] - w.kf_ts[13])
    v_fd = (p_wb[15] - p_wb[13]) / dt
    assert np.linalg.norm(w.kf_vel[14] - v_fd) < 0.15
