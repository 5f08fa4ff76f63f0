"""Lost-state handling: IMU-only prediction through a full occlusion
(Tracking.cc:1966-1977 + time_recently_lost grace), timestamp-jump map
spawning (Tracking.cc:1818-1848), and bad-IMU reset (LocalMapping.h:89)."""
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.frontend.vi_tracker import InertialConfig, InertialTracker
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.map.atlas import Atlas
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)
# stereo inserts ~1 KF / 6 frames: a short test sequence only reaches a few
# keyframes, so lower the keep-map richness gate to exercise BOTH jump paths
CFG_JUMP = CFG._replace(min_kf_keep_map=2)
NOISE = pre.ImuNoise.from_continuous(1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, 200.0)


def _vi_tracker(atlas=None):
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    kwargs = dict(world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)))
    if atlas is not None:
        kwargs = dict(atlas=atlas, world=None)
    return InertialTracker(
        CAM, CFG, mapper=mapper, noise=NOISE,
        icfg=InertialConfig(init_min_kfs=8, init_min_time=1.0),
        **kwargs,
    )


@pytest.mark.slow
def test_vi_survives_full_occlusion_on_imu():
    """1 s of black frames mid-sequence: the pose advances on IMU prediction
    (RECENTLY_LOST) and tracking re-locks when features return."""
    rng = np.random.default_rng(3)
    world3d = syn.make_corridor_world(rng, n=900)
    n_frames = 70
    occl = range(40, 52)  # 12 frames = 0.6 s of total darkness
    poses, imu = syn.arc_trajectory_with_imu(
        n_frames, step=0.06, lateral=0.05,
        gyro_bias=(0.002, -0.001, 0.0015), acc_bias=(0.03, -0.02, 0.04),
        noise_gyro=1.7e-4 * np.sqrt(200.0), noise_acc=2e-3 * np.sqrt(200.0), seed=3,
    )
    t = _vi_tracker()
    imu_i = 0
    states = []
    errs_after = []
    for i, T in enumerate(poses):
        tcur = i * 0.05
        j = imu_i
        while j < len(imu) and imu[j, 0] <= tcur + 1e-9:
            j += 1
        t.grab_imu(imu[imu_i:j])
        imu_i = j
        img = (
            np.zeros((480, 640), np.float32)
            if i in occl
            else syn.render(world3d, CAM, T)
        )
        state, pose = t.process_mono(img, tcur)
        states.append(state)
        if i >= 55 and state == trk.OK and pose is not None:
            R, tt = pose
            c_est = -R.T @ tt
            c_gt = np.asarray(T.inverse().t)
            errs_after.append(np.linalg.norm(c_est - c_gt))
    assert t.world.imu_initialized, "IMU never initialized before occlusion"
    # occluded frames: RECENTLY_LOST (IMU bridge), never LOST
    occl_states = [states[i] for i in occl]
    assert all(s == trk.RECENTLY_LOST for s in occl_states), occl_states
    # single map (no reset happened)
    assert states[-1] == trk.OK, f"never re-locked: {states[-8:]}"
    # and the re-locked trajectory is still metric/accurate
    assert errs_after and np.median(errs_after) < 0.40, np.median(errs_after)


@pytest.mark.slow
def test_timestamp_jump_spawns_new_map():
    rng = np.random.default_rng(0)
    world3d = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(40, step=0.06, lateral=0.05)
    baseline = 0.12
    bf = baseline * 400.0

    def make_map():
        return WorldMap(kp_cap=ext.total_capacity(CFG.extractor))

    atlas = Atlas(make_map)
    mapper = Mapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG_JUMP, bf=bf, atlas=atlas, mapper=mapper)
    n_kf_before = 0
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair(world3d, CAM, T, baseline)
        ts = i * 0.05 if i < 25 else 600.0 + i * 0.05  # 10-minute gap at 25
        if i == 25:
            n_kf_before = t.world.n_kf
        t.process_stereo(img_l, img_r, ts)
    # rich-map branch (CreateMapInAtlas, Tracking.cc:1824): the first map is
    # banked and tracking re-initializes into a fresh one
    assert n_kf_before > CFG_JUMP.min_kf_keep_map
    assert atlas.current_id != 0
    assert atlas.maps[0] is not None and atlas.maps[0].n_kf == n_kf_before
    assert t.state == trk.OK  # re-initialized and tracking in the new map
    assert t.world.n_kf >= 1


@pytest.mark.slow
def test_timestamp_jump_poor_map_resets_in_place():
    """<= min_kf_keep_map keyframes at the jump: the reference resets the
    young map in place instead of banking it (ResetActiveMap branch)."""
    rng = np.random.default_rng(0)
    world3d = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(14, step=0.06, lateral=0.05)
    baseline = 0.12
    bf = baseline * 400.0
    atlas = Atlas(lambda: WorldMap(kp_cap=ext.total_capacity(CFG.extractor)))
    mapper = Mapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG, bf=bf, atlas=atlas, mapper=mapper)
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair(world3d, CAM, T, baseline)
        ts = i * 0.05 if i < 8 else 600.0 + i * 0.05  # jump with a 1-2 KF map
        t.process_stereo(img_l, img_r, ts)
    assert atlas.current_id == 0  # same map slot, restarted
    assert t.state == trk.OK
    assert t.world.n_kf >= 1


def test_bad_imu_resets_active_map():
    rng = np.random.default_rng(0)

    def make_map():
        return WorldMap(kp_cap=ext.total_capacity(CFG.extractor))

    atlas = Atlas(make_map)
    t = _vi_tracker(atlas=atlas)
    t.state = trk.OK  # pretend tracking (reset path only needs the atlas)
    bad = np.array([[0.0, np.nan, 0, 0, 0.1, 0, 0]])
    for i in range(t.icfg.bad_imu_limit):
        s = bad.copy()
        s[0, 0] = 0.01 * (i + 1)
        t.grab_imu(s)
        t._preintegrate_frame(0.01 * (i + 1) + 0.005)
    assert t.state == trk.NOT_INITIALIZED  # map was reset
    assert t._bad_imu_count == 0


def test_imu_burst_decimated_not_dropped():
    """More samples than the bucket: decimation preserves the integrated
    rotation instead of silently truncating (r3 verdict weak #7)."""
    t = _vi_tracker()
    nb = t.icfg.imu_bucket
    n = 3 * nb  # a burst 3x the bucket capacity
    dt = 0.0005
    wz = 0.8  # rad/s steady yaw
    samples = np.zeros((n, 7))
    samples[:, 0] = dt * (1 + np.arange(n))
    samples[:, 3] = 9.81  # gravity on z (stationary-ish accel)
    samples[:, 6] = wz
    t.grab_imu(samples)
    t._preintegrate_frame(n * dt + 1e-6)
    assert t.frame_preint is not None
    # integrated time and yaw must cover the WHOLE burst (the first sample
    # anchors the window and carries dt=0 — after R rounds of decimation
    # that boundary costs 2^R * dt, NOT a third of the data as truncation did)
    assert abs(float(t.frame_preint.dT) - n * dt) < 8 * dt
    from orb_slam3_fast_tpu.utils import lie
    import jax.numpy as jnp

    ang = float(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(t.frame_preint.dR)))))
    assert abs(ang - wz * n * dt) < 0.01
