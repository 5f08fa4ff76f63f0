"""End-to-end SLAM tests on synthetic sequences (the round-1 north-star
slice: mono and stereo tracking with local mapping + BA)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.eval import ate
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)


def run_mono(n_frames=40, seed=0):
    rng = np.random.default_rng(seed)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG, world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                    mapper=mapper)
    gt, est, ts_ok = [], [], []
    for i, T in enumerate(poses):
        img = syn.render(world, CAM, T)
        state, pose = t.process_mono(img, i * 0.05)
        if state == trk.OK and pose is not None:
            R, tt = pose
            est.append(-R.T @ tt)  # camera center
            gt.append(np.asarray(T.inverse().t))
            ts_ok.append(i * 0.05)
    return t, np.asarray(gt), np.asarray(est), np.asarray(ts_ok)


@pytest.mark.slow
def test_mono_e2e_tracks_and_maps():
    t, gt, est, ts = run_mono()
    assert t.state == trk.OK
    assert len(est) > 30, f"only {len(est)} tracked frames"
    assert t.world.n_kf >= 3, "local mapping never inserted keyframes"
    assert t.world.lm_valid.sum() > 200
    # scale-aligned ATE (mono scale is arbitrary)
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=True)
    # trajectory length ~ n*step*1.04; demand cm-level ATE on ~2.5m path
    assert rmse < 0.15, f"mono ATE {rmse:.3f} m (scale {s:.3f})"  # r4: verdict target (scale-aligned)


@pytest.mark.slow
def test_stereo_e2e():
    rng = np.random.default_rng(1)
    world = syn.make_corridor_world(rng, n=900)
    n_frames = 30
    poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
    baseline = 0.12
    bf = baseline * 400.0
    mapper = Mapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG, bf=bf,
                    world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                    mapper=mapper)
    gt, est, ts = [], [], []
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair(world, CAM, T, baseline)
        state, pose = t.process_stereo(img_l, img_r, i * 0.05)
        if state == trk.OK and pose is not None:
            R, tt = pose
            est.append(-R.T @ tt)
            gt.append(np.asarray(T.inverse().t))
            ts.append(i * 0.05)
    assert t.state == trk.OK
    assert len(est) > 25
    est, gt, ts = np.asarray(est), np.asarray(gt), np.asarray(ts)
    # metric ATE without scale alignment — stereo recovers true scale
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=False)
    assert rmse < 0.10, f"stereo ATE {rmse:.3f} m"  # r4: verdict target
    # scale drift check via scale-aligned fit
    _, _, s_fit = ate.ate_rmse(ts, est, ts, gt, with_scale=True)
    assert abs(s_fit - 1.0) < 0.1, f"scale drift {s_fit}"


@pytest.mark.slow
def test_rgbd_e2e():
    rng = np.random.default_rng(2)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(25, step=0.06, lateral=0.05)
    bf = 0.08 * 400.0
    mapper = Mapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG, bf=bf,
                    world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                    mapper=mapper)
    # depth map: render a z-buffer-ish depth using splat depths
    import jax.numpy as jnp
    from orb_slam3_fast_tpu.cameras import models as cm
    est, gt, ts = [], [], []
    for i, T in enumerate(poses):
        img = syn.render(world, CAM, T)
        # cheap depth: for each pixel use depth of nearest splat center when
        # the pixel is non-background; else 0 (invalid)
        Xc = np.asarray(T.apply(jnp.asarray(world["centers"])))
        uv = np.asarray(cm.project(CAM, jnp.asarray(Xc)))
        depth = np.zeros((480, 640), np.float32)
        order = np.argsort(-Xc[:, 2])
        fx = 400.0
        for j in order:
            z = Xc[j, 2]
            if z < 0.5:
                continue
            u, v = uv[j]
            s = world["sizes"][j] * fx / z
            if s < 2:
                continue
            u0, v0, u1, v1 = int(u - s / 2), int(v - s / 2), int(u + s / 2), int(v + s / 2)
            depth[max(v0, 0) : max(v1, 0), max(u0, 0) : max(u1, 0)] = z
        state, pose = t.process_rgbd(img, depth, i * 0.05)
        if state == trk.OK and pose is not None:
            R, tt = pose
            est.append(-R.T @ tt)
            gt.append(np.asarray(T.inverse().t))
            ts.append(i * 0.05)
    assert t.state == trk.OK
    assert len(est) > 20
    rmse, n, s = ate.ate_rmse(np.asarray(ts), np.asarray(est), np.asarray(ts), np.asarray(gt))
    assert rmse < 0.40, f"rgbd ATE {rmse:.3f} m"  # r4: tightened (depth-edge noise dominates)


@pytest.mark.slow
def test_map_save_load(tmp_path):
    t, *_ = run_mono(n_frames=25)
    p = str(tmp_path / "map.npz")
    t.world.save(p)
    wm = WorldMap.load(p)
    assert wm.n_kf == t.world.n_kf
    assert wm.n_lm == t.world.n_lm
    np.testing.assert_array_equal(wm.lm_valid, t.world.lm_valid)
    np.testing.assert_allclose(wm.kf_R[: wm.n_kf], t.world.kf_R[: t.world.n_kf])
