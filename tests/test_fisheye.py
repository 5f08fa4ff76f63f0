"""Fisheye (Kannala-Brandt) two-camera stereo: matching + triangulation
(Frame::ComputeStereoFishEyeMatches + KannalaBrandt8::TriangulateMatches) and
an end-to-end KB8 stereo tracking run (the TUM-VI room1 configuration shape)."""
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.eval import ate
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.ops import matching as mat

from tests import synthetic as syn

# TUM-VI-like fisheye intrinsics (512x512, ~190 focal, mild KB distortion)
CAM_L = cam_models.Camera.kb8(190.98, 190.97, 254.93, 256.90,
                              0.0034823894022493434, 0.0007150348452162257,
                              -0.0020532361418706202, 0.00020293673591811182)
CAM_R = cam_models.Camera.kb8(190.44, 190.44, 252.07, 254.35,
                              0.0034003170790442797, 0.001766278153469831,
                              -0.00266312569781606, 0.0003299517423931039)
WH = (512, 512)
BASELINE = 0.101
T_C1_C2 = np.eye(4)
T_C1_C2[:3, 3] = [BASELINE, 0.0, 0.0]  # cam2 sits +x of cam1
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)


def test_fisheye_stereo_triangulation_geometry():
    """Matched+triangulated points must land on the true 3-D geometry."""
    rng = np.random.default_rng(3)
    # a 10 cm baseline cannot triangulate beyond ~5 m (the reference's
    # 0.9998 parallax gate, KannalaBrandt8.cpp:341) — keep the scene close
    world = syn.make_corridor_world(rng, n=900, half_w=2.0, half_h=2.0, length=12.0)
    T = syn.arc_trajectory(3, step=0.06, lateral=0.05)[0]
    img_l, img_r = syn.stereo_pair_cams(world, CAM_L, CAM_R, T, T_C1_C2, wh=WH)
    kp_l = ext.extract(jnp.asarray(img_l, dtype=jnp.float32), CFG.extractor)
    kp_r = ext.extract(jnp.asarray(img_r, dtype=jnp.float32), CFG.extractor)
    Tm = np.asarray(T_C1_C2)
    R_rl = jnp.asarray(Tm[:3, :3].T, dtype=jnp.float32)
    t_rl = jnp.asarray(-Tm[:3, :3].T @ Tm[:3, 3], dtype=jnp.float32)
    fm = mat.fisheye_stereo_match(
        CAM_L, CAM_R, kp_l, kp_r, R_rl, t_rl, jnp.asarray(ext.level_sigma2(CFG.extractor))
    )
    valid = np.asarray(fm.valid)
    assert valid.sum() > 120, f"only {valid.sum()} fisheye stereo matches"
    # distance of triangulated points (world frame) to the nearest splat plane
    X_l = np.asarray(fm.x3d)[valid]
    Rw = np.asarray(T.R)
    tw = np.asarray(T.t)
    Xw = (X_l - tw) @ Rw  # inverse transform (R^T (x - t))
    C = world["centers"]
    N = np.cross(world["e1"], world["e2"])
    half = world["sizes"][:, None] * 0.5
    rel = Xw[:, None, :] - C[None, :, :]
    dplane = np.abs(np.einsum("lsk,sk->ls", rel, N))
    a = np.abs(np.einsum("lsk,sk->ls", rel, world["e1"]))
    b = np.abs(np.einsum("lsk,sk->ls", rel, world["e2"]))
    onq = (a <= half.T + 0.1) & (b <= half.T + 0.1)
    d = np.where(onq, dplane, np.inf).min(1)
    d = d[np.isfinite(d)]
    # depth sigma ~ z^2 * sigma_px / (f*b) = 0.1-0.2 m at z=2-3 m for
    # f=191, b=0.101 — 0.15 m median is the honest-noise regime
    assert np.median(d) < 0.15, f"fisheye triangulation median err {np.median(d):.3f}"


@pytest.mark.slow
def test_fisheye_stereo_e2e():
    rng = np.random.default_rng(4)
    # a 10 cm baseline cannot triangulate beyond ~5 m (the reference's
    # 0.9998 parallax gate, KannalaBrandt8.cpp:341) — keep the scene close
    world = syn.make_corridor_world(rng, n=900, half_w=2.0, half_h=2.0, length=12.0)
    n_frames = 25
    poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
    bf = BASELINE * 190.98
    mapper = Mapper(CAM_L, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM_L, CFG, bf=bf, image_wh=WH,
                    cam2=CAM_R, T_c1_c2=T_C1_C2,
                    world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                    mapper=mapper)
    gt, est, ts = [], [], []
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair_cams(world, CAM_L, CAM_R, T, T_C1_C2, wh=WH)
        state, pose = t.process_stereo(img_l, img_r, i * 0.05)
        if state == trk.OK and pose is not None:
            R, tt = pose
            est.append(-R.T @ tt)
            gt.append(np.asarray(T.inverse().t))
            ts.append(i * 0.05)
    assert t.state == trk.OK
    assert len(est) > 20
    est, gt, ts = np.asarray(est), np.asarray(gt), np.asarray(ts)
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=False)
    assert rmse < 0.3, f"fisheye stereo ATE {rmse:.3f} m"
    _, _, s_fit = ate.ate_rmse(ts, est, ts, gt, with_scale=True)
    assert abs(s_fit - 1.0) < 0.12, f"fisheye metric scale drift {s_fit:.3f}"
