"""Async backend: LocalMapping/LoopClosing on the worker thread must keep
tracking latency independent of keyframe processing (the reference's
std::thread pipeline, System.cc:221,241) while producing an equivalent map."""
import time

import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.backend.pipeline import AsyncBackend
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.eval import ate
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)


@pytest.mark.slow
def test_async_backend_tracks_and_overlaps():
    rng = np.random.default_rng(1)
    world3d = syn.make_corridor_world(rng, n=900)
    n_frames = 30
    poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
    baseline = 0.12
    bf = baseline * 400.0
    mapper = Mapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    backend = AsyncBackend(mapper)
    t = trk.Tracker(CAM, CFG, bf=bf,
                    world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                    mapper=mapper, backend=backend)
    gt, est, ts = [], [], []
    overlapped = 0  # frames tracked while the worker was busy
    frame_ms = []
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair(world3d, CAM, T, baseline)
        t0 = time.perf_counter()
        state, pose = t.process_stereo(img_l, img_r, i * 0.05)
        frame_ms.append((time.perf_counter() - t0) * 1e3)
        if backend.queue_len() > 0:
            overlapped += 1
        if state == trk.OK and pose is not None:
            R, tt = pose
            est.append(-R.T @ tt)
            gt.append(np.asarray(T.inverse().t))
            ts.append(i * 0.05)
    assert backend.wait_idle(timeout=120), "backend never drained"
    assert not backend.errors, f"backend thread crashed:\n{backend.errors[0]}"
    backend.shutdown()
    assert t.state == trk.OK
    assert overlapped >= 3, "tracking never overlapped keyframe processing"
    assert len(est) > 25
    est, gt, ts = np.asarray(est), np.asarray(gt), np.asarray(ts)
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=False)
    # slightly looser than the sync bound: the tracker consumes map updates
    # with one-frame latency
    assert rmse < 0.25, f"async stereo ATE {rmse:.3f} m"
