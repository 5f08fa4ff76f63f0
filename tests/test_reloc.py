"""Relocalization test: lose tracking on blank frames, recover via the
place-recognition database + PnP (Tracking.cc:3518-3676 pipeline)."""
import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.vocab import database as db_mod
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)


def test_relocalization_after_blackout():
    rng = np.random.default_rng(0)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(30, step=0.06, lateral=0.05)
    voc = voc_mod.default_vocabulary()
    kfdb = db_mod.KeyFrameDatabase(voc.n_words, max_kf=256)
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(
        CAM, CFG, world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
        mapper=mapper, voc=voc, kfdb=kfdb,
    )
    for i, T in enumerate(poses):
        t.process_mono(syn.render(world, CAM, T), i * 0.05)
    assert t.state == trk.OK
    assert kfdb.valid.sum() == t.world.n_kf  # every KF indexed
    pose_before = (-t.last.R.T @ t.last.t).copy()

    # blackout: featureless frames -> tracking must degrade to RECENTLY_LOST
    blank = np.full((480, 640), 25.0, np.float32)
    for j in range(3):
        t.process_mono(blank, (30 + j) * 0.05)
    assert t.state == trk.RECENTLY_LOST

    # revisit a mapped viewpoint (frame 20) -> relocalization should fire
    state, pose = t.process_mono(syn.render(world, CAM, poses[20]), 34 * 0.05)
    assert state == trk.OK, "relocalization failed"
    R, tt = pose
    c_est = -R.T @ tt
    c_gt = np.asarray(poses[20].inverse().t)
    # mono scale: compare against the tracker's own earlier estimate scale;
    # the relocalized center must be near the frame-20 mapped position
    err = np.linalg.norm(c_est - c_gt * np.linalg.norm(pose_before) / max(np.linalg.norm(np.asarray(poses[29].inverse().t)), 1e-9))
    assert err < 0.5, f"relocalized pose off by {err:.3f}"


def test_lost_after_long_blackout():
    rng = np.random.default_rng(1)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(12, step=0.06, lateral=0.05)
    cfg = CFG._replace(max_recently_lost=5)
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(cfg.extractor))
    t = trk.Tracker(CAM, cfg, world=WorldMap(kp_cap=ext.total_capacity(cfg.extractor)),
                    mapper=mapper)
    for i, T in enumerate(poses):
        t.process_mono(syn.render(world, CAM, T), i * 0.05)
    assert t.state == trk.OK
    blank = np.full((480, 640), 25.0, np.float32)
    for j in range(7):
        t.process_mono(blank, (12 + j) * 0.05)
    assert t.state == trk.LOST
