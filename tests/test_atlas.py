"""Atlas multi-map: new map on tracking loss (CreateMapInAtlas) and Sim3
merge back on revisit (MergeLocal) — the reference's multi-map story
(/root/reference/src/Atlas.cc:53, Tracking.cc:2607, LoopClosing.cc:1347)."""
import numpy as np
import pytest

from orb_slam3_fast_tpu.backend.loopcloser import LoopCloser, LoopCloserConfig
from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.eval import ate
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.atlas import Atlas
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.vocab import database as db_mod
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(
    extractor=ext.ExtractorConfig(n_features=768),
    min_init_matches=60,
    motion_radius=25.0,
    max_recently_lost=6,  # give up quickly during the blackout
)


def _make_map():
    return WorldMap(kp_cap=ext.total_capacity(CFG.extractor), max_kf=256)


@pytest.mark.slow
def test_atlas_spawns_and_merges():
    rng = np.random.default_rng(0)
    world3d = syn.make_ring_world(rng)
    n_frames = 150
    poses = syn.circle_trajectory(n_frames, radius=4.0, frac=1.12)
    voc = voc_mod.default_vocabulary()
    kfdb = db_mod.KeyFrameDatabase(voc.n_words, max_kf=256)
    atlas = Atlas(_make_map)
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    lc = LoopCloser(CAM, voc, kfdb, mapper,
                    cfg=LoopCloserConfig(min_covis_edge=30, temporal_gap=15),
                    sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(CAM, CFG, mapper=mapper, voc=voc, kfdb=kfdb,
                    loopcloser=lc, atlas=atlas)
    blackout = range(55, 68)  # sensor dropout mid-sequence
    gt_by_ts = {}
    n_ok = 0
    max_maps = 1
    for i, T in enumerate(poses):
        if i in blackout:
            img = np.zeros((480, 640), np.float32)
        else:
            img = syn.render(world3d, CAM, T)
        state, pose = t.process_mono(img, i * 0.05)
        max_maps = max(max_maps, len(atlas.maps))
        if state == trk.OK and i not in blackout:
            n_ok += 1
            gt_by_ts[round(i * 0.05, 4)] = np.asarray(T.inverse().t)
    # a new map must have been spawned during the blackout...
    assert max_maps >= 2, "tracking loss never spawned a new Atlas map"
    # ...and merged back on revisit (the circle overlaps its start)
    assert lc.n_maps_merged >= 1, "maps were never merged"
    assert t.state == trk.OK
    assert n_ok > 100, f"only {n_ok} tracked frames"
    # the SAVED trajectory (composed through the merged keyframe poses, the
    # product behavior of SaveTrajectoryTUM) must be consistent in ONE frame
    est, gt, ts = [], [], []
    for tsv, R, tt, ok in t.trajectory_world():
        key = round(tsv, 4)
        if ok and key in gt_by_ts:
            est.append(-R.T @ tt)
            gt.append(gt_by_ts[key])
            ts.append(tsv)
    est, gt, ts = np.asarray(est), np.asarray(gt), np.asarray(ts)
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=True)
    assert rmse < 0.5, f"post-merge full-trajectory ATE {rmse:.3f}"


def test_atlas_save_load_roundtrip(tmp_path, rng):
    atlas = Atlas(_make_map)

    class KP:
        xy = np.zeros((64, 2), np.float32)
        level = np.zeros(64, np.int32)
        angle = np.zeros(64, np.float32)
        desc = np.zeros((64, 256), np.int8)
        valid = np.ones(64, bool)

    def tiny_map():
        return WorldMap(kp_cap=64, max_kf=8, max_lm=256)

    atlas = Atlas(tiny_map)
    for k in range(3):
        atlas.current.add_keyframe(KP(), np.eye(3, dtype=np.float32),
                                   np.array([0.1 * k, 0, 0], np.float32), float(k))
        atlas.register_kf(0, k)
    atlas.create_new_map()
    atlas.current.add_keyframe(KP(), np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32), 9.0)
    atlas.register_kf(1, 0)
    p = str(tmp_path / "atlas")
    atlas.save(p)
    a2 = Atlas.load(p, tiny_map)
    assert a2.current_id == 1
    assert a2.maps[0].n_kf == 3 and a2.maps[1].n_kf == 1
    assert a2.row_map == atlas.row_map
    assert a2.register_kf(0, 2) == atlas._row_of[(0, 2)]
