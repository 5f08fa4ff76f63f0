"""Backend per-keyframe budget profiler (r4 verdict weak #7).

Drives the full async pipeline (tracker thread + mapping/loop worker + GBA
thread) over a long multi-lap synthetic circle until the map holds 200+
keyframes, then prints the REGISTER_TIMES-parity backend budget: mapper
stage means (cull/triangulate/fuse/LBA), loopcloser detect/verify/correct
means, and the worker queue depth over the run — the reference's
``LocalMapTimeStats.txt`` / ``ExecMean.txt`` schema
(/root/reference/src/Tracking.cc:189-268).  Results are pasted into
RESULTS.md.

Run:  python tests/profile_backend.py [n_frames] [laps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from orb_slam3_fast_tpu.backend.loopcloser import LoopCloser, LoopCloserConfig
from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.backend.pipeline import AsyncBackend
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import tracker as trk
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
)


def main(n_frames=900, laps=3.0):
    rng = np.random.default_rng(0)
    world3d = syn.make_ring_world(rng)
    poses = syn.circle_trajectory(n_frames, radius=4.0, frac=laps)
    voc = voc_mod.default_vocabulary()
    kfdb = db_mod.KeyFrameDatabase(voc.n_words, max_kf=1024)
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    lc = LoopCloser(CAM, voc, kfdb, mapper,
                    cfg=LoopCloserConfig(min_covis_edge=30, temporal_gap=15),
                    sigma2=ext.level_sigma2(CFG.extractor))
    backend = AsyncBackend(mapper, loopcloser=lc, kfdb=kfdb)
    t = trk.Tracker(
        CAM, CFG,
        world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor), max_kf=1024),
        mapper=mapper, voc=voc, kfdb=kfdb, loopcloser=lc, backend=backend,
    )
    qdepth = []
    t0 = time.time()
    tracked = 0
    for i, T in enumerate(poses):
        img = syn.render(world3d, CAM, T)
        state, pose = t.process_mono(img, i * 0.05)
        qdepth.append(backend.queue_len())
        if state == trk.OK:
            tracked += 1
        if i % 25 == 24:
            print(f"  frame {i+1}/{len(poses)}: n_kf={t.world.n_kf} "
                  f"queue={qdepth[-1]} loops={lc.n_loops_closed}", flush=True)
    backend.wait_idle(timeout=600)
    wall = time.time() - t0
    backend.shutdown()
    q = np.asarray(qdepth)
    print("\n=== backend per-keyframe budget ===")
    print(f"frames: {len(poses)} tracked: {tracked}  wall: {wall:.1f}s "
          f"({len(poses)/wall:.1f} fps incl. compile)")
    print(f"keyframes: {t.world.n_kf}  landmarks: {t.world.n_lm}  "
          f"loops closed: {lc.n_loops_closed}")
    print(f"queue depth: mean {q.mean():.2f}  p95 {np.percentile(q, 95):.0f}  "
          f"max {q.max()}  nonzero {100.0 * (q > 0).mean():.1f}%")
    print("\n-- mapper stages (ms/KF) --")
    print(mapper.timers.summary())
    print("\n-- loopcloser stages (ms/KF) --")
    print(lc.timers.summary())
    if backend.errors:
        print("\nWORKER ERRORS:\n" + backend.errors[0])


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    laps = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    main(n, laps)
