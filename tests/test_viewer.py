"""Offline viewer (FrameDrawer/MapDrawer equivalents) render sanity."""
import numpy as np

from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.viz import viewer


def test_draw_frame_and_map(tmp_path, rng):
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    kp = rng.uniform(10, 110, (50, 2)).astype(np.float32)
    matched = rng.uniform(size=50) < 0.5
    out = viewer.draw_frame(img, kp, matched, state="OK", path=str(tmp_path / "f.png"))
    assert out.shape[2] == 3 and out.shape[0] > 0
    assert (tmp_path / "f.png").exists()

    w = WorldMap(kp_cap=64, max_kf=8, max_lm=256)

    class KP:
        xy = np.zeros((64, 2), np.float32)
        level = np.zeros(64, np.int32)
        angle = np.zeros(64, np.float32)
        desc = np.zeros((64, 256), np.int8)
        valid = np.ones(64, bool)

    for k in range(3):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.1 * k, 0, 0], np.float32)
        w.add_keyframe(KP(), R, t, float(k))
    pos = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    w.add_landmarks(pos, np.zeros((40, 256), np.int8), 0, np.arange(40), np.zeros(40, np.int32))
    out = viewer.draw_map(w, path=str(tmp_path / "m.png"))
    assert out.shape[2] == 3
    assert (tmp_path / "m.png").exists()
