"""Shipped YAML configs load through the Settings parser, and the EuRoC
stereo rig runs the native rectification precompute (Settings.cc:525-570
equivalent): rectified pinhole camera, positive bf, finite remap grids, and
a rectified pair with the expected shape."""
import numpy as np
import pytest

from orb_slam3_fast_tpu.slam import settings as st

CONFIGS = [
    ("configs/EuRoC_stereo_inertial.yaml", "stereo-inertial"),
    ("configs/TUMVI_fisheye_stereo_inertial.yaml", "stereo-inertial"),
    ("configs/synthetic_mono.yaml", "monocular"),
    ("configs/synthetic_stereo.yaml", "stereo"),
]


@pytest.mark.parametrize("path,sensor", CONFIGS)
def test_config_loads(path, sensor):
    s = st.Settings.from_yaml(path, sensor=sensor)
    assert s.cam is not None
    assert s.width > 0 and s.height > 0


def test_euroc_rectification_native():
    s = st.Settings.from_yaml("configs/EuRoC_stereo_inertial.yaml",
                              sensor="stereo-inertial")
    assert s.camera_type == "Rectified"
    assert s.bf > 0
    # EuRoC baseline ~0.110 m, focal ~458 -> bf ~ 50 px*m
    assert 40.0 < s.bf < 60.0
    mapx, mapy = s.rect_map_left
    assert mapx.shape == (s.height, s.width)
    assert np.all(np.isfinite(mapx)) and np.all(np.isfinite(mapy))
    # the map is a mild warp: its center stays near the image center
    cy, cx = s.height // 2, s.width // 2
    assert abs(mapx[cy, cx] - cx) < 40 and abs(mapy[cy, cx] - cy) < 40
    l = np.random.default_rng(0).uniform(0, 255, (s.height, s.width)).astype(np.float32)
    r = np.roll(l, 3, axis=1)
    lr, rr = s.rectify(l, r)
    assert lr.shape == (s.height, s.width) and rr.shape == (s.height, s.width)
    assert np.isfinite(lr).all() and np.isfinite(rr).all()
