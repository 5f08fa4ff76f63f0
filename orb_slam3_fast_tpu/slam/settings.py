"""Typed settings loader for the reference's YAML schema.

TPU-native replacement for ``Settings`` (``/root/reference/src/Settings.cc``,
``include/Settings.h``): reads the same ``%YAML:1.0`` cv::FileStorage files
the reference ships (``Examples/*/EuRoC.yaml`` etc.), including
``!!opencv-matrix`` nodes, camera type dispatch
(PinHole/Rectified/KannalaBrandt8, Settings.h:48), stereo ``T_c1_c2``
rectification precompute (``precomputeRectificationMaps``, Settings.cc:525-570,
done natively via ``ops/rectify.py``), IMU noise terms, and ORB extractor
parameters.  Both the "File.version 1.0" typed schema (Camera1.fx) and the
legacy flat schema (Camera.fx, parsed by Tracking::ParseCamParamFile in the
reference) are accepted.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models


def load_opencv_yaml(path: str) -> dict:
    """Parse a cv::FileStorage YAML into a flat dict.  Handles the
    ``%YAML:1.0`` directive and ``!!opencv-matrix`` tags that stock pyyaml
    rejects."""
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML:1\.0", "", text.strip())
    text = text.replace("!!opencv-matrix", "!opencv-matrix")

    class _Loader(yaml.SafeLoader):
        pass

    def _mat(loader, node):
        m = loader.construct_mapping(node, deep=True)
        return np.asarray(m["data"], dtype=np.float64).reshape(m["rows"], m["cols"])

    _Loader.add_constructor("!opencv-matrix", _mat)
    # cv FileStorage writes bare floats like 1.76187114e-05 (fine) and
    # sometimes "1." (fine for pyyaml)
    data = yaml.load(text, Loader=_Loader)
    return data or {}


@dataclass
class Settings:
    """Resolved configuration (Settings.h:133-242 surface)."""

    sensor: str = "monocular"  # monocular|stereo|rgbd (+ "-inertial")
    camera_type: str = "PinHole"  # PinHole|Rectified|KannalaBrandt8
    cam: object = None  # cameras.models.Camera (left / main)
    cam2: object = None  # right camera (fisheye stereo)
    width: int = 640
    height: int = 480
    new_width: int = 0  # Camera.newWidth resize target (0 = off)
    new_height: int = 0
    fps: float = 30.0
    rgb: bool = True
    bf: float = 0.0  # baseline * fx
    th_depth: float = 35.0  # Stereo.ThDepth / RGBD.ThDepth
    depth_map_factor: float = 1.0  # RGBD.DepthMapFactor
    T_c1_c2: np.ndarray | None = None  # stereo extrinsics (4,4)
    T_b_c1: np.ndarray | None = None  # IMU body-from-camera (4,4)
    imu_noise_gyro: float = 1.7e-4
    imu_noise_acc: float = 2.0e-3
    imu_gyro_walk: float = 1.9e-5
    imu_acc_walk: float = 3.0e-3
    imu_frequency: float = 200.0
    insert_kfs_when_lost: bool = True
    # ORB extractor
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # rectification maps (pixel lookup grids), set by precompute_rectification
    rect_map_left: tuple | None = None
    rect_map_right: tuple | None = None
    # atlas persistence
    load_atlas: str | None = None
    save_atlas: str | None = None
    raw: dict = field(default_factory=dict)

    # ------------------------------------------------------------------
    @staticmethod
    def from_yaml(path: str, sensor: str = "monocular") -> "Settings":
        d = load_opencv_yaml(path)
        s = Settings(sensor=sensor, raw=d)

        def get(key, default=None):
            return d.get(key, default)

        s.camera_type = get("Camera.type", "PinHole")
        pfx = "Camera1." if "Camera1.fx" in d else "Camera."
        fx, fy = get(pfx + "fx"), get(pfx + "fy")
        cx, cy = get(pfx + "cx"), get(pfx + "cy")
        if s.camera_type in ("PinHole", "Rectified"):
            dist = [get(pfx + k, 0.0) or 0.0 for k in ("k1", "k2", "p1", "p2", "k3")]
            if s.camera_type == "Rectified":
                dist = [0.0] * 5
            s.cam = cam_models.Camera.pinhole(fx, fy, cx, cy, dist)
        elif s.camera_type == "KannalaBrandt8":
            ks = [get(pfx + k, 0.0) or 0.0 for k in ("k1", "k2", "k3", "k4")]
            s.cam = cam_models.Camera.kb8(fx, fy, cx, cy, *ks)
        else:
            raise ValueError(f"unknown Camera.type {s.camera_type}")
        if "Camera2.fx" in d:
            if s.camera_type == "KannalaBrandt8":
                ks2 = [get("Camera2." + k, 0.0) or 0.0 for k in ("k1", "k2", "k3", "k4")]
                s.cam2 = cam_models.Camera.kb8(
                    get("Camera2.fx"), get("Camera2.fy"), get("Camera2.cx"), get("Camera2.cy"), *ks2
                )
            else:
                dist2 = [get("Camera2." + k, 0.0) or 0.0 for k in ("k1", "k2", "p1", "p2", "k3")]
                s.cam2 = cam_models.Camera.pinhole(
                    get("Camera2.fx"), get("Camera2.fy"), get("Camera2.cx"), get("Camera2.cy"), dist2
                )
        s.width = int(get("Camera.width", 640))
        s.height = int(get("Camera.height", 480))
        s.new_width = int(get("Camera.newWidth", 0) or 0)
        s.new_height = int(get("Camera.newHeight", 0) or 0)
        s.fps = float(get("Camera.fps", 30.0))
        s.rgb = bool(get("Camera.RGB", 1))
        s.bf = float(get("Camera.bf", 0.0) or 0.0)
        s.th_depth = float(get("Stereo.ThDepth", get("ThDepth", 35.0)) or 35.0)
        s.depth_map_factor = float(get("RGBD.DepthMapFactor", get("DepthMapFactor", 1.0)) or 1.0)
        if get("Stereo.T_c1_c2") is not None:
            s.T_c1_c2 = np.asarray(get("Stereo.T_c1_c2"), dtype=np.float64)
        if get("IMU.T_b_c1") is not None:
            s.T_b_c1 = np.asarray(get("IMU.T_b_c1"), dtype=np.float64)
        elif get("Tbc") is not None:  # legacy key
            s.T_b_c1 = np.asarray(get("Tbc"), dtype=np.float64)
        s.imu_noise_gyro = float(get("IMU.NoiseGyro", s.imu_noise_gyro))
        s.imu_noise_acc = float(get("IMU.NoiseAcc", s.imu_noise_acc))
        s.imu_gyro_walk = float(get("IMU.GyroWalk", s.imu_gyro_walk))
        s.imu_acc_walk = float(get("IMU.AccWalk", s.imu_acc_walk))
        s.imu_frequency = float(get("IMU.Frequency", s.imu_frequency))
        s.n_features = int(get("ORBextractor.nFeatures", 1000))
        s.scale_factor = float(get("ORBextractor.scaleFactor", 1.2))
        s.n_levels = int(get("ORBextractor.nLevels", 8))
        s.ini_th_fast = float(get("ORBextractor.iniThFAST", 20))
        s.min_th_fast = float(get("ORBextractor.minThFAST", 7))
        s.load_atlas = get("System.LoadAtlasFromFile")
        s.save_atlas = get("System.SaveAtlasToFile")
        # stereo pinhole with extrinsics: rectify (Settings.cc:525-570)
        if (
            "stereo" in sensor
            and s.camera_type == "PinHole"
            and s.T_c1_c2 is not None
            and s.cam2 is not None
        ):
            s.precompute_rectification()
        elif "stereo" in sensor and s.camera_type == "Rectified" and s.bf == 0.0:
            b = float(get("Stereo.b", 0.0) or 0.0)
            s.bf = b * float(np.asarray(s.cam.params)[0])
        return s

    # ------------------------------------------------------------------
    def precompute_rectification(self):
        """Native stereoRectify + initUndistortRectifyMap equivalent
        (Settings.cc:525-570 uses cv2; here ``ops/rectify.py``): produces
        per-camera remap grids and replaces the camera model with the
        rectified pinhole."""
        from orb_slam3_fast_tpu.ops import rectify as rect

        p1 = np.asarray(self.cam.params, dtype=np.float64)
        p2 = np.asarray(self.cam2.params, dtype=np.float64)
        K1 = np.array([[p1[0], 0, p1[2]], [0, p1[1], p1[3]], [0, 0, 1]])
        K2 = np.array([[p2[0], 0, p2[2]], [0, p2[1], p2[3]], [0, 0, 1]])
        D1 = p1[4:9]
        D2 = p2[4:9]
        T12 = self.T_c1_c2
        # rectification wants cam1->cam2: R21, t21 (Settings.cc:536-540)
        R12, t12 = T12[:3, :3], T12[:3, 3]
        R21 = R12.T
        t21 = -R12.T @ t12
        wh = (self.width, self.height)
        R1, R2, K_new, _, bf = rect.stereo_rectify(K1, D1, K2, D2, wh, R21, t21)
        self.rect_map_left = rect.undistort_rectify_map(K1, D1, R1, K_new, wh)
        self.rect_map_right = rect.undistort_rectify_map(K2, D2, R2, K_new, wh)
        # rectified camera: shared intrinsics, no distortion
        self.cam = cam_models.Camera.pinhole(
            K_new[0, 0], K_new[1, 1], K_new[0, 2], K_new[1, 2]
        )
        self.bf = float(bf)
        self.camera_type = "Rectified"

    def rectify(self, img_l: np.ndarray, img_r: np.ndarray):
        from orb_slam3_fast_tpu.ops import rectify as rect

        l = rect.remap_bilinear(img_l, *self.rect_map_left)
        r = rect.remap_bilinear(img_r, *self.rect_map_right)
        return l, r
