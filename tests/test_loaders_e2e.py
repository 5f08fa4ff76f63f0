"""Real-dataset path, end to end: miniature on-disk EuRoC / TUM-RGBD / KITTI
trees materialized from the synthetic renderer, driven through
``python -m orb_slam3_fast_tpu`` (main() verbatim) — covering
``datasets/loaders.py``, the CLI dataset branch, PNG decode, EuRoC IMU CSV
parsing, stereo rectification wiring, and report/trajectory saving
(reference Examples/Stereo-Inertial/stereo_inertial_euroc.cc:50-291).
"""
import json
import os

import numpy as np
import pytest

from orb_slam3_fast_tpu.cameras import models as cam_models

from tests import synthetic as syn

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0
CAM = cam_models.Camera.pinhole(FX, FY, CX, CY)
BASELINE = 0.12
BF = BASELINE * FX
N_FRAMES = 16


def _png(path, img, depth16=False):
    import cv2

    if depth16:
        cv2.imwrite(path, img.astype(np.uint16))
    else:
        cv2.imwrite(path, np.clip(img, 0, 255).astype(np.uint8))


def _write_yaml(path, lines):
    with open(path, "w") as f:
        f.write("%YAML:1.0\n" + "\n".join(lines) + "\n")


def _stereo_yaml(path, rectified=True, imu=False, n_features=768):
    lines = [
        'File.version: "1.0"',
        f'Camera.type: "{"Rectified" if rectified else "PinHole"}"',
        f"Camera1.fx: {FX}", f"Camera1.fy: {FY}",
        f"Camera1.cx: {CX}", f"Camera1.cy: {CY}",
    ]
    if not rectified:
        # zero-distortion PinHole pair with a pure-x baseline: the native
        # stereoRectify precompute runs (Settings.cc:525-570 path) and the
        # remap is ~identity, so the rendered pinhole pair stays valid
        lines += [
            "Camera1.k1: 0.0", "Camera1.k2: 0.0", "Camera1.p1: 0.0", "Camera1.p2: 0.0",
            f"Camera2.fx: {FX}", f"Camera2.fy: {FY}",
            f"Camera2.cx: {CX}", f"Camera2.cy: {CY}",
            "Camera2.k1: 0.0", "Camera2.k2: 0.0", "Camera2.p1: 0.0", "Camera2.p2: 0.0",
            "Stereo.T_c1_c2: !!opencv-matrix",
            "  rows: 4", "  cols: 4", "  dt: f",
            f"  data: [1.0,0.0,0.0,{BASELINE}, 0.0,1.0,0.0,0.0, 0.0,0.0,1.0,0.0, 0.0,0.0,0.0,1.0]",
        ]
    lines += [
        "Camera.width: 640", "Camera.height: 480", "Camera.fps: 20", "Camera.RGB: 1",
        f"Camera.bf: {BF}", "Stereo.ThDepth: 40.0",
        f"ORBextractor.nFeatures: {n_features}",
        "ORBextractor.scaleFactor: 1.2", "ORBextractor.nLevels: 8",
        "ORBextractor.iniThFAST: 20", "ORBextractor.minThFAST: 7",
    ]
    if imu:
        lines += [
            "IMU.T_b_c1: !!opencv-matrix",
            "  rows: 4", "  cols: 4", "  dt: f",
            "  data: [1.0,0.0,0.0,0.0, 0.0,1.0,0.0,0.0, 0.0,0.0,1.0,0.0, 0.0,0.0,0.0,1.0]",
            "IMU.NoiseGyro: 1.7e-04", "IMU.NoiseAcc: 2.0e-03",
            "IMU.GyroWalk: 1.9393e-05", "IMU.AccWalk: 3.0e-03",
            "IMU.Frequency: 200.0",
        ]
    _write_yaml(path, lines)


def _run_cli(argv):
    from orb_slam3_fast_tpu.__main__ import main

    assert main(argv) == 0


def _tracked_fraction(out_dir, n_frames):
    traj = np.loadtxt(os.path.join(out_dir, "CameraTrajectory.txt"))
    return len(np.atleast_2d(traj)) / n_frames


# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_euroc_tree_stereo_inertial_cli(tmp_path):
    """mav0 layout + EuRoC-format IMU csv -> EuRoCLoader -> System."""
    rng = np.random.default_rng(0)
    world = syn.make_corridor_world(rng, n=900)
    poses, imu = syn.arc_trajectory_with_imu(
        N_FRAMES, step=0.06, lateral=0.05,
        gyro_bias=(0.002, -0.001, 0.0015), acc_bias=(0.03, -0.02, 0.04),
        noise_gyro=1.7e-4 * np.sqrt(200.0), noise_acc=2e-3 * np.sqrt(200.0),
    )
    cam0 = tmp_path / "mav0" / "cam0" / "data"
    cam1 = tmp_path / "mav0" / "cam1" / "data"
    imu0 = tmp_path / "mav0" / "imu0"
    for d in (cam0, cam1, imu0):
        d.mkdir(parents=True)
    for i, T in enumerate(poses):
        il, ir = syn.stereo_pair(world, CAM, T, BASELINE)
        ns = int(round(i * 0.05 * 1e9))
        _png(str(cam0 / f"{ns}.png"), il)
        _png(str(cam1 / f"{ns}.png"), ir)
    # EuRoC csv column order: ts[ns], wx, wy, wz, ax, ay, az
    with open(imu0 / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for m in imu:  # ours: ts, ax, ay, az, wx, wy, wz
            f.write(
                f"{int(round(m[0] * 1e9))},{m[4]},{m[5]},{m[6]},{m[1]},{m[2]},{m[3]}\n"
            )
    cfg = tmp_path / "euroc_mini.yaml"
    _stereo_yaml(str(cfg), rectified=True, imu=True)
    out = tmp_path / "out"
    _run_cli([
        "--config", str(cfg), "--seq", str(tmp_path), "--dataset", "euroc",
        "--sensor", "stereo-inertial", "--out", str(out), "--sync", "--cpu",
    ])
    assert _tracked_fraction(str(out), N_FRAMES) > 0.8
    # Horn-aligned ATE of the SAVED trajectory vs ground truth — this is the
    # gate that caught the lexicographic-filename-sort loader bug
    from orb_slam3_fast_tpu.eval import ate

    traj = np.atleast_2d(np.loadtxt(out / "CameraTrajectory.txt"))
    gt = {round(i * 0.05, 6): np.asarray(poses[i].inverse().t) for i in range(N_FRAMES)}
    est_l, gt_l, ts_l = [], [], []
    for row in traj:
        key = round(float(row[0]), 6)
        if key in gt:
            est_l.append(row[1:4])
            gt_l.append(gt[key])
            ts_l.append(row[0])
    assert len(est_l) > 0.8 * N_FRAMES
    rmse, _, _ = ate.ate_rmse(
        np.asarray(ts_l), np.asarray(est_l), np.asarray(ts_l), np.asarray(gt_l),
        with_scale=False,
    )
    assert rmse < 0.10, f"EuRoC-tree stereo-inertial ATE {rmse:.3f} m"


@pytest.mark.slow
def test_euroc_tree_pinhole_rectification_cli(tmp_path):
    """PinHole 2-camera config: the native stereoRectify precompute + remap
    runs inside track_stereo (Settings.cc:525-570 / System.cc:294-295)."""
    rng = np.random.default_rng(1)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(N_FRAMES, step=0.06, lateral=0.05)
    cam0 = tmp_path / "mav0" / "cam0" / "data"
    cam1 = tmp_path / "mav0" / "cam1" / "data"
    for d in (cam0, cam1):
        d.mkdir(parents=True)
    for i, T in enumerate(poses):
        il, ir = syn.stereo_pair(world, CAM, T, BASELINE)
        ns = int(round(i * 0.05 * 1e9))
        _png(str(cam0 / f"{ns}.png"), il)
        _png(str(cam1 / f"{ns}.png"), ir)
    cfg = tmp_path / "pinhole_rect.yaml"
    _stereo_yaml(str(cfg), rectified=False)
    out = tmp_path / "out"
    _run_cli([
        "--config", str(cfg), "--seq", str(tmp_path), "--dataset", "euroc",
        "--sensor", "stereo", "--out", str(out), "--sync", "--cpu",
    ])
    assert _tracked_fraction(str(out), N_FRAMES) > 0.8


@pytest.mark.slow
def test_tum_rgbd_tree_cli(tmp_path):
    """rgb.txt/depth.txt association + 16-bit depth PNGs (factor 5000)."""
    rng = np.random.default_rng(2)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(N_FRAMES, step=0.06, lateral=0.05)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for i, T in enumerate(poses):
        ts = i * 0.05
        img, depth = syn.render(world, CAM, T, return_depth=True)
        _png(str(tmp_path / "rgb" / f"{ts:.6f}.png"), img)
        _png(str(tmp_path / "depth" / f"{ts:.6f}.png"), depth * 5000.0, depth16=True)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dep_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
    (tmp_path / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("# depth\n" + "\n".join(dep_lines) + "\n")
    cfg = tmp_path / "rgbd.yaml"
    _write_yaml(str(cfg), [
        'File.version: "1.0"', 'Camera.type: "Rectified"',
        f"Camera1.fx: {FX}", f"Camera1.fy: {FY}",
        f"Camera1.cx: {CX}", f"Camera1.cy: {CY}",
        "Camera.width: 640", "Camera.height: 480", "Camera.fps: 20", "Camera.RGB: 1",
        f"Camera.bf: {BF}", "Stereo.ThDepth: 40.0", "RGBD.DepthMapFactor: 5000.0",
        "ORBextractor.nFeatures: 768", "ORBextractor.scaleFactor: 1.2",
        "ORBextractor.nLevels: 8", "ORBextractor.iniThFAST: 20",
        "ORBextractor.minThFAST: 7",
    ])
    out = tmp_path / "out"
    _run_cli([
        "--config", str(cfg), "--seq", str(tmp_path), "--dataset", "tum-rgbd",
        "--sensor", "rgbd", "--out", str(out), "--sync", "--cpu",
    ])
    assert _tracked_fraction(str(out), N_FRAMES) > 0.8


@pytest.mark.slow
def test_kitti_tree_stereo_cli(tmp_path):
    rng = np.random.default_rng(3)
    world = syn.make_corridor_world(rng, n=900)
    poses = syn.arc_trajectory(N_FRAMES, step=0.06, lateral=0.05)
    (tmp_path / "image_0").mkdir()
    (tmp_path / "image_1").mkdir()
    for i, T in enumerate(poses):
        il, ir = syn.stereo_pair(world, CAM, T, BASELINE)
        _png(str(tmp_path / "image_0" / f"{i:06d}.png"), il)
        _png(str(tmp_path / "image_1" / f"{i:06d}.png"), ir)
    (tmp_path / "times.txt").write_text("\n".join(f"{i * 0.05:.6e}" for i in range(N_FRAMES)) + "\n")
    cfg = tmp_path / "kitti.yaml"
    _stereo_yaml(str(cfg), rectified=True)
    out = tmp_path / "out"
    _run_cli([
        "--config", str(cfg), "--seq", str(tmp_path), "--dataset", "kitti",
        "--sensor", "stereo", "--out", str(out), "--sync", "--cpu",
    ])
    assert _tracked_fraction(str(out), N_FRAMES) > 0.8


# ---------------------------------------------------------------------------
# fast, no-SLAM loader contracts (cheap coverage of the parsing seams)
# ---------------------------------------------------------------------------
def test_euroc_loader_parses_tree_and_imu(tmp_path):
    cam0 = tmp_path / "mav0" / "cam0" / "data"
    cam1 = tmp_path / "mav0" / "cam1" / "data"
    imu0 = tmp_path / "mav0" / "imu0"
    for d in (cam0, cam1, imu0):
        d.mkdir(parents=True)
    img = np.zeros((8, 8), np.float32)
    for i in range(3):
        ns = int(i * 0.05 * 1e9)
        _png(str(cam0 / f"{ns}.png"), img)
        _png(str(cam1 / f"{ns}.png"), img)
    with open(imu0 / "data.csv", "w") as f:
        f.write("#ts,wx,wy,wz,ax,ay,az\n")
        for k in range(20):
            f.write(f"{int(k * 5e6)},0.01,0.02,0.03,0.1,0.2,9.8\n")
    from orb_slam3_fast_tpu.datasets.loaders import EuRoCLoader

    dl = EuRoCLoader(str(tmp_path), stereo=True, imu=True)
    frames = list(dl)
    assert len(frames) == 3
    assert frames[0].img.shape == (8, 8) and frames[0].img_right is not None
    # IMU batches: all samples <= frame ts, a/w column swap applied
    total = sum(len(f.imu) for f in frames if f.imu is not None)
    assert total >= 19
    first = frames[0].imu
    assert np.allclose(first[0, 1:4], [0.1, 0.2, 9.8])  # acc columns
    assert np.allclose(first[0, 4:7], [0.01, 0.02, 0.03])  # gyro columns


def test_tum_association_and_kitti_times(tmp_path):
    from orb_slam3_fast_tpu.datasets.loaders import associate

    a = [(0.00, "a0"), (0.05, "a1"), (0.10, "a2")]
    b = [(0.001, "b0"), (0.052, "b1"), (0.30, "b2")]
    pairs = associate(a, b, max_dt=0.02)
    assert [(x[0][1], x[1][1]) for x in pairs] == [("a0", "b0"), ("a1", "b1")]
