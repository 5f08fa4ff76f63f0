"""Native stereo rectification: epipolar row alignment, positive disparity,
depth recovery, and remap/resize correctness (ops/rectify.py — the in-tree
replacement for the reference's cv::stereoRectify/initUndistortRectifyMap/
remap path, Settings.cc:525-570)."""
import numpy as np

from orb_slam3_fast_tpu.ops import rectify as rect


def _rig():
    # EuRoC-like rig: 458 focal, 752x480, small relative rotation, 11 cm
    # baseline, mild radial-tangential distortion
    K1 = np.array([[458.0, 0, 367.2], [0, 457.3, 248.4], [0, 0, 1.0]])
    K2 = np.array([[457.6, 0, 379.0], [0, 456.1, 255.2], [0, 0, 1.0]])
    D1 = np.array([-0.28, 0.07, 2e-4, 1.8e-5, 0.0])
    D2 = np.array([-0.28, 0.07, -1e-4, -3.6e-5, 0.0])
    # cam2 is 11 cm to the right of cam1, rotated ~0.5 deg: x2 = R x1 + T
    R = rect._exp_so3(np.array([0.004, -0.007, 0.003]))
    T = R @ np.array([-0.11, 0.0004, -0.0006])
    return K1, D1, K2, D2, (752, 480), R, T


def test_rectified_rows_align_and_depth_recovers():
    K1, D1, K2, D2, wh, R, T = _rig()
    R1, R2, K_new, baseline, bf = rect.stereo_rectify(K1, D1, K2, D2, wh, R, T)
    assert abs(baseline - 0.11) < 5e-3
    rng = np.random.default_rng(0)
    X1 = np.stack([rng.uniform(-2, 2, 64), rng.uniform(-1.5, 1.5, 64),
                   rng.uniform(2.0, 12.0, 64)], axis=1)  # points in cam1 frame
    f, cx, cy = K_new[0, 0], K_new[0, 2], K_new[1, 2]
    p1 = X1 @ R1.T
    p2 = (X1 @ R.T + T) @ R2.T
    u1 = f * p1[:, 0] / p1[:, 2] + cx
    v1 = f * p1[:, 1] / p1[:, 2] + cy
    u2 = f * p2[:, 0] / p2[:, 2] + cx
    v2 = f * p2[:, 1] / p2[:, 2] + cy
    # rows must align to well under a pixel, disparity positive everywhere
    assert np.max(np.abs(v1 - v2)) < 1e-6
    disp = u1 - u2
    assert np.all(disp > 0)
    # stereo depth model: z = bf / disparity (in the rectified frame)
    np.testing.assert_allclose(bf / disp, p1[:, 2], rtol=1e-6)


def test_undistort_map_roundtrip():
    """A distorted-camera pixel of a known 3D point must be exactly where the
    rectified map samples for that point's rectified pixel."""
    K1, D1, K2, D2, wh, R, T = _rig()
    R1, R2, K_new, _, _ = rect.stereo_rectify(K1, D1, K2, D2, wh, R, T)
    mapx, mapy = rect.undistort_rectify_map(K1, D1, R1, K_new, wh)
    X = np.array([0.3, -0.2, 4.0])
    # rectified pixel of X
    p = R1 @ X
    u = K_new[0, 0] * p[0] / p[2] + K_new[0, 2]
    v = K_new[1, 1] * p[1] / p[2] + K_new[1, 2]
    # distorted original pixel of X
    xn, yn = X[0] / X[2], X[1] / X[2]
    r2 = xn * xn + yn * yn
    k1, k2, p1_, p2_, k3 = D1
    rad = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = xn * rad + 2 * p1_ * xn * yn + p2_ * (r2 + 2 * xn * xn)
    yd = yn * rad + p1_ * (r2 + 2 * yn * yn) + 2 * p2_ * xn * yn
    ud = K1[0, 0] * xd + K1[0, 2]
    vd = K1[1, 1] * yd + K1[1, 2]
    # bilinear sample of the map at the (sub-pixel) rectified location
    ui, vi = int(u), int(v)
    fx, fy = u - ui, v - vi
    mx = (mapx[vi, ui] * (1 - fx) * (1 - fy) + mapx[vi, ui + 1] * fx * (1 - fy)
          + mapx[vi + 1, ui] * (1 - fx) * fy + mapx[vi + 1, ui + 1] * fx * fy)
    my = (mapy[vi, ui] * (1 - fx) * (1 - fy) + mapy[vi, ui + 1] * fx * (1 - fy)
          + mapy[vi + 1, ui] * (1 - fx) * fy + mapy[vi + 1, ui + 1] * fx * fy)
    assert abs(mx - ud) < 0.05 and abs(my - vd) < 0.05


def test_remap_identity_and_resize_parity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    u, v = np.meshgrid(np.arange(64, dtype=np.float32),
                       np.arange(48, dtype=np.float32))
    out = rect.remap_bilinear(img, u, v)
    np.testing.assert_allclose(out, img, atol=1e-4)
    # resize matches cv2's half-pixel convention where cv2 is available
    small = rect.resize_bilinear(img, (32, 24))
    assert small.shape == (24, 32)
    try:
        import cv2
    except ImportError:
        return
    ref = cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
    assert np.median(np.abs(small - ref)) < 2.0  # same grid, minor edge diffs
