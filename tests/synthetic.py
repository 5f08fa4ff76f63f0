"""Synthetic world renderer + trajectories for end-to-end SLAM tests.

A z-sorted "billboard" splat renderer: hundreds of textured squares at random
3-D positions.  Crude but produces FAST-detectable corners with correct
geometry/parallax, which is exactly what the pipeline needs (SURVEY.md §4:
the reference has no unit tests at all — dataset-driven only; we go further
with controllable synthetic golden runs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.utils import lie


def _frames_from_normals(normals, rng=None):
    """Per-splat orthonormal in-plane tangent frames (e1, e2) from normals."""
    n = normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
    helper = np.where(
        np.abs(n[:, 2:3]) < 0.9, np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]])
    )
    e1 = np.cross(n, helper)
    e1 /= np.maximum(np.linalg.norm(e1, axis=-1, keepdims=True), 1e-9)
    e2 = np.cross(n, e1)
    return e1.astype(np.float32), e2.astype(np.float32)


def make_world(rng, n=500, x=(-12, 12), y=(-6, 6), z=(4, 30), tile=6):
    centers = np.stack(
        [rng.uniform(*x, n), rng.uniform(*y, n), rng.uniform(*z, n)], -1
    ).astype(np.float32)
    # splats face the origin-ish (toward -z where the camera starts)
    normals = -centers + np.array([0.0, 0.0, -1.0])
    e1, e2 = _frames_from_normals(normals, rng)
    return {
        "centers": centers,
        "sizes": rng.uniform(0.2, 0.6, n).astype(np.float32),
        # unique random texture per splat — distinctive descriptors (a flat
        # color per square makes every corner look alike and the ratio test
        # then kills most matches)
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
        "e1": e1,
        "e2": e2,
    }


def render(world, cam, T_cw, wh=(640, 480), bg=30.0, return_depth=False):
    """Perspective render of WORLD-ANCHORED textured quads.

    Each splat is a planar square fixed in world space (center + size * span
    of its tangent frame e1/e2).  Pixels inside the projected quad sample the
    texture by ray-plane intersection, so a texture corner is a genuine
    static 3-D point under ANY camera motion.  (The previous image-space
    billboard renderer slid texture with camera yaw — features drifted up to
    ~0.5 * size world units over a feature lifetime on rotation-dominant
    trajectories, which no real camera produces and which poisoned the
    rotation benchmarks with unfixable drift.)
    """
    w, h = wh
    img = np.full((h, w), bg, dtype=np.float32)
    zbuf = np.full((h, w), np.inf, dtype=np.float32)
    R = np.asarray(T_cw.R, np.float64)
    t = np.asarray(T_cw.t, np.float64)
    centers = world["centers"].astype(np.float64)
    Xc = centers @ R.T + t
    tile = world["tex"].shape[1]
    e1 = world["e1"].astype(np.float64)
    e2 = world["e2"].astype(np.float64)
    sizes = world["sizes"].astype(np.float64)
    # camera-generic: dense per-pixel ray grid via the camera model's
    # unprojection (pinhole AND fisheye render correctly)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    grid = np.stack([uu, vv], -1).reshape(-1, 2)
    all_dirs = np.asarray(
        cam_models.unproject(cam, jnp.asarray(grid, dtype=jnp.float32))
    ).reshape(h, w, 3).astype(np.float64)
    for i in range(len(centers)):
        z = Xc[i, 2]
        if z < 0.5:
            continue
        half = 0.5 * sizes[i]
        # project the 4 corners through the CAMERA MODEL
        corners_w = (
            centers[i][None, :]
            + np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
            @ np.stack([e1[i] * half, e2[i] * half])
        )
        cc = corners_w @ R.T + t
        if np.any(cc[:, 2] < 0.2):
            continue
        uvq = np.asarray(cam_models.project(cam, jnp.asarray(cc, dtype=jnp.float32)))
        u0 = max(int(np.floor(uvq[:, 0].min())), 0)
        u1 = min(int(np.ceil(uvq[:, 0].max())) + 1, w)
        v0 = max(int(np.floor(uvq[:, 1].min())), 0)
        v1 = min(int(np.ceil(uvq[:, 1].max())) + 1, h)
        if u1 <= u0 or v1 <= v0 or (u1 - u0) * (v1 - v0) > 200_000:
            continue
        # ray-plane intersection for every pixel in the bbox
        dirs = all_dirs[v0:v1, u0:u1]
        # plane in camera frame: point pc, spanned by a1, a2; normal nc
        pc = Xc[i]
        a1 = R @ e1[i]
        a2 = R @ e2[i]
        nc = np.cross(a1, a2)
        denom = dirs @ nc
        ok = np.abs(denom) > 1e-9
        lam = (pc @ nc) / np.where(ok, denom, 1.0)  # ray depth multiplier
        hit = dirs * lam[..., None]  # camera-frame intersection points
        rel = hit - pc
        a = rel @ a1 / (half * 2)  # in [-0.5, 0.5] inside the quad
        b = rel @ a2 / (half * 2)
        inside = ok & (lam > 0.2) & (np.abs(a) <= 0.5) & (np.abs(b) <= 0.5)
        if not inside.any():
            continue
        depth = hit[..., 2]
        zb = zbuf[v0:v1, u0:u1]
        vis = inside & (depth < zb)
        if not vis.any():
            continue
        # bilinear texture sample at (a, b)
        txf = np.clip((a + 0.5) * tile - 0.5, 0.0, tile - 1.001)
        tyf = np.clip((b + 0.5) * tile - 0.5, 0.0, tile - 1.001)
        x0i = txf.astype(np.int32)
        y0i = tyf.astype(np.int32)
        wx = txf - x0i
        wy = tyf - y0i
        T_ = world["tex"][i]
        x1i = np.minimum(x0i + 1, tile - 1)
        y1i = np.minimum(y0i + 1, tile - 1)
        val = (
            T_[y0i, x0i] * (1 - wy) * (1 - wx)
            + T_[y0i, x1i] * (1 - wy) * wx
            + T_[y1i, x0i] * wy * (1 - wx)
            + T_[y1i, x1i] * wy * wx
        )
        patch = img[v0:v1, u0:u1]
        patch[vis] = val[vis]
        zb[vis] = depth[vis]
    if return_depth:
        depth_img = np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)
        return img, depth_img
    return img


def arc_trajectory(n_frames, step=0.08, yaw_rate=0.004, lateral=0.0):
    """Forward motion with slow yaw — returns list of T_cw (world->cam)."""
    poses = []
    T_wc = lie.SE3.identity()
    for i in range(n_frames):
        poses.append(T_wc.inverse())
        inc = lie.se3_exp(
            jnp.asarray([step * 0.3, lateral, step, 0.0, yaw_rate, 0.0], dtype=jnp.float32)
        )
        T_wc = T_wc.compose(inc)
    return poses


def render_sequence(world, cam, poses, wh=(640, 480)):
    return [render(world, cam, T, wh) for T in poses]


def stereo_pair(world, cam, T_cw, baseline, wh=(640, 480)):
    """Right camera displaced by +baseline along x in the camera frame."""
    T_rl = lie.SE3(jnp.eye(3), jnp.asarray([-baseline, 0.0, 0.0]))
    img_l = render(world, cam, T_cw, wh)
    img_r = render(world, cam, T_rl.compose(T_cw), wh)
    return img_l, img_r


def stereo_pair_cams(world, cam_l, cam_r, T_cw, T_c1_c2, wh=(640, 480)):
    """General two-camera rig: T_c1_c2 is the pose of cam2 in cam1 (4,4)."""
    T = np.asarray(T_c1_c2, np.float64)
    R12, t12 = T[:3, :3], T[:3, 3]
    T_21 = lie.SE3(jnp.asarray(R12.T, dtype=jnp.float32),
                   jnp.asarray(-R12.T @ t12, dtype=jnp.float32))
    img_l = render(world, cam_l, T_cw, wh)
    img_r = render(world, cam_r, T_21.compose(T_cw), wh)
    return img_l, img_r


def make_corridor_world(rng, n=800, half_w=4.0, half_h=3.0, length=40.0, tile=6):
    """Splats on the four walls of a box corridor along +z.  Mild occlusion
    (wall points can't fly in front of the camera), continuous visibility —
    geometry similar to an indoor sequence."""
    n4 = n // 4
    zs = rng.uniform(1.0, length, n)
    walls = []
    walls.append(np.stack([np.full(n4, -half_w), rng.uniform(-half_h, half_h, n4), zs[:n4]], -1))
    walls.append(np.stack([np.full(n4, half_w), rng.uniform(-half_h, half_h, n4), zs[n4 : 2 * n4]], -1))
    walls.append(np.stack([rng.uniform(-half_w, half_w, n4), np.full(n4, -half_h), zs[2 * n4 : 3 * n4]], -1))
    walls.append(
        np.stack([rng.uniform(-half_w, half_w, n - 3 * n4), np.full(n - 3 * n4, half_h), zs[3 * n4 :]], -1)
    )
    # panels tilted toward -z by a RANDOM amount (the camera travels along +z
    # looking forward; purely sideways-facing panels would render edge-on as
    # slivers, while a uniform steep tilt makes every nearby panel maximally
    # perspective-distorted at once — real scenes mix orientations)
    tilt = rng.uniform(0.7, 3.0, (n, 1))  # w_z: higher = more camera-facing
    base = np.concatenate([
        np.tile([1.0, 0.0, 0.0], (n4, 1)),   # left wall faces +x
        np.tile([-1.0, 0.0, 0.0], (n4, 1)),  # right wall
        np.tile([0.0, 1.0, 0.0], (n4, 1)),   # floor
        np.tile([0.0, -1.0, 0.0], (n - 3 * n4, 1)),
    ])
    normals = base + tilt * np.array([[0.0, 0.0, -1.0]])
    e1, e2 = _frames_from_normals(normals)
    return {
        "centers": np.concatenate(walls).astype(np.float32),
        "sizes": rng.uniform(0.15, 0.4, n).astype(np.float32),
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
        "e1": e1,
        "e2": e2,
    }


def make_ring_world(rng, n=1800, r_wall=9.0, half_h=2.5, tile=6):
    """Splats on a cylinder wall (radius r_wall) around the origin plus
    dense floor/ceiling — a closed scene for loop-closure trajectories.

    Floor/ceiling cover the whole disc so the camera (circling at r=4) always
    sees NEAR-FIELD points: a far-wall-only scene makes per-frame pose
    estimation rotation/translation-ambiguous and mono tracking drifts
    regardless of algorithm quality."""
    n_wall = n // 2
    a = rng.uniform(0, 2 * np.pi, n_wall)
    wall = np.stack(
        [r_wall * np.cos(a), r_wall * np.sin(a), rng.uniform(-half_h, half_h, n_wall)], -1
    )
    n_fc = n - n_wall
    a2 = rng.uniform(0, 2 * np.pi, n_fc)
    rr = r_wall * np.sqrt(rng.uniform(0.0, 1.0, n_fc))  # uniform over the disc
    zf = np.where(rng.uniform(size=n_fc) < 0.5, -half_h, half_h)
    fc = np.stack([rr * np.cos(a2), rr * np.sin(a2), zf], -1)
    centers = np.concatenate([wall, fc]).astype(np.float32)
    tilt = rng.uniform(0.7, 3.0, n_fc)
    normals = np.concatenate([
        np.stack([-np.cos(a), -np.sin(a), np.zeros(n_wall)], -1),  # wall faces inward
        # floor/ceiling panels tilted inward by a random amount so a
        # horizontal camera sees them (flat quads are edge-on to a tangent
        # view); random tilt mixes orientations like a real scene
        np.stack([-np.cos(a2), -np.sin(a2), -np.sign(zf) * tilt], -1),
    ])
    e1, e2 = _frames_from_normals(normals)
    return {
        "centers": centers,
        "sizes": rng.uniform(0.25, 0.7, n).astype(np.float32),
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
        "e1": e1,
        "e2": e2,
    }


def circle_trajectory(n_frames, radius=4.0, frac=1.1):
    """Camera circling the origin at ``radius`` in the wall plane (z=0 is the
    cylinder axis midplane -> here the circle lives in the xy-plane with the
    camera looking along the tangent).  frac > 1 revisits the start (loop).

    Camera frame: +z forward (tangent), +x right (radially outward), +y down.
    """
    poses = []
    for i in range(n_frames):
        a = 2 * np.pi * frac * i / n_frames
        c, s = np.cos(a), np.sin(a)
        center = np.array([radius * c, radius * s, 0.0], np.float32)
        fwd = np.array([-s, c, 0.0], np.float32)
        right = np.array([c, s, 0.0], np.float32)
        down = np.array([0.0, 0.0, -1.0], np.float32)
        R_wc = np.stack([right, down, fwd], axis=1)  # columns = cam axes in world
        R = R_wc.T
        t = -R @ center
        poses.append(lie.SE3(jnp.asarray(R), jnp.asarray(t)))
    return poses


def arc_trajectory_with_imu(
    n_frames, dt_frame=0.05, imu_rate=200.0, step=0.08, yaw_rate=0.004,
    lateral=0.0, g_world=(0.0, 9.81, 0.0), gyro_bias=(0.0, 0.0, 0.0),
    acc_bias=(0.0, 0.0, 0.0), noise_gyro=0.0, noise_acc=0.0, seed=0,
    accel_amp=0.6, accel_freq=0.9,
):
    """Arc trajectory plus the exact IMU stream a body-mounted sensor would
    measure.  The camera IS the body (T_bc = I).

    The body speed is modulated sinusoidally, v_b(t) = v0*(1 + a*sin(2pi f t)),
    because a CONSTANT body twist produces only w x v of proper acceleration
    (constant in the body frame, absorbable by the accelerometer bias) and
    the metric scale is then fundamentally unobservable from the IMU — the
    reference refuses to initialize on such data ("not enough acceleration",
    Tracking.cc StereoInitialization).  Real VI datasets (EuRoC MAV) are
    accelerating essentially always.

    gyro = w_b; specific force f_b = dv_b/dt + w_b x v_b - R_bw g_w.
    ``g_world`` defaults to +y ("down" in camera convention).
    Returns (poses T_cw per frame, imu rows (ts, ax, ay, az, wx, wy, wz)).
    """
    rng = np.random.default_rng(seed)
    xi0 = np.array([step * 0.3, lateral, step, 0.0, yaw_rate, 0.0], np.float64) / dt_frame
    v0, w_b = xi0[:3], xi0[3:]
    g_w = np.asarray(g_world, np.float64)
    dt_imu = 1.0 / imu_rate
    two_pi_f = 2.0 * np.pi * accel_freq
    poses = []
    imu = []
    T_wb = lie.SE3.identity()
    n_sub = int(round(dt_frame * imu_rate))
    for i in range(n_frames):
        poses.append(T_wb.inverse())
        for j in range(n_sub):
            t0 = i * dt_frame + j * dt_imu
            ts = t0 + dt_imu
            m = 1.0 + accel_amp * np.sin(two_pi_f * t0)
            dm = accel_amp * two_pi_f * np.cos(two_pi_f * t0)
            v_b = v0 * m
            R_wb = np.asarray(T_wb.R, np.float64)
            f_b = v0 * dm + np.cross(w_b, v_b) - R_wb.T @ g_w
            a_meas = f_b + np.asarray(acc_bias) + rng.normal(0, noise_acc, 3)
            w_meas = w_b + np.asarray(gyro_bias) + rng.normal(0, noise_gyro, 3)
            imu.append([ts, *a_meas, *w_meas])
            # integrate pose with the midpoint speed over this IMU step
            m_mid = 1.0 + accel_amp * np.sin(two_pi_f * (t0 + 0.5 * dt_imu))
            xi = np.concatenate([v0 * m_mid, w_b]) * dt_imu
            T_wb = T_wb.compose(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float32)))
    return poses, np.asarray(imu)
