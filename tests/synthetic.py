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


def make_world(rng, n=500, x=(-12, 12), y=(-6, 6), z=(4, 30), tile=6):
    return {
        "centers": np.stack(
            [rng.uniform(*x, n), rng.uniform(*y, n), rng.uniform(*z, n)], -1
        ).astype(np.float32),
        "sizes": rng.uniform(0.2, 0.6, n).astype(np.float32),
        # unique random texture per splat — distinctive descriptors (a flat
        # color per square makes every corner look alike and the ratio test
        # then kills most matches)
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
    }


def render(world, cam, T_cw, wh=(640, 480), bg=30.0):
    w, h = wh
    img = np.full((h, w), bg, dtype=np.float32)
    Xc = np.asarray(T_cw.apply(jnp.asarray(world["centers"])))
    uv = np.asarray(cam_models.project(cam, jnp.asarray(Xc)))
    fx = float(cam.params[0])
    order = np.argsort(-Xc[:, 2])
    tile = world["tex"].shape[1]
    for i in order:
        z = Xc[i, 2]
        if z < 0.5:
            continue
        u, v = uv[i]
        s = world["sizes"][i] * fx / z
        if s < 3 or u < -s or u > w + s or v < -s or v > h + s:
            continue
        u0f = u - s / 2.0
        v0f = v - s / 2.0
        cu0, cv0 = max(int(np.floor(u0f)), 0), max(int(np.floor(v0f)), 0)
        cu1, cv1 = min(int(np.ceil(u0f + s)), w), min(int(np.ceil(v0f + s)), h)
        if cu1 <= cu0 or cv1 <= cv0:
            continue
        # bilinear texture sampling at subpixel splat placement — corners
        # move smoothly with scale/position instead of snapping to integer
        # pixels (nearest-neighbor snapping injects ~1px systematic keypoint
        # drift that dominates the trajectory error budget)
        ty = (np.arange(cv0, cv1) + 0.5 - v0f) / s * tile - 0.5
        tx = (np.arange(cu0, cu1) + 0.5 - u0f) / s * tile - 0.5
        ty = np.clip(ty, 0.0, tile - 1.001)
        tx = np.clip(tx, 0.0, tile - 1.001)
        y0 = ty.astype(np.int32)
        x0 = tx.astype(np.int32)
        wy = (ty - y0)[:, None]
        wx = (tx - x0)[None, :]
        t00 = world["tex"][i][y0[:, None], x0[None, :]]
        t01 = world["tex"][i][y0[:, None], np.minimum(x0 + 1, tile - 1)[None, :]]
        t10 = world["tex"][i][np.minimum(y0 + 1, tile - 1)[:, None], x0[None, :]]
        t11 = world["tex"][i][
            np.minimum(y0 + 1, tile - 1)[:, None], np.minimum(x0 + 1, tile - 1)[None, :]
        ]
        img[cv0:cv1, cu0:cu1] = (
            t00 * (1 - wy) * (1 - wx) + t01 * (1 - wy) * wx + t10 * wy * (1 - wx) + t11 * wy * wx
        )
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
    return {
        "centers": np.concatenate(walls).astype(np.float32),
        "sizes": rng.uniform(0.15, 0.4, n).astype(np.float32),
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
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
    return {
        "centers": centers,
        "sizes": rng.uniform(0.25, 0.7, n).astype(np.float32),
        "tex": rng.uniform(40.0, 230.0, (n, tile, tile)).astype(np.float32),
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
):
    """Arc trajectory (constant body twist, same as arc_trajectory) plus the
    exact IMU stream a body-mounted sensor would measure.

    The camera IS the body (T_bc = I).  With constant body twist
    (v_b, w_b) = xi/dt: gyro = w_b, specific force
    f_b = w_b x v_b - R_bw g_w (coriolis of the rotating frame minus
    gravity).  ``g_world`` defaults to +y ("down" in camera convention).
    Returns (poses T_cw per frame, imu rows (ts, ax, ay, az, wx, wy, wz)).
    """
    rng = np.random.default_rng(seed)
    xi = np.array([step * 0.3, lateral, step, 0.0, yaw_rate, 0.0], np.float64) / dt_frame
    v_b, w_b = xi[:3], xi[3:]
    g_w = np.asarray(g_world, np.float64)
    dt_imu = 1.0 / imu_rate
    poses = []
    imu = []
    T_wb = lie.SE3.identity()
    n_sub = int(round(dt_frame * imu_rate))
    inc = lie.se3_exp(jnp.asarray(xi * dt_imu, dtype=jnp.float32))
    for i in range(n_frames):
        poses.append(T_wb.inverse())
        for j in range(n_sub):
            ts = i * dt_frame + (j + 1) * dt_imu
            R_wb = np.asarray(T_wb.R, np.float64)
            f_b = np.cross(w_b, v_b) - R_wb.T @ g_w
            a_meas = f_b + np.asarray(acc_bias) + rng.normal(0, noise_acc, 3)
            w_meas = w_b + np.asarray(gyro_bias) + rng.normal(0, noise_gyro, 3)
            imu.append([ts, *a_meas, *w_meas])
            T_wb = T_wb.compose(inc)
    return poses, np.asarray(imu)
