"""Offline visualization: map drawer, frame drawer, trajectory plots.

TPU-native stand-in for the reference's Pangolin GUI stack
(``/root/reference/src/{Viewer,FrameDrawer,MapDrawer}.cc``): the reference
runs an OpenGL thread rendering map points, keyframe frusta, the
covisibility/spanning graph and a keypoint overlay (MapDrawer.h:47-55,
FrameDrawer::Update).  A TPU host has no display — the same renderings are
produced OFFLINE (matplotlib Agg) as PNGs / numpy images, either on demand
or as a periodic dump during a run (Viewer.Run's refresh loop becomes
``SnapshotViewer.maybe_snapshot``).
"""
from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def draw_frame(img: np.ndarray, kp_xy: np.ndarray, matched: np.ndarray,
               state: str = "", path: str | None = None) -> np.ndarray:
    """FrameDrawer equivalent: keypoint overlay (matched = green, new = blue)
    + status text (FrameDrawer::DrawFrame).  Returns an RGB uint8 array."""
    plt = _mpl()
    fig = plt.figure(figsize=(img.shape[1] / 100, img.shape[0] / 100), dpi=100)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    kp_xy = np.asarray(kp_xy)
    matched = np.asarray(matched)
    if len(kp_xy):
        ax.scatter(kp_xy[~matched, 0], kp_xy[~matched, 1], s=6, c="#4477ff", marker="s",
                   linewidths=0.5, facecolors="none")
        ax.scatter(kp_xy[matched, 0], kp_xy[matched, 1], s=8, c="#22cc44", marker="s",
                   linewidths=0.7, facecolors="none")
    ax.text(6, img.shape[0] - 10, f"{state}  KPs: {len(kp_xy)}  matched: {int(matched.sum())}",
            color="w", fontsize=9, backgroundcolor="black")
    ax.set_xlim(0, img.shape[1])
    ax.set_ylim(img.shape[0], 0)
    ax.axis("off")
    fig.canvas.draw()
    out = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if path:
        fig.savefig(path)
    plt.close(fig)
    return out


def draw_map(world, path: str | None = None, trajectory=None,
             show_graph: bool = True, min_covis: int = 30) -> np.ndarray:
    """MapDrawer equivalent: top-down (x-z) map points, keyframe frusta,
    covisibility graph edges, optional per-frame trajectory
    (MapDrawer::DrawMapPoints/DrawKeyFrames/DrawCurrentCamera)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 8), dpi=100)
    ids = np.nonzero(world.lm_valid[: world.n_lm])[0]
    if len(ids):
        P = world.lm_pos[ids]
        ax.scatter(P[:, 0], P[:, 2], s=1, c="#999999", alpha=0.5, label="map points")
    K = world.n_kf
    centers = []
    for k in range(K):
        if not world.kf_valid[k]:
            centers.append(None)
            continue
        c = world.camera_center(k)
        centers.append(c)
        # frustum direction = camera +z in world
        d = world.kf_R[k].T @ np.array([0, 0, 1.0])
        ax.plot([c[0], c[0] + 0.3 * d[0]], [c[2], c[2] + 0.3 * d[2]], c="#2255cc", lw=0.8)
        ax.scatter([c[0]], [c[2]], s=10, c="#2255cc", marker="s")
    if show_graph and K > 1:
        for k in range(K):
            if centers[k] is None:
                continue
            counts = world.covisibility_counts(k)
            for j in np.nonzero(counts >= min_covis)[0]:
                if j > k or centers[int(j)] is None:
                    continue
                a, b = centers[k], centers[int(j)]
                ax.plot([a[0], b[0]], [a[2], b[2]], c="#22cc44", lw=0.4, alpha=0.5)
    if trajectory is not None and len(trajectory):
        T = np.asarray(trajectory)
        ax.plot(T[:, 0], T[:, 2], c="#cc3322", lw=1.2, label="trajectory")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.canvas.draw()
    out = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if path:
        fig.savefig(path)
    plt.close(fig)
    return out


class SnapshotViewer:
    """Viewer::Run equivalent for headless runs: periodically dump the map
    and current-frame renderings to a directory."""

    def __init__(self, out_dir: str, every_n_frames: int = 20):
        self.out_dir = out_dir
        self.every = every_n_frames
        self.n = 0
        os.makedirs(out_dir, exist_ok=True)

    def maybe_snapshot(self, tracker, img=None):
        self.n += 1
        if self.n % self.every:
            return
        world = tracker.world
        traj = [
            -R.T @ t for (_, R, t, ok) in tracker.trajectory_world() if ok
        ]
        draw_map(world, os.path.join(self.out_dir, f"map_{self.n:05d}.png"),
                 trajectory=np.asarray(traj) if traj else None)
        if img is not None and tracker.last is not None:
            kp_xy = np.asarray(tracker.last.kp.xy)
            valid = np.asarray(tracker.last.kp.valid)
            matched = tracker.last.obs_lm >= 0
            draw_frame(img, kp_xy[valid], matched[valid], state=tracker.state,
                       path=os.path.join(self.out_dir, f"frame_{self.n:05d}.png"))
