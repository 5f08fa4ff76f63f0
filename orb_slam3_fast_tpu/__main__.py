"""Runnable entry point: `python -m orb_slam3_fast_tpu --config C --seq DIR`.

TPU-native replacement for the reference's per-dataset example mains
(``/root/reference/Examples/Stereo-Inertial/stereo_inertial_euroc.cc:50-230``
etc.): load images/IMU, construct :class:`~orb_slam3_fast_tpu.slam.system.System`,
feed frames, save trajectories, report timing.

Because this environment ships no datasets, ``--seq synthetic:<name>``
generates a deterministic synthetic benchmark sequence in-process (textured
world-anchored quads, GT poses, exact IMU) and reports ATE against its own
ground truth — one command reproduces the numbers in RESULTS.md:

    python -m orb_slam3_fast_tpu --config configs/synthetic_stereo.yaml \
        --seq synthetic:corridor --sensor stereo --out /tmp/run
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build_synthetic(name: str, sensor: str, n_frames: int, settings):
    """Yield dataset frames + ground truth from the synthetic benchmark."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests import synthetic as syn

    rng = np.random.default_rng(0)
    wh = (settings.width, settings.height)
    if name == "corridor":
        world = syn.make_corridor_world(rng, n=900)
        poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
        imu = None
        if "inertial" in sensor:
            poses, imu = syn.arc_trajectory_with_imu(
                n_frames, step=0.06, lateral=0.05,
                gyro_bias=(0.002, -0.001, 0.0015), acc_bias=(0.03, -0.02, 0.04),
                noise_gyro=1.7e-4 * np.sqrt(200.0), noise_acc=2e-3 * np.sqrt(200.0),
            )
    elif name == "ring":
        world = syn.make_ring_world(rng)
        poses = syn.circle_trajectory(n_frames, radius=4.0, frac=1.12)
        imu = None
    else:
        raise SystemExit(f"unknown synthetic sequence '{name}' (corridor|ring)")

    baseline = settings.bf / float(np.asarray(settings.cam.params)[0]) if settings.bf else 0.12
    imu_i = 0

    def frames():
        nonlocal imu_i
        for i, T in enumerate(poses):
            ts = i * 0.05
            chunk = None
            if imu is not None:
                j = imu_i
                while j < len(imu) and imu[j, 0] <= ts + 1e-9:
                    j += 1
                chunk = imu[imu_i:j]
                imu_i = j
            if sensor.startswith("stereo"):
                if settings.cam2 is not None and settings.T_c1_c2 is not None:
                    il, ir = syn.stereo_pair_cams(
                        world, settings.cam, settings.cam2, T, settings.T_c1_c2, wh=wh
                    )
                else:
                    il, ir = syn.stereo_pair(world, settings.cam, T, baseline, wh=wh)
                yield ts, (il, ir), chunk, np.asarray(T.inverse().t)
            else:
                yield ts, (syn.render(world, settings.cam, T, wh=wh),), chunk, np.asarray(
                    T.inverse().t
                )

    return frames()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="orb_slam3_fast_tpu")
    ap.add_argument("--config", required=True, help="settings YAML (reference schema)")
    ap.add_argument("--seq", required=True,
                    help="dataset dir (EuRoC mav0 / TUM-RGBD / KITTI) or synthetic:<name>")
    ap.add_argument("--sensor", default="stereo",
                    choices=["monocular", "stereo", "rgbd", "monocular-inertial",
                             "stereo-inertial", "rgbd-inertial"])
    ap.add_argument("--dataset", default="euroc", choices=["euroc", "tum-rgbd", "kitti"],
                    help="dataset layout for non-synthetic --seq")
    ap.add_argument("--frames", type=int, default=60, help="synthetic sequence length")
    ap.add_argument("--out", default="/tmp/orb_slam3_fast_tpu_out")
    ap.add_argument("--timestamps", default=None, help="EuRoC timestamp list file")
    ap.add_argument("--sync", action="store_true", help="run the backend inline")
    ap.add_argument("--viz", action="store_true",
                    help="dump map/frame renderings to OUT/viz every 20 frames "
                         "(the reference Viewer thread, headless)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this rig's sitecustomize "
                         "overrides JAX_PLATFORMS, so a config update is needed)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from orb_slam3_fast_tpu.eval import ate
    from orb_slam3_fast_tpu.slam.settings import Settings
    from orb_slam3_fast_tpu.slam.system import System

    settings = Settings.from_yaml(args.config, sensor=args.sensor)
    slam = System(settings, sensor=args.sensor, async_backend=not args.sync)
    os.makedirs(args.out, exist_ok=True)

    gt_by_ts = {}
    if args.seq.startswith("synthetic:"):
        stream = _build_synthetic(args.seq.split(":", 1)[1], args.sensor, args.frames, settings)
    else:
        from orb_slam3_fast_tpu.datasets import loaders

        if args.dataset == "euroc":
            dl = loaders.EuRoCLoader(args.seq, stereo=args.sensor.startswith("stereo"),
                                     imu="inertial" in args.sensor,
                                     timestamps=args.timestamps)
        elif args.dataset == "tum-rgbd":
            dl = loaders.TUMRGBDLoader(args.seq)
        else:
            dl = loaders.KITTILoader(args.seq, stereo=args.sensor.startswith("stereo"))

        def stream_gen():
            for fr in dl:
                imgs = (fr.img,) if fr.img_right is None else (fr.img, fr.img_right)
                if fr.depth is not None:
                    imgs = (fr.img, fr.depth)
                yield fr.ts, imgs, fr.imu, None

        stream = stream_gen()

    snap = None
    if args.viz:
        from orb_slam3_fast_tpu.viz.viewer import SnapshotViewer

        snap = SnapshotViewer(os.path.join(args.out, "viz"))
    n = 0
    t_start = time.perf_counter()
    for ts, imgs, imu, gt in stream:
        if gt is not None:
            gt_by_ts[round(ts, 6)] = gt
        kw = {"imu": imu} if imu is not None else {}
        if args.sensor.startswith("stereo"):
            state, pose = slam.track_stereo(imgs[0], imgs[1], ts, **kw)
        elif args.sensor.startswith("rgbd"):
            state, pose = slam.track_rgbd(imgs[0], imgs[1], ts, **kw)
        else:
            state, pose = slam.track_monocular(imgs[0], ts, **kw)
        n += 1
        if snap is not None:
            snap.maybe_snapshot(slam.tracker, img=imgs[0])
        if n % 20 == 0:
            print(f"  frame {n}: {state}", flush=True)
    wall = time.perf_counter() - t_start
    slam.shutdown()

    traj = os.path.join(args.out, "CameraTrajectory.txt")
    slam.save_trajectory_tum(traj)
    slam.save_keyframe_trajectory_tum(os.path.join(args.out, "KeyFrameTrajectory.txt"))
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} fps incl. host render/IO)")
    print(f"trajectory saved to {traj}")
    print(slam.print_time_stats())

    if gt_by_ts:
        est, gt, ts_l = [], [], []
        for tsv, R, t, ok in slam.tracker.trajectory_world():
            key = round(tsv, 6)
            if ok and key in gt_by_ts:
                est.append(-R.T @ t)
                gt.append(gt_by_ts[key])
                ts_l.append(tsv)
        if len(est) >= 5:
            est, gt, ts_l = np.asarray(est), np.asarray(gt), np.asarray(ts_l)
            with_scale = args.sensor.startswith("monocular")
            rmse, _, s = ate.ate_rmse(ts_l, est, ts_l, gt, with_scale=with_scale)
            report = {
                "sequence": args.seq, "sensor": args.sensor, "frames": n,
                "tracked": len(est), "ate_rmse": round(float(rmse), 4),
                "scale": round(float(s), 4), "fps_incl_host": round(n / wall, 2),
            }
            print(json.dumps(report))
            with open(os.path.join(args.out, "report.json"), "w") as f:
                json.dump(report, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
