"""System facade: the user-facing API of the SLAM engine.

TPU-native replacement for ``System`` (``/root/reference/src/System.cc``,
``include/System.h:105-195``): constructor wires vocabulary + keyframe
database + atlas/world + tracking + local mapping + loop closing
(System.cc:130-265 — the reference spawns std::threads; here the pipeline is
synchronous per frame, with the same stage boundaries), ``TrackMonocular/
TrackStereo/TrackRGBD`` feed frames (+ IMU batches), ``Shutdown`` finalizes,
and the trajectory savers write the reference's exact TUM / EuRoC / KITTI
formats (System.cc:579/641/672/1244) so ``evaluation/evaluate_ate_scale.py``
works unchanged.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from orb_slam3_fast_tpu.backend.loopcloser import LoopCloser, LoopCloserConfig
from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.backend.pipeline import AsyncBackend
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.atlas import Atlas
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.slam.settings import Settings
from orb_slam3_fast_tpu.utils.timers import StageTimers
from orb_slam3_fast_tpu.vocab import database as db_mod
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod

MONOCULAR = "monocular"
STEREO = "stereo"
RGBD = "rgbd"
IMU_MONOCULAR = "monocular-inertial"
IMU_STEREO = "stereo-inertial"
IMU_RGBD = "rgbd-inertial"


class System:
    def __init__(
        self,
        settings: Settings | str,
        sensor: str = MONOCULAR,
        vocabulary: voc_mod.Vocabulary | None = None,
        max_keyframes: int = 512,
        enable_loop_closing: bool = True,
        tracker_overrides: dict | None = None,
        async_backend: bool = True,
        multi_map: bool = True,
    ):
        """``async_backend``: run LocalMapping+LoopClosing on a worker thread
        (the reference's std::thread pipeline, System.cc:221,241); False runs
        them inline per keyframe (deterministic, for tests).
        ``multi_map``: enable the Atlas (new map on loss + Sim3 merge)."""
        if isinstance(settings, str):
            settings = Settings.from_yaml(settings, sensor=sensor)
        self.settings = settings
        self.sensor = sensor
        self.inertial = "inertial" in sensor
        # vocabulary load (System.cc:130-137; ours is trained, not parsed)
        self.voc = vocabulary or voc_mod.default_vocabulary()
        self.kfdb = db_mod.KeyFrameDatabase(self.voc.n_words, max_kf=max_keyframes)
        # multi-chip: bring up the process group (no-op single-host) and
        # shard place-recognition scoring over the global mesh (SURVEY §2.3
        # north star; the reference walks its inverted file on one thread)
        # initialize the process group BEFORE the first jax.devices() call:
        # touching the backend first would pin a per-host device list and make
        # jax.distributed.initialize raise on a real pod (advisor r4 finding)
        from orb_slam3_fast_tpu.parallel import multihost

        multihost.initialize()
        import jax as _jax

        if len(_jax.devices()) > 1 and max_keyframes % len(_jax.devices()) == 0:
            self.kfdb.attach_mesh(multihost.global_mesh())

        ecfg = ext.ExtractorConfig(
            n_features=settings.n_features,
            n_levels=settings.n_levels,
            scale_factor=settings.scale_factor,
            ini_th_fast=settings.ini_th_fast,
            min_th_fast=settings.min_th_fast,
        )
        overrides = dict(tracker_overrides or {})
        tcfg = trk.TrackerConfig(extractor=ecfg, th_depth=settings.th_depth)._replace(**overrides)
        sigma2 = ext.level_sigma2(ecfg)
        wh = (settings.new_width or settings.width, settings.new_height or settings.height)

        def make_map():
            return WorldMap(
                kp_cap=ext.total_capacity(ecfg),
                max_kf=max_keyframes,
                n_levels=settings.n_levels,
                scale_factor=settings.scale_factor,
            )

        self.atlas = Atlas(make_map) if multi_map else None
        self.world = self.atlas.current if self.atlas else make_map()
        self.mapper = Mapper(settings.cam, bf=settings.bf, sigma2=sigma2)
        self.loopcloser = None
        if enable_loop_closing:
            lcfg = LoopCloserConfig(fix_scale=(sensor != MONOCULAR))
            self.loopcloser = LoopCloser(
                settings.cam, self.voc, self.kfdb, self.mapper,
                bf=settings.bf, cfg=lcfg, sigma2=sigma2,
            )
        self.backend = None
        if async_backend:
            self.backend = AsyncBackend(self.mapper, self.loopcloser, kfdb=self.kfdb)
        self.timers = StageTimers()
        common = dict(
            bf=settings.bf, image_wh=wh, world=self.world, mapper=self.mapper,
            voc=self.voc, kfdb=self.kfdb, loopcloser=self.loopcloser,
            atlas=self.atlas, backend=self.backend, timers=self.timers,
        )
        if settings.camera_type == "KannalaBrandt8" and settings.cam2 is not None:
            # non-rectified fisheye stereo rig (TUM-VI): the tracker matches
            # and triangulates across the two KB8 cameras directly
            common["cam2"] = settings.cam2
            common["T_c1_c2"] = settings.T_c1_c2
        if self.inertial:
            # System.cc:203 + Tracking.cc:567-654: "-inertial" sensors get
            # the IMU-coupled tracker built from the YAML's IMU block
            from orb_slam3_fast_tpu.frontend.vi_tracker import (
                InertialConfig,
                InertialTracker,
            )
            from orb_slam3_fast_tpu.imu import preintegration as pre

            noise = pre.ImuNoise.from_continuous(
                settings.imu_noise_gyro, settings.imu_noise_acc,
                settings.imu_gyro_walk, settings.imu_acc_walk,
                settings.imu_frequency,
            )
            n_bucket = int(2 ** np.ceil(np.log2(max(
                2 * settings.imu_frequency / max(settings.fps, 1.0), 16
            ))))
            self.tracker = InertialTracker(
                settings.cam, tcfg,
                T_bc=settings.T_b_c1, noise=noise,
                icfg=InertialConfig(
                    fix_scale=(sensor != IMU_MONOCULAR),
                    imu_bucket=n_bucket,
                ),
                **common,
            )
        else:
            self.tracker = trk.Tracker(settings.cam, tcfg, **common)
        if self.inertial and self.loopcloser is not None:
            # MergeInertialBA (Optimizer.cc:3996): after a cross-map weld the
            # loop closer re-optimizes the welding window with preintegration
            # edges via the tracker's VI-BA (tracker state untouched — it
            # rebases from the merge event)
            self.loopcloser.inertial_ba = (
                lambda w, kn, window=None: self.tracker._local_inertial_ba(
                    kn, window=window, world=w, sync_tracker=False
                )
            )
            # FullInertialBA (Optimizer.cc:374-780): the loop closer's
            # inertial GBA thunk — uncapped implicit-Schur CG over the whole
            # chain, abortable, lock-aware (runs on the GBA thread)
            self.loopcloser.inertial_gba = self.tracker._full_inertial_ba
            # dedicated MergeInertialBA 6+6 welding window (Opt.cc:3996-4543)
            self.loopcloser.merge_inertial_ba = (
                lambda w, kn, c2: self.tracker._merge_inertial_ba(w, kn, c2)
            )
        self._finished = False

    # ------------------------------------------------------------------
    def _preprocess(self, img: np.ndarray) -> np.ndarray:
        """Color -> gray + optional resize (System::TrackStereo 288-298,
        Tracking::GrabImage* cvtColor 1394-1411)."""
        img = np.asarray(img)
        if img.ndim == 3:
            # RGB/BGR -> gray with the reference's cvtColor weights
            w = (
                np.array([0.299, 0.587, 0.114], np.float32)
                if self.settings.rgb
                else np.array([0.114, 0.587, 0.299], np.float32)
            )
            img = img.astype(np.float32) @ w
        img = img.astype(np.float32)
        nw, nh = self.settings.new_width, self.settings.new_height
        if nw and nh and (img.shape[1] != nw or img.shape[0] != nh):
            from orb_slam3_fast_tpu.ops import rectify as rect

            with self.timers.span("resize"):
                img = rect.resize_bilinear(img, (nw, nh))
        return img

    def track_monocular(self, img, ts: float, imu=()):
        assert self.sensor in (MONOCULAR, IMU_MONOCULAR)
        img = self._preprocess(img)
        if self.inertial and len(imu):
            self.tracker.grab_imu(imu)
        with self.timers.span("track_total"):
            state, pose = self.tracker.process_mono(img, ts)
        return state, pose

    def track_stereo(self, img_l, img_r, ts: float, imu=()):
        assert self.sensor in (STEREO, IMU_STEREO)
        img_l = self._preprocess(img_l)
        img_r = self._preprocess(img_r)
        if self.settings.rect_map_left is not None:
            with self.timers.span("rectify"):
                img_l, img_r = self.settings.rectify(img_l, img_r)
        if self.inertial and len(imu):
            self.tracker.grab_imu(imu)
        with self.timers.span("track_total"):
            state, pose = self.tracker.process_stereo(img_l, img_r, ts)
        return state, pose

    def track_rgbd(self, img, depth, ts: float, imu=()):
        assert self.sensor in (RGBD, IMU_RGBD)
        img = self._preprocess(img)
        depth = np.asarray(depth, dtype=np.float32)
        if self.settings.depth_map_factor != 1.0:
            depth = depth / self.settings.depth_map_factor
        if self.inertial and len(imu):
            # the reference feeds the IMU queue for every "-inertial" sensor
            # including IMU_RGBD (System.cc:338-340 / :430-432)
            self.tracker.grab_imu(imu)
        with self.timers.span("track_total"):
            state, pose = self.tracker.process_rgbd(img, depth, ts)
        return state, pose

    # ------------------------------------------------------------------
    def shutdown(self):
        """System::Shutdown (System.cc:528-572): drain the backend thread,
        finalize + optionally save."""
        self._finished = True
        if self.backend is not None:
            self.backend.wait_idle(timeout=60)
            self.backend.shutdown()
        if self.settings.save_atlas:
            self.save_atlas(self.settings.save_atlas + ".npz")

    def get_tracking_state(self):
        return self.tracker.state

    def _map_change_index(self) -> int:
        cur = getattr(self.world, "change_index", 0)
        if self.backend is not None:
            cur += self.backend.map_version
        if self.loopcloser is not None:
            cur += self.loopcloser.n_loops_closed + self.loopcloser.n_maps_merged
        return cur

    def map_changed(self) -> bool:
        """Change-index handshake (System::MapChanged, System.cc:508 /
        Map::GetMapChangeIndex, Map.cc:306-324): True exactly once per map
        update (BA write-back, gauge transform, loop, merge) since the
        previous query."""
        cur = self._map_change_index()
        changed = cur != getattr(self, "_last_map_change", 0)
        self._last_map_change = cur
        return changed

    # ------------------------------------------------------------------
    # trajectory savers (exact reference formats)
    # ------------------------------------------------------------------
    def _world_frames(self, only_ok=True):
        for ts, R, t, ok in self.tracker.trajectory_world():
            if only_ok and not ok:
                continue
            Rwc = R.T
            c = -Rwc @ t
            yield ts, Rwc, c

    @staticmethod
    def _quat(Rwc) -> np.ndarray:
        import jax.numpy as jnp

        from orb_slam3_fast_tpu.utils import lie

        q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(Rwc)))
        return q  # [w, x, y, z]

    def save_trajectory_tum(self, path: str):
        """TUM format: 'ts tx ty tz qx qy qz qw' (System::SaveTrajectoryTUM,
        System.cc:579-640)."""
        with open(path, "w") as f:
            for ts, Rwc, c in self._world_frames():
                q = self._quat(Rwc)
                f.write(
                    f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_euroc(self, path: str):
        """EuRoC format: timestamps in ns (System::SaveTrajectoryEuRoC,
        System.cc:672-790)."""
        with open(path, "w") as f:
            for ts, Rwc, c in self._world_frames():
                q = self._quat(Rwc)
                f.write(
                    f"{ts*1e9:.0f} {c[0]:.9f} {c[1]:.9f} {c[2]:.9f} "
                    f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
                )

    def save_keyframe_trajectory_tum(self, path: str):
        """System::SaveKeyFrameTrajectoryTUM (System.cc:1244-1300)."""
        w = self.tracker.world
        with open(path, "w") as f:
            for k in range(w.n_kf):
                if not w.kf_valid[k]:
                    continue
                Rwc = w.kf_R[k].T
                c = -Rwc @ w.kf_t[k]
                q = self._quat(Rwc)
                f.write(
                    f"{w.kf_ts[k]:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 3x4 row-major pose per line
        (System::SaveTrajectoryKITTI, System.cc:1567-1640)."""
        with open(path, "w") as f:
            for ts, Rwc, c in self._world_frames():
                P = np.concatenate([Rwc, c[:, None]], axis=1).reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in P) + "\n")

    # ------------------------------------------------------------------
    # persistence (SaveAtlas/LoadAtlas, System.cc:1430-1529)
    # ------------------------------------------------------------------
    def save_atlas(self, path: str):
        """System::SaveAtlas (System.cc:1430): the WHOLE multi-map atlas when
        one exists, else the single map — plus the vocabulary MD5 so a reload
        against a different vocabulary is rejected (CalculateCheckSum,
        System.cc:1531)."""
        if self.atlas is not None:
            self.atlas.save(path)
        else:
            self.tracker.world.save(path)
        try:
            with open(path + ".md5", "w") as f:
                f.write(self.voc.checksum())
        except OSError:
            pass

    def load_atlas(self, path: str):
        import os

        md5_path = path + ".md5"
        if os.path.exists(md5_path):
            with open(md5_path) as f:
                saved = f.read().strip()
            if saved != self.voc.checksum():
                raise ValueError(
                    "vocabulary checksum mismatch: the atlas was built with a "
                    "different vocabulary (System::LoadAtlas guard, "
                    "System.cc:1505-1529)"
                )
        if self.atlas is not None and os.path.exists(f"{path}.atlas.npz"):
            from orb_slam3_fast_tpu.map.atlas import Atlas

            self.atlas = Atlas.load(path, self.atlas._make)
            self.tracker.atlas = self.atlas
            self.world = self.atlas.current
            self.tracker.world = self.world
            self.tracker.map_id = self.atlas.current_id
            return
        self.world = WorldMap.load(path)
        self.tracker.world = self.world
        if self.atlas is not None:
            self.atlas.maps[self.atlas.current_id] = self.world

    # ------------------------------------------------------------------
    def print_time_stats(self):
        """Tracking::PrintTimeStats equivalent (Tracking.cc:189-268)."""
        return self.timers.summary()
