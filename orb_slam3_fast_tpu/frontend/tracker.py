"""Tracking front-end: the per-frame state machine.

TPU-native replacement for the reference ``Tracking`` thread
(``/root/reference/src/Tracking.cc``): the data-dependent state machine
(states NO_IMAGES_YET/NOT_INITIALIZED/OK/RECENTLY_LOST/LOST, Tracking.h:122)
runs on the host, while every heavy stage — extraction, matching, frustum
culling, pose optimization — is a jitted fixed-shape device program
(SURVEY.md §7: "tracking step = one jitted function"; host orchestration for
the branches RANSAC/XLA can't express).

Pipeline per frame (mirrors Tracking::Track, Tracking.cc:1798-2292):
  extract -> predict pose (const-velocity) -> motion-model match + pose opt
  (TrackWithMotionModel, :2783) with reference-keyframe fallback
  (TrackReferenceKeyFrame, :2663) -> local-map track (TrackLocalMap, :2879)
  -> keyframe decision (NeedNewKeyFrame, :2971) -> local mapping step.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.ops import matching as mat
from orb_slam3_fast_tpu.ops import twoview
from orb_slam3_fast_tpu.optim import pnp, pose_opt
from orb_slam3_fast_tpu.utils import lie, verbose
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod

# tracking states (Tracking.h:122-130)
NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
RECENTLY_LOST = "RECENTLY_LOST"
LOST = "LOST"


class TrackerConfig(NamedTuple):
    extractor: ext.ExtractorConfig = ext.ExtractorConfig(n_features=1024)
    lm_cap: int = 4096  # local-map landmark slots per tracking call
    min_init_matches: int = 100  # Tracking.cc mono init threshold
    min_motion_inliers: int = 20
    min_map_inliers: int = 30  # TrackLocalMap accept (Tracking.cc:2944)
    kf_tracked_ratio: float = 0.9  # NeedNewKeyFrame thRefRatio
    max_frames_between_kf: int = 10
    motion_radius: float = 15.0
    map_radius: float = 3.0
    max_recently_lost: int = 20  # frames before LOST
    # timestamp discontinuity that spawns a fresh map (Tracking.cc:1818-1848
    # checks mTimeStamp > mLastFrame.mTimeStamp + 1.0)
    timestamp_jump: float = 1.0
    # keyframe count above which a map is worth KEEPING on reset/jump
    # (CreateMapInAtlas vs ResetActiveMap, Tracking.cc:1824/2607: the
    # reference gates on KeyFramesInMap() > 10)
    min_kf_keep_map: int = 10
    th_depth: float = 40.0  # stereo close-point threshold (x baseline)
    max_stereo_lm_per_kf: int = 350
    # Use u_r disparity residuals in per-frame pose optimization (the
    # reference's EdgeStereo, Optimizer.cc:904-960).  ON like the reference:
    # with SAD-refined subpixel disparities the per-frame metric depth
    # constraint is what keeps the pose from sliding along the view axis —
    # without it, each keyframe's pose error is baked coherently into its
    # new stereo landmarks and the next frames snap to the displaced
    # constellation (measured: exponential x2.5/frame divergence on the
    # stereo corridor).  (The round-1 OFF default was measured against
    # INTEGER disparities, whose persistent quantization offset biased the
    # pose; SAD refinement removed that failure mode.)
    use_stereo_pose_edges: bool = True


@dataclass
class FrameState:
    kp: object  # extractor.Keypoints (device)
    ts: float
    R: np.ndarray  # T_cw
    t: np.ndarray
    obs_lm: np.ndarray  # (N,) landmark id per kp slot (-1 none)
    depth: Optional[np.ndarray] = None
    right_u: Optional[np.ndarray] = None


# ---------------------------------------------------------------------------
# jitted device helpers
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("log_sf", "n_lvl"))
def _visible_landmarks(cam, R, t, lm_pos, lm_mask, lm_normal, lm_dmin, lm_dmax, wh,
                       log_sf: float = float(np.log(1.2)), n_lvl: int = 8):
    """Frustum + scale-band + view-angle check (Frame::isInFrustum,
    /root/reference/src/Frame.cc:632-720) for a padded landmark block.
    Returns (uv, pred_level, visible)."""
    xc = jnp.einsum("ij,mj->mi", R, lm_pos) + t
    uv = cam_models.project(cam, xc)
    z_ok = xc[:, 2] > 0.05
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < wh[0]) & (uv[:, 1] >= 0) & (uv[:, 1] < wh[1])
    )
    cam_center = -R.T @ t
    po = lm_pos - cam_center[None, :]
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= lm_dmin * 0.8) & (dist <= lm_dmax * 1.2)
    view_cos = jnp.sum(po * lm_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    angle_ok = view_cos > 0.5  # Frame.cc viewingCosLimit
    # PredictScale (MapPoint.cc:543-558)
    ratio = jnp.maximum(lm_dmax / jnp.maximum(dist, 1e-9), 1.0)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / log_sf).astype(jnp.int32), 0, n_lvl - 1
    )
    return uv, pred_level, lm_mask & z_ok & in_img & dist_ok & angle_ok


_search_by_projection = jax.jit(mat.search_by_projection, static_argnames=())
_search_frame_to_frame = jax.jit(mat.search_frame_to_frame)
_search_for_initialization = jax.jit(mat.search_for_initialization)
_stereo_match = jax.jit(mat.stereo_match, static_argnames=("bf", "min_z"))
_stereo_refine = jax.jit(mat.stereo_subpixel_refine)
_fisheye_match = jax.jit(mat.fisheye_stereo_match)


@partial(jax.jit, static_argnames=("cfg", "bf", "min_z"))
def _stereo_front(il, ir, cfg, bf, min_z, scales, slot_scales):
    """Fused rectified-stereo front half: dual ORB extraction + banded
    Hamming stereo match + SAD subpixel disparity refinement as ONE device
    program (the reference forks two extraction std::threads then matches,
    Frame.cc:200-203/921-1084; one program removes every intermediate
    host<->device round trip — measured 1.5x step win on the bench rig)."""
    kp_l = ext._extract(il, cfg)
    kp_r = ext._extract(ir, cfg)
    sm = mat.stereo_match(kp_l, kp_r, scales, bf=bf, min_z=min_z, slot_scale_r=slot_scales)
    ur_ref, ok = mat.stereo_subpixel_refine(il, ir, kp_l.xy, sm.right_u, sm.valid)
    return kp_l, kp_r, sm, ur_ref, ok


@partial(jax.jit, static_argnames=("cfg",))
def _fisheye_front(il, ir, cfg, cam, cam2, R_rl, t_rl, sigma2):
    """Fused two-camera (KB8) front half: dual extraction + overlap
    match/triangulation in one program."""
    kp_l = ext._extract(il, cfg)
    kp_r = ext._extract(ir, cfg)
    fm = mat.fisheye_stereo_match(cam, cam2, kp_l, kp_r, R_rl, t_rl, sigma2)
    return kp_l, kp_r, fm


class Tracker:
    """Host orchestrator for one camera rig (mono or rectified stereo)."""

    def __init__(
        self,
        cam: cam_models.Camera,
        cfg: TrackerConfig = TrackerConfig(),
        bf: float = 0.0,
        image_wh: tuple = (640, 480),
        cam2: cam_models.Camera | None = None,  # right camera (fisheye stereo)
        T_c1_c2: np.ndarray | None = None,  # left->right extrinsics (4,4): T of c2 in c1
        world: Optional[WorldMap] = None,
        mapper=None,
        voc=None,
        kfdb=None,
        loopcloser=None,
        map_id: int = 0,
        atlas=None,
        backend=None,  # backend.pipeline.AsyncBackend: mapper+loopcloser off-thread
        timers=None,  # utils.timers.StageTimers (REGISTER_TIMES parity)
    ):
        self.cam = cam
        self.cfg = cfg
        self.bf = float(bf)
        self.cam2 = cam2
        # fisheye/two-camera stereo: R_rl, t_rl map LEFT-cam points to the
        # RIGHT camera (T_c1_c2 is the pose of cam2 in cam1 -> invert)
        self.T_rl = None
        if T_c1_c2 is not None:
            T = np.asarray(T_c1_c2, np.float64)
            R_lr, t_lr = T[:3, :3], T[:3, 3]
            self.T_rl = (
                jnp.asarray(R_lr.T, dtype=jnp.float32),
                jnp.asarray(-R_lr.T @ t_lr, dtype=jnp.float32),
            )
        self.voc = voc  # vocab.Vocabulary for place recognition (optional)
        self.kfdb = kfdb  # vocab.KeyFrameDatabase (optional)
        self.loopcloser = loopcloser  # backend.loopcloser.LoopCloser (optional)
        self.atlas = atlas  # map.atlas.Atlas (optional; enables multi-map)
        self.backend = backend
        from orb_slam3_fast_tpu.utils.timers import StageTimers

        self.timers = timers if timers is not None else StageTimers()
        self._seen_map_version = 0
        self.map_updated = False  # mbMapUpdated (Tracking.cc:1884-1891)
        self.map_id = map_id if atlas is None else atlas.current_id
        if atlas is not None:
            world = atlas.current
        self.wh = jnp.asarray(image_wh, dtype=jnp.float32)
        self.kp_cap = ext.total_capacity(cfg.extractor)
        self.world = world or WorldMap(kp_cap=self.kp_cap)
        self.mapper = mapper
        self.state = NOT_INITIALIZED
        self.scales = jnp.asarray(
            cfg.extractor.scale_factor ** np.arange(cfg.extractor.n_levels),
            dtype=jnp.float32,
        )
        self.sigma2 = ext.level_sigma2(cfg.extractor)
        # static per-slot scale vector as an INPUT buffer (see ext.slot_scales)
        self.slot_scales = jnp.asarray(ext.slot_scales(cfg.extractor))
        self.last: Optional[FrameState] = None
        self.velocity = lie.SE3.identity()  # T_cur_last
        self.init_ref: Optional[FrameState] = None
        self.ref_kf: int = -1
        self.frames_since_kf = 0
        self.lost_count = 0
        self.trajectory: list = []  # (ts, R, t) per frame
        self.stats = {"matches": [], "inliers": []}

    # ------------------------------------------------------------------
    def grab_imu(self, imu):
        """Queue IMU samples arriving before the next frame
        (Tracking::GrabImuData, Tracking.cc:1617-1628).  Each sample is
        (ts, ax, ay, az, wx, wy, wz)."""
        if not hasattr(self, "imu_queue"):
            self.imu_queue = []
        self.imu_queue.extend(np.asarray(imu, dtype=np.float64).reshape(-1, 7))

    # ------------------------------------------------------------------
    def process_mono(self, img: np.ndarray, ts: float):
        with self.timers.span("orb_extract"):
            kp = jax.block_until_ready(
                ext.extract(jnp.asarray(img, dtype=jnp.float32), self.cfg.extractor)
            )
        return self._track(kp, ts, depth=None, right_u=None)

    def process_stereo(self, img_l: np.ndarray, img_r: np.ndarray, ts: float):
        il = jnp.asarray(img_l, dtype=jnp.float32)
        ir = jnp.asarray(img_r, dtype=jnp.float32)
        if self.cam2 is not None and self.T_rl is not None:
            # non-rectified two-camera path (fisheye/KB8): match + triangulate
            # (Frame::ComputeStereoFishEyeMatches + TriangulateMatches),
            # fused with the dual extraction into one program
            with self.timers.span("orb_extract"):
                kp_l, kp_r, fm = _fisheye_front(
                    il, ir, self.cfg.extractor, self.cam, self.cam2,
                    self.T_rl[0], self.T_rl[1], jnp.asarray(self.sigma2),
                )
            with self.timers.span("stereo_match"):
                depth = np.asarray(fm.depth)
            # no rectified right-u coordinate exists: pose optimization uses
            # mono edges; metric scale is anchored through the triangulated
            # landmark depths (the reference's fisheye "ToBody" edges are the
            # planned refinement)
            ru = np.full(depth.shape, -1.0, np.float32)
            return self._track(kp_l, ts, depth=depth, right_u=ru)
        base = self.bf / float(self.cam.params[0])
        with self.timers.span("orb_extract"):
            # ONE fused program: dual extraction + banded Hamming match + SAD
            # subpixel disparity refinement (the reference's
            # ComputeStereoMatches correlation stage, Frame.cc:1005-1056).
            # Depth noise from +-0.5 px disparity quantization is bf/2
            # relative at disparity 1 — at bf~48 and 5 m depth a 1 px error
            # is 0.5 m — so refined disparity dominates the stereo ATE budget.
            kp_l, kp_r, sm, ur_ref, ok = _stereo_front(
                il, ir, self.cfg.extractor, self.bf, max(base * 2.0, 0.1),
                self.scales, self.slot_scales,
            )
        # the reference REJECTS matches whose SAD correlation minimum runs
        # off the search window (Frame.cc:1043 "if(deltaR<-1 || deltaR>1)
        # continue") — a failed refinement means the Hamming match was wrong
        with self.timers.span("stereo_match"):
            # grouped host fetch: one transfer for everything the host-side
            # state machine needs from the front half
            ok, ur, kp_xy = jax.device_get((ok, ur_ref, kp_l.xy))
        disp = np.maximum(kp_xy[:, 0] - ur, 0.01)
        depth = np.where(ok & (disp >= 0.5), self.bf / disp, -1.0)
        ru = np.where(depth > 0, ur, -1.0)
        return self._track(kp_l, ts, depth=depth, right_u=ru)

    def process_rgbd(self, img: np.ndarray, depth: np.ndarray, ts: float):
        """RGB-D: depth sampled at keypoint locations (ComputeStereoFromRGBD,
        Frame.cc:1086-1154)."""
        kp = ext.extract(jnp.asarray(img, dtype=jnp.float32), self.cfg.extractor)
        # nearest-pixel depth lookup: keypoints carry subpixel offsets, and
        # corners sit on depth edges — truncation would sample the wrong side
        xy = np.round(np.asarray(kp.xy)).astype(np.int32)
        h, w = depth.shape
        xs = np.clip(xy[:, 0], 0, w - 1)
        ys = np.clip(xy[:, 1], 0, h - 1)
        d = depth[ys, xs].astype(np.float32)
        d = np.where(np.asarray(kp.valid) & (d > 0), d, -1.0)
        ru = np.where(
            d > 0, np.asarray(kp.xy)[:, 0] - self.bf / np.maximum(d, 1e-6), -1.0
        )
        return self._track(kp, ts, depth=d, right_u=ru)

    # ------------------------------------------------------------------
    def _track(self, kp, ts, depth, right_u):
        # timestamp-jump / backwards-clock detection (Tracking.cc:1818-1848):
        # a rich map is kept and a fresh one spawned; a poor map is reset
        if (
            self.state != NOT_INITIALIZED
            and self.last is not None
            and (ts - self.last.ts > self.cfg.timestamp_jump or ts < self.last.ts)
            and self.atlas is not None
        ):
            if self.world.n_kf > self.cfg.min_kf_keep_map:
                self._create_map_in_atlas()
            else:
                self._reset_active_map()
        if self.state == NOT_INITIALIZED:
            ok = self._initialize(kp, ts, depth, right_u)
            result = (self.state, self._cur_pose())
        else:
            ok = self._track_frame(kp, ts, depth, right_u)
            result = (self.state, self._cur_pose())
        if self.last is not None:
            # reference-relative trajectory log (Tracking.cc:2268-2287):
            # store T_cur_ref so loop/BA corrections to keyframes propagate to
            # every past frame at save time (System::SaveTrajectoryTUM:579)
            r = self.ref_kf
            if r >= 0:
                R_ref, t_ref = self.world.kf_R[r], self.world.kf_t[r]
                R_rel = self.last.R @ R_ref.T
                t_rel = self.last.t - R_rel @ t_ref
                self._rel_to_ref = (R_rel, t_rel)  # for async map-change rebase
            else:
                R_rel, t_rel = self.last.R.copy(), self.last.t.copy()
            self.trajectory.append(
                (ts, R_rel, t_rel, r, self.map_id,
                 self.state == OK or self.state == NOT_INITIALIZED)
            )
        return result

    def trajectory_world(self):
        """Recover absolute per-frame poses T_cw by composing the logged
        relative pose with the CURRENT (corrected) reference-KF pose
        (System::SaveTrajectoryEuRoC composition, System.cc:748-785).
        Returns list of (ts, R, t, ok)."""
        out = []
        for ts, R_rel, t_rel, r, mid, ok in self.trajectory:
            wm = self.world
            if self.atlas is not None and self.atlas.maps[mid] is not None:
                wm = self.atlas.maps[mid]
            if r >= 0 and r < wm.n_kf:
                R_ref, t_ref = wm.kf_R[r], wm.kf_t[r]
                R = R_rel @ R_ref
                t = R_rel @ t_ref + t_rel
            else:
                R, t = R_rel, t_rel
            out.append((ts, R, t, ok))
        return out

    def _remap_after_merge(self, src_id: int, dst_id: int, kf_off: int, lm_off: int,
                           S_dst_src=None):
        """Rebase cached local ids after the Atlas merged the active map
        into a stored one (MergeLocal transplant)."""
        self.world = self.atlas.current
        self.map_id = dst_id
        if self.ref_kf >= 0:
            self.ref_kf += kf_off
        if self.last is not None:
            obs = self.last.obs_lm
            obs[obs >= 0] += lm_off
            if S_dst_src is not None:
                # transform the cached frame pose into the dst world frame
                # (same derivation as Atlas.merge_into pose transplant)
                R = np.asarray(S_dst_src.R, np.float64)
                s = float(S_dst_src.s)
                t = np.asarray(S_dst_src.t, np.float64)
                Rp = self.last.R.astype(np.float64) @ R.T
                self.last.t = (-Rp @ t + s * self.last.t.astype(np.float64)).astype(np.float32)
                self.last.R = lie.normalize_rotation_np(Rp)
        self.velocity = lie.SE3.identity()
        if self.mapper is not None:
            self.mapper.recent_lm = [ids + lm_off for ids in self.mapper.recent_lm]
        traj = []
        for ts, R_rel, t_rel, r, mid, ok in self.trajectory:
            if mid == src_id:
                traj.append((ts, R_rel, t_rel, (r + kf_off) if r >= 0 else r, dst_id, ok))
            else:
                traj.append((ts, R_rel, t_rel, r, mid, ok))
        self.trajectory = traj

    def _cur_pose(self):
        if self.last is None:
            return None
        return self.last.R, self.last.t

    def _kf_row(self, k: int) -> int:
        """KFDB row of keyframe k (global when an Atlas manages several
        maps; local ids otherwise)."""
        if self.atlas is not None:
            return self.atlas.register_kf(self.map_id, k)
        return k

    def _index_kf(self, k: int, kp):
        """Add keyframe k to the place-recognition database."""
        if self.voc is not None and self.kfdb is not None:
            _, _, bow = voc_mod.transform(self.voc, kp.desc, kp.valid)
            self.kfdb.add(self._kf_row(k), np.asarray(bow), map_id=self.map_id)

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def _initialize(self, kp, ts, depth, right_u) -> bool:
        if depth is not None:
            return self._initialize_depth(kp, ts, depth, right_u)
        return self._initialize_mono(kp, ts)

    def _initialize_depth(self, kp, ts, depth, right_u) -> bool:
        """Stereo/RGB-D init (Tracking::StereoInitialization, Tracking.cc:2294):
        first frame with >= 500 depth points becomes KF 0 at origin."""
        good = np.asarray(kp.valid) & (depth > 0)
        # reference gate is 500 KEYPOINTS (StereoInitialization "N > 500");
        # a fisheye 10 cm baseline yields far fewer triangulated DEPTHS than
        # rectified stereo, so gate on keypoints + a modest depth count
        if np.asarray(kp.valid).sum() < 500 or good.sum() < 100:
            return False
        R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        k0 = self.world.add_keyframe(kp, R0, t0, ts, depth=depth, right_u=right_u)
        self.world.init_kf_ids = [k0]
        slots = np.nonzero(good)[0]
        ray = np.asarray(cam_models.unproject(self.cam, kp.xy[slots]))
        pos = ray * depth[slots][:, None]
        ids = self.world.add_landmarks(
            pos,
            np.asarray(kp.desc)[slots],
            k0,
            slots,
            np.asarray(kp.level)[slots],
        )
        obs_lm = np.full(self.kp_cap, -1, dtype=np.int32)
        obs_lm[slots] = ids
        self._index_kf(k0, kp)
        self.last = FrameState(kp, ts, R0, t0, obs_lm, depth, right_u)
        self.ref_kf = k0
        self.state = OK
        self.frames_since_kf = 0
        return True

    def _initialize_mono(self, kp, ts) -> bool:
        """Monocular init (MonocularInitialization, Tracking.cc:2341-2431)."""
        R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        if self.init_ref is None:
            self.init_ref = FrameState(kp, ts, R0, t0, np.full(self.kp_cap, -1, np.int32))
            return False
        ref = self.init_ref
        idx, accept = _search_for_initialization(ref.kp, kp, 100.0)
        n_matches = int(np.asarray(accept).sum())
        if n_matches < self.cfg.min_init_matches:
            self.init_ref = FrameState(kp, ts, R0, t0, np.full(self.kp_cap, -1, np.int32))
            return False
        res = twoview.reconstruct(
            self.cam, ref.kp.xy, kp.xy[idx], accept, jax.random.PRNGKey(int(ts * 1e3) & 0x7FFFFFFF)
        )
        if not bool(res.success):
            return False
        good = np.asarray(res.good)
        X = np.asarray(res.X)
        # scale so median depth = 1 (CreateInitialMapMonocular, Tracking.cc:2498)
        med = float(np.median(X[good, 2]))
        if med <= 0:
            return False
        X = X / med
        R1 = np.asarray(res.R)
        t1 = np.asarray(res.t) / med
        k0 = self.world.add_keyframe(ref.kp, R0, t0, ref.ts)
        k1 = self.world.add_keyframe(kp, R1, t1, ts)
        self.world.init_kf_ids = [k0, k1]
        slots0 = np.nonzero(good)[0]
        slots1 = np.asarray(idx)[slots0]
        ids = self.world.add_landmarks(
            X[slots0],
            np.asarray(ref.kp.desc)[slots0],
            k0,
            slots0,
            np.asarray(ref.kp.level)[slots0],
        )
        self.world.add_observations(k1, slots1, ids)
        # polish with full BA on the 2-view map (the mapper owns BA)
        if self.mapper is not None:
            self.mapper.initial_ba(self.world, (k0, k1))
            self.world.update_landmark_stats(ids)
        obs_lm = np.full(self.kp_cap, -1, dtype=np.int32)
        obs_lm[slots1] = ids
        self._index_kf(k0, ref.kp)
        self._index_kf(k1, kp)
        self.last = FrameState(kp, ts, self.world.kf_R[k1], self.world.kf_t[k1], obs_lm)
        self.ref_kf = k1
        self.velocity = lie.SE3.identity()
        self.state = OK
        self.frames_since_kf = 0
        self.init_ref = None
        return True

    # ------------------------------------------------------------------
    # per-frame tracking
    # ------------------------------------------------------------------
    def _sync_backend(self):
        """Consume async-backend events before tracking a frame: apply merge
        remaps and rebase the cached pose through the reference keyframe when
        the worker changed the map (the reference's change-index handshake,
        Tracking.cc:1884-1891)."""
        b = self.backend
        if b is None:
            return
        while b.results:
            kind, info = b.results.popleft()
            if kind == "merge":
                with b.lock:
                    self._remap_after_merge(
                        info["src_id"], info["dst_id"],
                        info["kf_offset"], info["lm_offset"],
                        S_dst_src=info["S_dst_src"],
                    )
            else:  # loop closed: motion model invalid across the correction
                self.velocity = lie.SE3.identity()
        if b.map_version != self._seen_map_version:
            self._seen_map_version = b.map_version
            self.map_updated = True  # mbMapUpdated (Tracking.cc:1884-1891)
            r = self.ref_kf
            if r >= 0 and self.last is not None and hasattr(self, "_rel_to_ref"):
                R_rel, t_rel = self._rel_to_ref
                with b.lock:
                    R_ref, t_ref = self.world.kf_R[r].copy(), self.world.kf_t[r].copy()
                self.last.R = lie.normalize_rotation_np(R_rel @ R_ref)
                self.last.t = (R_rel @ t_ref + t_rel).astype(np.float32)
                self.velocity = lie.SE3.identity()

    def _track_frame(self, kp, ts, depth, right_u) -> bool:
        self._sync_backend()
        last = self.last
        # current-frame stereo measurements for pose optimization (the
        # reference builds EdgeStereo for every keypoint with mvuRight >= 0,
        # Optimizer.cc:904-960); mono-only pose opt on stereo frames leaves
        # depth constrained only through landmark positions and drifts
        self._cur_right_u = right_u
        T_last = lie.SE3(jnp.asarray(last.R), jnp.asarray(last.t))
        T_pred = self.velocity.compose(T_last)

        if self.state == OK:
            with self.timers.span("pose_pred"):
                ok, T_est, obs_lm, n_inl = self._track_motion_model(kp, T_pred, last)
                if not ok:
                    ok, T_est, obs_lm, n_inl = self._track_reference_kf(kp, T_last)
        else:
            # RECENTLY_LOST: IMU prediction bridges the visual gap when
            # available (Tracking.cc:1966-1977, InertialTracker override);
            # else relocalization (Tracking.cc:2053-2078 visual case)
            self._lost_pred_pose = None
            T_imu = self._predict_lost_pose(ts)
            if T_imu is not None:
                ok, T_est, obs_lm, n_inl = (
                    True, T_imu, np.full(self.kp_cap, -1, np.int32), 0
                )
            else:
                ok, T_est, obs_lm, n_inl = self._relocalize(kp)
                if ok:
                    self.velocity = lie.SE3.identity()

        if ok:
            with self.timers.span("lm_track"):
                ok2, T_est, obs_lm, n_inl = self._track_local_map(kp, T_est, obs_lm)
            ok = ok and ok2

        if not ok:
            if self.lost_count == 0:
                self._lost_since_ts = ts
            self.lost_count += 1
            self.state = self._lost_state(ts)
            # hold the LAST good pose while lost — unless the subclass
            # advanced it by IMU prediction (Tracking.cc:1966-1977)
            pred = getattr(self, "_lost_pred_pose", None)
            hold_R, hold_t = (
                pred if pred is not None else (last.R.copy(), last.t.copy())
            )
            self.last = FrameState(
                kp, ts, hold_R, hold_t,
                np.full(self.kp_cap, -1, np.int32), depth, right_u,
            )
            if self.state == LOST and self.atlas is not None:
                # Tracking.cc:1824-1848: a rich map is kept and a NEW map is
                # spawned (CreateMapInAtlas); a poor map is reset in place
                if self.world.n_kf > self.cfg.min_kf_keep_map:
                    self._create_map_in_atlas()
                else:
                    self._reset_active_map()
            return False

        self.lost_count = 0
        self.state = OK
        # project back to SO(3): the velocity chain vel = R R_last^T amplifies
        # float32 orthonormality defect ~x8/frame and silently skews the pose
        # within ~15 frames (see lie.normalize_rotation_np)
        R_est = lie.normalize_rotation_np(np.asarray(T_est.R))
        t_est = np.asarray(T_est.t)
        T_est = lie.SE3(jnp.asarray(R_est), jnp.asarray(t_est))
        self.velocity = T_est.compose(T_last.inverse())
        self.last = FrameState(kp, ts, R_est, t_est, obs_lm, depth, right_u)
        self.frames_since_kf += 1
        self.stats["inliers"].append(n_inl)

        with self.timers.span("kf_decision"):
            need_kf = self._need_new_keyframe(n_inl, depth)
        if need_kf:
            with self.timers.span("kf_insert"):
                self._create_keyframe()
        return True

    def _pose_opt_from_obs(self, kp, T0, obs_lm, depth=None):
        """Build PoseObs from slot->landmark association and optimize."""
        slots = np.nonzero(obs_lm >= 0)[0]
        n = self.kp_cap
        xw = np.zeros((n, 3), np.float32)
        uv = np.full((n, 3), -1.0, np.float32)
        valid = np.zeros(n, bool)
        stereo = np.zeros(n, bool)
        inv_s2 = np.ones(n, np.float32)
        xw[slots] = self.world.lm_pos[obs_lm[slots]]
        kxy = np.asarray(kp.xy)
        uv[slots, :2] = kxy[slots]
        lvl = np.asarray(kp.level)
        inv_s2[slots] = 1.0 / self.sigma2[lvl[slots]]
        valid[slots] = True
        ru = getattr(self, "_cur_right_u", None) if self.cfg.use_stereo_pose_edges else None
        if ru is not None and self.bf > 0:
            has_ru = ru[slots] > 0
            uv[slots, 2] = np.where(has_ru, ru[slots], -1.0)
            stereo[slots] = has_ru
        obs = pose_opt.PoseObs(
            xw=jnp.asarray(xw),
            uv=jnp.asarray(uv),
            inv_sigma2=jnp.asarray(inv_s2),
            is_stereo=jnp.asarray(stereo),
            valid=jnp.asarray(valid),
        )
        T, inlier, n_inl = pose_opt.pose_optimization(self.cam, jnp.float32(self.bf), T0, obs)
        inlier = np.asarray(inlier)
        obs_out = obs_lm.copy()
        obs_out[~inlier] = -1
        return T, obs_out, int(n_inl)

    def _track_motion_model(self, kp, T_pred, last: FrameState):
        """TrackWithMotionModel (Tracking.cc:2783-2876).

        All device inputs are padded to the fixed kp_cap so the matcher jit
        compiles exactly once."""
        has = last.obs_lm >= 0
        if has.sum() < 10:
            return False, T_pred, None, 0
        lm_ids = np.where(has, last.obs_lm, 0)
        pos = jnp.asarray(self.world.lm_pos[lm_ids])
        proj = cam_models.project(self.cam, T_pred.apply(pos))
        pvalid = jnp.asarray(self.world.lm_valid[lm_ids] & has)
        idx, accept = _search_frame_to_frame(
            kp,
            proj,
            pvalid,
            jnp.asarray(self.world.lm_desc[lm_ids]),
            last.kp.level,
            last.kp.angle,
            self.scales,
            radius=self.cfg.motion_radius,
        )
        acc = np.asarray(accept)
        if acc.sum() < self.cfg.min_motion_inliers:
            return False, T_pred, None, 0
        obs_lm = np.full(self.kp_cap, -1, dtype=np.int32)
        obs_lm[np.asarray(idx)[acc]] = lm_ids[acc]
        T, obs_lm, n_inl = self._pose_opt_from_obs(kp, T_pred, obs_lm)
        return n_inl >= self.cfg.min_motion_inliers, T, obs_lm, n_inl

    def _track_reference_kf(self, kp, T_last):
        """TrackReferenceKeyFrame (Tracking.cc:2663-2718): descriptor match
        against the reference keyframe's landmarks, optimize from last pose."""
        k = self.ref_kf
        if k < 0:
            return False, T_last, None, 0
        has_lm = self.world.kf_obs[k] >= 0
        idx, accept = mat.search_descriptors_mutual(
            jnp.asarray(self.world.kf_desc[k]),
            jnp.asarray(has_lm & self.world.kf_kp_valid[k]),
            kp.desc,
            kp.valid,
            th=100,
            ratio=0.85,
        )
        acc = np.asarray(accept)
        if acc.sum() < 15:
            return False, T_last, None, 0
        lm_ids = self.world.kf_obs[k][acc]
        obs_lm = np.full(self.kp_cap, -1, dtype=np.int32)
        obs_lm[np.asarray(idx)[acc]] = lm_ids
        T, obs_lm, n_inl = self._pose_opt_from_obs(kp, T_last, obs_lm)
        return n_inl >= self.cfg.min_motion_inliers, T, obs_lm, n_inl

    def _relocalize(self, kp):
        """Relocalization (Tracking.cc:3518-3676): KFDB candidates ->
        descriptor match vs candidate KF landmarks -> PnP RANSAC ->
        pose optimization.  The reference's MLPnP RANSAC loop becomes the
        batched-hypothesis solver in optim/pnp.py."""
        T0 = lie.SE3.identity()
        if self.voc is None or self.kfdb is None:
            return False, T0, None, 0
        _, _, bow = voc_mod.transform(self.voc, kp.desc, kp.valid)
        cands = self.kfdb.detect_reloc_candidates(np.asarray(bow), query_map=self.map_id)
        if self.atlas is not None:  # KFDB rows are global: resolve to local ids
            cands = [self.atlas.resolve_row(int(r))[1] for r in cands]
        for k in cands[:5]:
            k = int(k)
            has_lm = self.world.kf_obs[k] >= 0
            idx, accept = mat.search_descriptors_mutual(
                jnp.asarray(self.world.kf_desc[k]),
                jnp.asarray(has_lm & self.world.kf_kp_valid[k]),
                kp.desc,
                kp.valid,
                th=100,
                ratio=0.75,
            )
            acc = np.asarray(accept)
            if acc.sum() < 15:
                continue
            lm_ids = self.world.kf_obs[k][acc]
            slots = np.asarray(idx)[acc]
            n = self.kp_cap
            xw = np.zeros((n, 3), np.float32)
            uv = np.zeros((n, 2), np.float32)
            inv_s2 = np.ones(n, np.float32)
            valid = np.zeros(n, bool)
            xw[slots] = self.world.lm_pos[lm_ids]
            uv[slots] = np.asarray(kp.xy)[slots]
            inv_s2[slots] = 1.0 / self.sigma2[np.asarray(kp.level)[slots]]
            valid[slots] = self.world.lm_valid[lm_ids]
            res = pnp.pnp_ransac(
                self.cam,
                jnp.asarray(xw),
                jnp.asarray(uv),
                jnp.asarray(inv_s2),
                jnp.asarray(valid),
                jax.random.PRNGKey(self.world.n_kf * 1315423911 + k),
            )
            if not bool(res.ok):
                continue
            obs_lm = np.full(self.kp_cap, -1, dtype=np.int32)
            keep = np.asarray(res.inliers)[slots]
            obs_lm[slots[keep]] = lm_ids[keep]
            T_pnp = lie.SE3(jnp.asarray(res.R), jnp.asarray(res.t))
            T, obs_out, n_inl = self._pose_opt_from_obs(kp, T_pnp, obs_lm)
            if n_inl >= 20:  # reference accepts at >= 50 after re-search; the
                # local-map pass that follows widens matches the same way
                self.ref_kf = k
                return True, T, obs_out, n_inl
        return False, T0, None, 0

    def _predict_lost_pose(self, ts):
        """Pose prediction while visually lost — None for the pure-visual
        tracker (the reference only advances the pose by IMU prediction,
        Tracking.cc:1966-1977; InertialTracker overrides)."""
        return None

    def _lost_state(self, ts):
        """RECENTLY_LOST vs LOST decision.  Visual: frame-count bound; the
        inertial override uses the reference's wall-clock grace window
        (time_recently_lost, Tracking.cc:69)."""
        return (
            RECENTLY_LOST if self.lost_count < self.cfg.max_recently_lost else LOST
        )

    def _create_map_in_atlas(self):
        """Tracking::CreateMapInAtlas (Tracking.cc:2607-2649): keep the old
        map in the Atlas, start tracking into a fresh one."""
        from orb_slam3_fast_tpu.utils import verbose

        verbose.print_mess(
            f"Creation of new map with id {self.atlas.current_id + 1}",
            verbose.VERBOSITY_NORMAL,
        )
        self.world = self.atlas.create_new_map()
        self.map_id = self.atlas.current_id
        self._reset_tracking_state()

    def _reset_active_map(self):
        """Tracking::ResetActiveMap (Tracking.cc:3734): the young map is not
        worth keeping; replace it in place."""
        if self.kfdb is not None:
            self.kfdb.clear_map(self.map_id)
        self.atlas.maps[self.map_id] = self.atlas._make()
        self.world = self.atlas.current
        self._reset_tracking_state()

    def _reset_tracking_state(self):
        self.state = NOT_INITIALIZED
        self.last = None
        self.init_ref = None
        self.ref_kf = -1
        self.velocity = lie.SE3.identity()
        self.lost_count = 0
        self.frames_since_kf = 0
        if self.mapper is not None:
            self.mapper.recent_lm = []

    def _local_landmark_ids(self) -> np.ndarray:
        """UpdateLocalKeyFrames/Points (Tracking.cc:3370/3341): landmarks of
        the reference KF's covisibility neighborhood."""
        k = self.ref_kf
        kfs = [k] + list(self.world.best_covisible(k, 10, min_shared=5))
        # add temporally recent KFs
        for r in range(max(0, self.world.n_kf - 3), self.world.n_kf):
            if r not in kfs:
                kfs.append(r)
        return self.world.local_landmarks(np.asarray(kfs, dtype=np.int64))

    def _track_local_map(self, kp, T_est, obs_lm):
        """TrackLocalMap (Tracking.cc:2879-2970)."""
        lm_ids = self._local_landmark_ids()
        cap = self.cfg.lm_cap
        if len(lm_ids) > cap:
            verbose.warn_cap("tracker.local_map_landmarks", cap, len(lm_ids))
            lm_ids = lm_ids[np.random.default_rng(0).choice(len(lm_ids), cap, replace=False)]
        pad = cap - len(lm_ids)
        lm_ids_p = np.concatenate([lm_ids, np.zeros(pad, dtype=lm_ids.dtype)])
        lm_mask = np.concatenate([np.ones(len(lm_ids), bool), np.zeros(pad, bool)])
        uv, pred_level, visible = _visible_landmarks(
            self.cam,
            jnp.asarray(T_est.R),
            jnp.asarray(T_est.t),
            jnp.asarray(self.world.lm_pos[lm_ids_p]),
            jnp.asarray(lm_mask & self.world.lm_valid[lm_ids_p]),
            jnp.asarray(self.world.lm_normal[lm_ids_p]),
            jnp.asarray(self.world.lm_dmin[lm_ids_p]),
            jnp.asarray(self.world.lm_dmax[lm_ids_p]),
            self.wh,
            log_sf=float(np.log(self.cfg.extractor.scale_factor)),
            n_lvl=int(self.cfg.extractor.n_levels),
        )
        # visibility counters (GetFoundRatio bookkeeping, SearchLocalPoints)
        vis_np = np.asarray(visible)
        np.add.at(self.world.lm_visible, lm_ids_p[vis_np], 1)
        # don't re-match landmarks already associated this frame
        already = np.isin(lm_ids_p, obs_lm[obs_lm >= 0])
        search_mask = visible & jnp.asarray(~already)
        # RECENTLY_LOST / fresh-reloc frames search WIDE: the pose comes from
        # IMU prediction or PnP, whose error exceeds the steady-state radius
        # (Tracking::SearchLocalPoints th=15 when lost/just relocalized,
        # Tracking.cc:3296-3307) — without this, re-locking after an
        # occlusion never finds a single match at the 3 px tracking radius
        radius = self.cfg.map_radius if self.state == OK else 15.0
        idx, accept = _search_by_projection(
            kp,
            uv,
            search_mask,
            jnp.asarray(self.world.lm_desc[lm_ids_p]),
            pred_level,
            self.scales,
            radius=radius,
        )
        acc = np.asarray(accept)
        new_obs = obs_lm.copy()
        tgt = np.asarray(idx)[acc]
        # only fill slots that are still free
        free = new_obs[tgt] < 0
        new_obs[tgt[free]] = lm_ids_p[acc][free]
        T, new_obs, n_inl = self._pose_opt_from_obs(kp, T_est, new_obs)
        matched = new_obs >= 0
        np.add.at(self.world.lm_found, new_obs[matched], 1)
        self.stats["matches"].append(int(matched.sum()))
        return n_inl >= self.cfg.min_map_inliers, T, new_obs, n_inl

    # ------------------------------------------------------------------
    # keyframe policy
    # ------------------------------------------------------------------
    def _need_new_keyframe(self, n_inl, depth) -> bool:
        """NeedNewKeyFrame (Tracking.cc:2971-3127) simplified to its core
        conditions: c1a (max frames), c1c+c2 (tracked ratio vs reference)."""
        if self.mapper is None:
            return False
        # nRefMatches = reference KF landmarks with >= 3 observations
        # (KeyFrame::TrackedMapPoints(3), used at Tracking.cc:3009)
        ref_obs = self.world.kf_obs[self.ref_kf]
        ref_lm = ref_obs[ref_obs >= 0]
        min_obs = 3 if self.world.n_kf > 2 else 2  # Tracking.cc:2996-2998
        ref_tracked = int(
            ((self.world.lm_n_obs[ref_lm] >= min_obs) & self.world.lm_valid[ref_lm]).sum()
        )
        ref_tracked = max(ref_tracked, 15)
        c1a = self.frames_since_kf >= self.cfg.max_frames_between_kf
        ratio = self.cfg.kf_tracked_ratio
        need_close = False
        if depth is not None:
            # stereo/RGB-D: "need to insert close points" (Tracking.cc:3028-3045)
            ratio = 0.75
            base = self.bf / float(self.cam.params[0])
            close = (depth > 0) & (depth < self.cfg.th_depth * base)
            tracked_close = int((close & (self.last.obs_lm >= 0)).sum())
            untracked_close = int((close & (self.last.obs_lm < 0)).sum())
            need_close = tracked_close < 100 and untracked_close > 70
        c2 = (n_inl < ref_tracked * ratio or need_close) and n_inl > self.cfg.min_map_inliers
        min_gap = 1 if need_close else 2
        return bool((c1a or c2) and self.frames_since_kf >= min_gap)

    def _create_keyframe(self):
        """CreateNewKeyFrame (Tracking.cc:3127-3247).  With an async backend
        the keyframe is queued to the worker thread (the reference's
        LocalMapping::InsertKeyFrame); otherwise local mapping runs inline."""
        import contextlib

        last = self.last
        lock = self.backend.lock if self.backend is not None else contextlib.nullcontext()
        with lock:
            k = self.world.add_keyframe(
                last.kp, last.R, last.t, last.ts, depth=last.depth, right_u=last.right_u
            )
            slots = np.nonzero(last.obs_lm >= 0)[0]
            self.world.add_observations(k, slots, last.obs_lm[slots])
            # stereo/RGB-D: create landmarks for close unmatched points
            if last.depth is not None:
                self._create_stereo_landmarks(k, last)
        # place-recognition index (KeyFrameDatabase::add, the reference does
        # this in LoopClosing; here at insertion)
        self._index_kf(k, last.kp)
        self.ref_kf = k
        self.frames_since_kf = 0
        if self.backend is not None:
            self.backend.insert_keyframe(self.world, k, map_id=self.map_id, atlas=self.atlas)
            return
        if self.mapper is not None:
            self.mapper.process_new_keyframe(self.world, k, kfdb=self.kfdb)
        if self.loopcloser is not None:
            closed = self.loopcloser.process_keyframe(
                self.world, k, map_id=self.map_id, atlas=self.atlas
            )
            if closed:
                kind, info = closed
                # loop/merge correction rebases tracking (the reference does
                # this via mMutexMapUpdate + change index, Tracking.cc:1884):
                # the motion model is invalid across the jump
                self.velocity = lie.SE3.identity()
                if kind == "merge":
                    self._remap_after_merge(
                        info["src_id"], info["dst_id"],
                        info["kf_offset"], info["lm_offset"],
                        S_dst_src=info["S_dst_src"],
                    )
                    k = k + info["kf_offset"]
                    self.ref_kf = k
        if self.mapper is not None or self.loopcloser is not None:
            # tracking continues from the (possibly BA/loop-adjusted) KF pose
            self.last.R = self.world.kf_R[k].copy()
            self.last.t = self.world.kf_t[k].copy()

    def _create_stereo_landmarks(self, k: int, last: FrameState):
        base = self.bf / float(self.cam.params[0])
        close = (
            (last.obs_lm < 0)
            & (last.depth > 0)
            & (last.depth < self.cfg.th_depth * base)
            & np.asarray(last.kp.valid)
        )
        slots = np.nonzero(close)[0]
        if len(slots) == 0:
            return
        # closest first, capped (CreateNewKeyFrame inserts ~100 closest)
        order = np.argsort(last.depth[slots])
        slots = slots[order[: self.cfg.max_stereo_lm_per_kf]]
        ray = np.asarray(cam_models.unproject(self.cam, last.kp.xy[slots]))
        pos_c = ray * last.depth[slots][:, None]
        Rwc = last.R.T
        pos_w = pos_c @ Rwc.T + (-Rwc @ last.t)[None, :]
        ids = self.world.add_landmarks(
            pos_w.astype(np.float32),
            np.asarray(last.kp.desc)[slots],
            k,
            slots,
            np.asarray(last.kp.level)[slots],
        )
        self.last.obs_lm[slots] = ids
