"""Debug harness for the stereo corridor e2e (mirrors test_stereo_e2e).
Run: python -m tests.debug_corridor"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.eval import ate
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)


from orb_slam3_fast_tpu.backend import mapper as mapper_mod


class AblMapper(Mapper):
    def _fuse_neighbors(self, world, k):
        if os.environ.get("DBG_NOFUSE") == "1":
            return
        return super()._fuse_neighbors(world, k)

    def _local_ba(self, world, k):
        if os.environ.get("DBG_NOBA") == "1":
            return
        return super()._local_ba(world, k)

    def _triangulate_new(self, world, k):
        if os.environ.get("DBG_NOTRI") == "1":
            return np.zeros(0, dtype=np.int32)
        return super()._triangulate_new(world, k)


GT_POSE = [None]  # set per-frame by main loop


def match_truth(world_map, kp, obs_lm, cam):
    """Fraction of slot->landmark associations that are geometrically correct
    under the GT pose (reprojection within 3 px)."""
    if GT_POSE[0] is None:
        return -1.0, 0
    T = GT_POSE[0]
    slots = np.nonzero(obs_lm >= 0)[0]
    if len(slots) == 0:
        return -1.0, 0
    lm = obs_lm[slots]
    import jax.numpy as jnp
    from orb_slam3_fast_tpu.cameras import models as cm

    xc = world_map.lm_pos[lm] @ np.asarray(T.R).T + np.asarray(T.t)
    uv = np.asarray(cm.project(cam, jnp.asarray(xc)))
    d = np.linalg.norm(uv - np.asarray(kp.xy)[slots], axis=1)
    return float((d < 3.0).mean()), len(slots)


class DebugTracker(trk.Tracker):
    def _track_motion_model(self, kp, T_pred, last):
        ok, T, obs, n = super()._track_motion_model(kp, T_pred, last)
        n_cand = int((last.obs_lm >= 0).sum())
        frac, nn = match_truth(self.world, kp, obs, self.cam) if obs is not None else (-1, 0)
        print(f"      [mm] last_lm={n_cand} ok={ok} n_inl={n} gt_correct={frac:.2f}/{nn}")
        return ok, T, obs, n

    def _track_reference_kf(self, kp, T_last):
        ok, T, obs, n = super()._track_reference_kf(kp, T_last)
        print(f"      [ref] ok={ok} n_inl={n}")
        return ok, T, obs, n

    def _track_local_map(self, kp, T_est, obs_lm):
        lm_ids = self._local_landmark_ids()
        ok, T, obs, n = super()._track_local_map(kp, T_est, obs_lm)
        frac, nn = match_truth(self.world, kp, obs, self.cam)

        def med_resid(Rm, tm):
            import jax.numpy as jnp
            from orb_slam3_fast_tpu.cameras import models as cm

            slots = np.nonzero(obs >= 0)[0]
            if len(slots) == 0:
                return -1.0
            xc = self.world.lm_pos[obs[slots]] @ np.asarray(Rm).T + np.asarray(tm)
            uv = np.asarray(cm.project(self.cam, jnp.asarray(xc)))
            return float(np.median(np.linalg.norm(uv - np.asarray(kp.xy)[slots], axis=1)))

        r_est = med_resid(T.R, T.t)
        r_gt = med_resid(GT_POSE[0].R, GT_POSE[0].t) if GT_POSE[0] is not None else -1
        print(
            f"      [lm] local={len(lm_ids)} pre_obs={int((obs_lm>=0).sum())} "
            f"ok={ok} n_inl={n} dT={np.linalg.norm(np.asarray(T.t)-np.asarray(T_est.t)):.4f} "
            f"gt_correct={frac:.2f}/{nn} med_resid_est={r_est:.2f}px med_resid_gt={r_gt:.2f}px"
        )
        return ok, T, obs, n


def main():
    rng = np.random.default_rng(1)
    world = syn.make_corridor_world(rng, n=900)
    n_frames = 30
    poses = syn.arc_trajectory(n_frames, step=0.06, lateral=0.05)
    baseline = 0.12
    bf = baseline * 400.0
    mapper = AblMapper(CAM, bf=bf, sigma2=ext.level_sigma2(CFG.extractor))
    t = DebugTracker(CAM, CFG, bf=bf,
                     world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
                     mapper=mapper)
    gt, est, ts = [], [], []
    prev_lm = 0
    for i, T in enumerate(poses):
        img_l, img_r = syn.stereo_pair(world, CAM, T, baseline)
        prev_kf = t.world.n_kf
        GT_POSE[0] = T
        state, pose = t.process_stereo(img_l, img_r, i * 0.05)
        inl = t.stats["inliers"][-1] if t.stats["inliers"] else -1
        new_lm = t.world.n_lm - prev_lm
        prev_lm = t.world.n_lm
        err = -1.0
        evec = np.zeros(3)
        rerr = 0.0
        if pose is not None:
            R, tt = pose
            c_est = -R.T @ tt
            c_gt = np.asarray(T.inverse().t)
            evec = np.asarray(T.R) @ (c_est - c_gt)  # error in GT camera frame
            err = float(np.linalg.norm(c_est - c_gt))
            Rg = np.asarray(T.R)
            rerr = np.degrees(np.arccos(np.clip((np.trace(R @ Rg.T) - 1) / 2, -1, 1)))
            # error rotation axis (in GT camera frame)
            dR = R @ Rg.T
            ax = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]])
            ax = ax / max(np.linalg.norm(ax), 1e-9)
            evec = np.concatenate([evec, ax])  # reuse print slot
            if state == trk.OK:
                est.append(c_est)
                gt.append(c_gt)
                ts.append(i * 0.05)
        nd = -1
        if t.last is not None and t.last.depth is not None:
            nd = int((t.last.depth > 0).sum())
        print(
            f"f{i:3d} {state:15s} inl={inl:4d} kf={'+' if t.world.n_kf>prev_kf else ' '}"
            f"{t.world.n_kf:3d} lm={t.world.n_lm:5d} (+{new_lm:4d}) ndepth={nd:4d} c_err={err:.4f} "
            f"evec=[{evec[0]:+.3f},{evec[1]:+.3f},{evec[2]:+.3f}] rot={rerr:.2f}deg"
            + (f" axis=[{evec[3]:+.2f},{evec[4]:+.2f},{evec[5]:+.2f}]" if len(evec) > 3 else ""),
            flush=True,
        )
        if i % 3 == 0 and t.world.n_lm > 0:
            # landmark geometric quality: distance to nearest splat plane
            w = t.world
            ids = np.nonzero(w.lm_valid[: w.n_lm])[0]
            if len(ids) > 800:
                ids = ids[:: len(ids) // 800]
            P = w.lm_pos[ids]  # (L,3)
            C = world["centers"]
            N = np.cross(world["e1"], world["e2"])
            half = world["sizes"][:, None] * 0.5
            rel = P[:, None, :] - C[None, :, :]  # (L,S,3)
            dplane = np.abs(np.einsum("lsk,sk->ls", rel, N))
            a = np.abs(np.einsum("lsk,sk->ls", rel, world["e1"]))
            b = np.abs(np.einsum("lsk,sk->ls", rel, world["e2"]))
            onquad = (a <= half.T + 0.1) & (b <= half.T + 0.1)
            d = np.where(onquad, dplane, np.inf).min(1)
            d = d[np.isfinite(d)]
            if len(d):
                print(
                    f"      lm-surface dist: med={np.median(d):.4f} "
                    f"p90={np.percentile(d, 90):.4f} frac>0.2={float((d > 0.2).mean()):.2f}"
                )
    est, gt, ts = np.asarray(est), np.asarray(gt), np.asarray(ts)
    rmse, n, s = ate.ate_rmse(ts, est, ts, gt, with_scale=False)
    _, _, s_fit = ate.ate_rmse(ts, est, ts, gt, with_scale=True)
    print(f"stereo ATE={rmse:.4f} scale_fit={s_fit:.4f}")


if __name__ == "__main__":
    main()
