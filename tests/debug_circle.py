"""Debug harness: per-frame instrumentation of the rotation-dominant circle
run from test_loop_closing (not a test; run `python tests/debug_circle.py`)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import jax.numpy as jnp

from orb_slam3_fast_tpu.backend.mapper import Mapper, _kf_keypoints, _search_tri, compute_f12
from orb_slam3_fast_tpu.ops import matching as mat
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.vocab import database as db_mod
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod

from tests import synthetic as syn

class DebugMapper(Mapper):
    def _triangulate_new(self, world, k):
        if not VERBOSE:
            return super()._triangulate_new(world, k)
        neighbors = world.best_covisible(k, self.cfg.n_neighbors_tri, min_shared=5)
        free_k = (world.kf_obs[k] < 0) & world.kf_kp_valid[k]
        print(f"    [tri] kf{k}: neighbors={list(neighbors)} free_k={free_k.sum()}")
        for n in neighbors[:3]:
            kp_k = _kf_keypoints(world, k)
            kp_n = _kf_keypoints(world, n)
            F_kn = compute_f12(world, self.cam, n, k)
            fk = jnp.asarray((world.kf_obs[k] < 0) & world.kf_kp_valid[k])
            fn = jnp.asarray((world.kf_obs[n] < 0) & world.kf_kp_valid[n])
            idx, accept = _search_tri(kp_k, kp_n, fk, fn, jnp.asarray(F_kn), jnp.asarray(self.sigma2))
            acc = np.asarray(accept)
            if acc.sum() > 0:
                slots_k = np.nonzero(acc)[0]
                slots_n = np.asarray(idx)[slots_k]
                import orb_slam3_fast_tpu.ops.twoview as twoview
                import jax as _jax
                nb = 256
                while nb < len(slots_k):
                    nb *= 2
                sk = np.zeros(nb, np.int64); sk[: len(slots_k)] = slots_k
                sn = np.zeros(nb, np.int64); sn[: len(slots_n)] = slots_n
                x_k = np.asarray(cam_models.unproject(self.cam, jnp.asarray(world.kf_xy[k, sk])))[:, :2]
                x_n = np.asarray(cam_models.unproject(self.cam, jnp.asarray(world.kf_xy[n, sn])))[:, :2]
                P_k = np.concatenate([world.kf_R[k], world.kf_t[k][:, None]], 1)
                P_n = np.concatenate([world.kf_R[n], world.kf_t[n][:, None]], 1)
                X = np.asarray(_jax.jit(twoview.triangulate_dlt)(
                    jnp.asarray(P_k), jnp.asarray(P_n), jnp.asarray(x_k), jnp.asarray(x_n)))[: len(slots_k)]
                gates = self._gate_detail(world, k, n, slots_k, slots_n, X)
                print(f"    [tri] kf{k}<->kf{n}: matched={acc.sum()} {gates}")
            else:
                print(f"    [tri] kf{k}<->kf{n}: matched=0")
        return super()._triangulate_new(world, k)

    def _cull_landmarks(self, world, k):
        if not VERBOSE:
            return super()._cull_landmarks(world, k)
        pre = [ids[world.lm_valid[ids]] for ids in self.recent_lm]
        super()._cull_landmarks(world, k)
        for age, alive0 in enumerate(pre):
            alive1 = alive0[world.lm_valid[alive0]]
            if len(alive0):
                obs_hist = np.bincount(np.clip(world.lm_n_obs[alive1], 0, 5), minlength=6)
                print(
                    f"    [cull] batch_age{len(pre)-age}: {len(alive0)}->{len(alive1)} "
                    f"obs_hist={obs_hist.tolist()}"
                )

    def _gate_detail(self, world, k, n, slots_k, slots_n, X):
        out = {}
        ok = np.all(np.isfinite(X), axis=1)
        out["finite"] = int(ok.sum())
        for kf, slots, tag in ((k, slots_k, "k"), (n, slots_n, "n")):
            xc = X @ world.kf_R[kf].T + world.kf_t[kf]
            z = xc[:, 2]
            ok &= z > 0.02
            out[f"z_{tag}"] = int(ok.sum())
            uv = np.asarray(cam_models.project(self.cam, jnp.asarray(xc)))
            err2 = ((uv - world.kf_xy[kf, slots]) ** 2).sum(1)
            ok &= err2 <= 5.991 * self.cfg.tri_chi2_scale * self.sigma2[world.kf_level[kf, slots]]
            out[f"chi_{tag}"] = int(ok.sum())
        d_k = X - world.camera_center(k)[None]
        d_n = X - world.camera_center(n)[None]
        cosp = (d_k * d_n).sum(1) / np.maximum(
            np.linalg.norm(d_k, axis=1) * np.linalg.norm(d_n, axis=1), 1e-9)
        ok &= cosp < self.cfg.min_parallax_cos
        out["plx"] = int(ok.sum())
        return out


from orb_slam3_fast_tpu.optim import ba as ba_mod

_orig_bundle_adjust = ba_mod.bundle_adjust


def _wrapped_ba(cam, bf, prob, iters1=5, iters2=10):
    R, t, xw, inlier = _orig_bundle_adjust(cam, bf, prob, iters1=iters1, iters2=iters2)
    if os.environ.get("DBG_VERBOSE", "1") == "1":
        import numpy as _np

        v = _np.asarray(prob.obs_valid)
        inl = _np.asarray(inlier)
        nv = int(v.sum())
        bad = int((v & ~inl).sum())
        # pose delta magnitude of free poses
        free = ~_np.asarray(prob.pose_fixed)
        dt = _np.linalg.norm(_np.asarray(R) - _np.asarray(prob.R), axis=(1, 2))
        dtr = _np.linalg.norm(_np.asarray(t) - _np.asarray(prob.t), axis=1)
        print(
            f"    [ba] obs={nv} outliers={bad} ({100.0*bad/max(nv,1):.0f}%) "
            f"max_dR={dt[free].max() if free.any() else 0:.4f} "
            f"max_dt={dtr[free].max() if free.any() else 0:.4f}"
        )
    return R, t, xw, inlier


ba_mod.bundle_adjust = _wrapped_ba
import orb_slam3_fast_tpu.backend.mapper as mapper_mod

mapper_mod.ba.bundle_adjust = _wrapped_ba

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
NFEAT = int(os.environ.get("DBG_NFEAT", "768"))
MAP_RADIUS = float(os.environ.get("DBG_MAP_RADIUS", "3.0"))
VERBOSE = os.environ.get("DBG_VERBOSE", "1") == "1"
CFG = trk.TrackerConfig(
    extractor=ext.ExtractorConfig(n_features=NFEAT),
    min_init_matches=60,
    motion_radius=25.0,
    map_radius=MAP_RADIUS,
)


def main(n_frames=150, seed=0):
    rng = np.random.default_rng(seed)
    world = syn.make_ring_world(rng)
    poses = syn.circle_trajectory(n_frames, radius=4.0, frac=1.12)
    voc = voc_mod.default_vocabulary()
    kfdb = db_mod.KeyFrameDatabase(voc.n_words, max_kf=256)
    mapper = DebugMapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    t = trk.Tracker(
        CAM, CFG,
        world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor), max_kf=256),
        mapper=mapper, voc=voc, kfdb=kfdb, loopcloser=None,
    )
    n_ok = 0
    prev_lm = 0
    prev_pose = None
    prev_gt = None
    for i, T in enumerate(poses):
        img = syn.render(world, CAM, T)
        prev_kf = t.world.n_kf
        state, pose = t.process_mono(img, i * 0.05)
        # per-frame translation magnitude (est vs gt): collapse toward zero =
        # rotation/translation degeneracy
        step_est = step_gt = -1.0
        if pose is not None and prev_pose is not None:
            c_now = -pose[0].T @ pose[1]
            c_prev = -prev_pose[0].T @ prev_pose[1]
            step_est = float(np.linalg.norm(c_now - c_prev))
            step_gt = float(np.linalg.norm(np.asarray(T.inverse().t) - prev_gt))
        prev_pose = pose
        prev_gt = np.asarray(T.inverse().t)
        inl = t.stats["inliers"][-1] if t.stats["inliers"] else -1
        mm = t.stats["matches"][-1] if t.stats["matches"] else -1
        new_kf = t.world.n_kf - prev_kf
        new_lm = t.world.n_lm - prev_lm
        prev_lm = t.world.n_lm
        # pose error vs gt
        err = -1.0
        if pose is not None:
            R, tt = pose
            c_est = -R.T @ tt
            c_gt = np.asarray(T.inverse().t)
            err = float(np.linalg.norm(c_est - c_gt))
        if state == trk.OK:
            n_ok += 1
        print(
            f"f{i:3d} {state:15s} inl={inl:4d} map_matches={mm:4d} "
            f"kf={'+' if new_kf else ' '}{t.world.n_kf:3d} lm={t.world.n_lm:5d} (+{new_lm:4d}) "
            f"c_err={err:.3f} step={step_est:.4f}/gt {step_gt:.4f}",
            flush=True,
        )
        # angular coverage: where do current inliers / recent landmarks sit
        # in the camera FOV?  bucket by bearing angle (deg, - = trailing edge,
        # + = leading edge); camera looks along +z with +x = radially outward
        if pose is not None and t.last is not None and i % 4 == 0:
            obs = t.last.obs_lm
            ids = obs[obs >= 0]
            if len(ids):
                R, tt = pose
                xc = t.world.lm_pos[ids] @ R.T + tt
                ang = np.degrees(np.arctan2(xc[:, 0], xc[:, 2]))
                hist, _ = np.histogram(ang, bins=8, range=(-40, 40))
                print(f"      inlier bearing hist(-40..40): {hist.tolist()}")
        if state == trk.LOST:
            break
    print(f"tracked OK: {n_ok}/{n_frames}")


if __name__ == "__main__":
    main()
