"""Debug harness for mono-inertial init (mirrors test_vi_tracker._run_vi)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from orb_slam3_fast_tpu.backend.mapper import Mapper
from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.frontend import tracker as trk
from orb_slam3_fast_tpu.frontend.vi_tracker import InertialConfig, InertialTracker
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.optim import imu_init

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
CFG = trk.TrackerConfig(extractor=ext.ExtractorConfig(n_features=768), min_init_matches=60)
NOISE = pre.ImuNoise.from_continuous(1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, 200.0)


GT = {"poses": {}, "g_world": np.array([0.0, 9.81, 0.0]), "v_body": None}


class DebugVI(InertialTracker):
    def _try_initialize_imu(self):
        w = self.world
        ks = [k for k in range(1, w.n_kf) if k in w.kf_preint]
        span = (w.kf_ts[ks[-1]] - w.kf_ts[ks[0] - 1]) if ks else 0.0
        print(f"    [imu-init] n_kf={w.n_kf} n_preint={len(ks)} ks={ks} span={span:.2f}")
        orig = imu_init.inertial_only_optimization

        def spy(R_wb, p_wb, preints, *a, **kw):
            out = orig(R_wb, p_wb, preints, *a, **kw)
            print(f"    [imu-init] scale={float(out.scale):.4f} bias={np.asarray(out.bias).round(4)}")
            if not os.path.exists("/tmp/imu_init_case.npz"):
                save = {f: np.asarray(getattr(preints, f)) for f in preints._fields}
                np.savez(
                    "/tmp/imu_init_case.npz",
                    R_wb=np.asarray(R_wb), p_wb=np.asarray(p_wb),
                    edge_valid=np.asarray(kw.get("edge_valid")),
                    **{f"pre_{k}": v for k, v in save.items()},
                )
            # evaluate residual cost at solver solution vs GT-constructed
            import jax
            import jax.numpy as jnp
            from orb_slam3_fast_tpu.optim.inertial import inertial_information

            K = R_wb.shape[0]
            n_e = K - 1
            infos = jax.vmap(inertial_information)(preints)
            ev = kw.get("edge_valid")
            if ev is not None:
                infos = infos * np.asarray(ev)[:, None, None]

            def cost(Rwg, s, vel, bias):
                tot = 0.0
                for i in range(n_e):
                    p = jax.tree.map(lambda x: x[i], preints)
                    r = imu_init._gs_residual(
                        R_wb[i], p_wb[i], R_wb[i + 1], p_wb[i + 1],
                        jnp.asarray(vel[i]), jnp.asarray(vel[i + 1]),
                        jnp.asarray(bias), jnp.asarray(Rwg),
                        jnp.log(jnp.maximum(jnp.float32(s), 1e-9)), p,
                        jnp.asarray(False),
                    )
                    tot += float(r @ np.asarray(infos[i]) @ r)
                return tot

            c_sol = cost(out.Rwg, float(out.scale), np.asarray(out.vel), np.asarray(out.bias))
            # GT construction: map->metric scale from KF positions vs GT
            w2 = self.world
            ks2 = [k for k in range(1, w2.n_kf) if k in w2.kf_preint]
            chain = [ks2[0] - 1] + ks2
            gt_c = np.array([GT["poses"][round(w2.kf_ts[k], 4)] for k in chain])
            map_c = np.asarray(p_wb[: len(chain)])
            d_gt = np.linalg.norm(np.diff(gt_c, axis=0), axis=1)
            d_map = np.linalg.norm(np.diff(map_c, axis=0), axis=1)
            s_true = float(np.median(d_gt / np.maximum(d_map, 1e-9)))
            g = GT["g_world"] / np.linalg.norm(GT["g_world"])
            gI = np.array([0.0, 0.0, -1.0])
            ax = np.cross(gI, g)
            ang = np.arctan2(np.linalg.norm(ax), gI @ g)
            ax = ax / max(np.linalg.norm(ax), 1e-9) * ang
            from orb_slam3_fast_tpu.utils import lie as lie_m
            import jax.numpy as jnp2

            Rwg_true = np.asarray(lie_m.so3_exp(jnp2.asarray(ax)))
            # velocities: GT world velocity / s_true (map units)
            v_true = np.zeros((K, 3))
            vb = GT["v_body"]
            for i, k in enumerate(chain):
                Rgt = GT["poses_R"][round(w2.kf_ts[k], 4)]
                v_true[i] = (Rgt @ vb) / s_true
            bias_true = np.array([0.002, -0.001, 0.0015, 0.0, 0.0, 0.0])
            c_gt = cost(Rwg_true, s_true, v_true, bias_true)
            print(f"    [imu-init] cost(solver)={c_sol:.1f} cost(GT s={s_true:.2f})={c_gt:.1f}")
            return out

        imu_init.inertial_only_optimization = spy
        try:
            return super()._try_initialize_imu()
        finally:
            imu_init.inertial_only_optimization = orig


def main(n_frames=45, seed=0):
    rng = np.random.default_rng(seed)
    world3d = syn.make_corridor_world(rng, n=900)
    poses, imu = syn.arc_trajectory_with_imu(
        n_frames, step=0.06, lateral=0.05, gyro_bias=(0.002, -0.001, 0.0015),
        acc_bias=(0.03, -0.02, 0.04),
        noise_gyro=1.7e-4 * np.sqrt(200.0), noise_acc=2e-3 * np.sqrt(200.0), seed=seed,
    )
    GT["poses"] = {round(i * 0.05, 4): np.asarray(T.inverse().t) for i, T in enumerate(poses)}
    GT["poses_R"] = {round(i * 0.05, 4): np.asarray(T.R).T for i, T in enumerate(poses)}  # R_wb
    GT["v_body"] = np.array([0.06 * 0.3, 0.05, 0.06]) / 0.05  # xi[:3]/dt
    mapper = Mapper(CAM, sigma2=ext.level_sigma2(CFG.extractor))
    t = DebugVI(
        CAM, CFG, world=WorldMap(kp_cap=ext.total_capacity(CFG.extractor)),
        mapper=mapper, noise=NOISE,
        icfg=InertialConfig(init_min_kfs=8, init_min_time=1.0),
    )
    imu_i = 0
    prev = None
    prev_gt = None
    for i, T in enumerate(poses):
        tcur = i * 0.05
        j = imu_i
        while j < len(imu) and imu[j, 0] <= tcur + 1e-9:
            j += 1
        t.grab_imu(imu[imu_i:j])
        imu_i = j
        state, pose = t.process_mono(syn.render(world3d, CAM, T), tcur)
        err = -1.0
        sratio = -1.0
        if pose is not None:
            R, tt = pose
            c = -R.T @ tt
            cg = np.asarray(T.inverse().t)
            err = float(np.linalg.norm(c - cg))
            if prev is not None:
                d_est = np.linalg.norm(c - prev)
                d_gt = np.linalg.norm(cg - prev_gt)
                sratio = d_est / max(d_gt, 1e-9)
            prev, prev_gt = c, cg
        print(
            f"f{i:3d} {state:15s} kf={t.world.n_kf:3d} lm={t.world.n_lm:5d} "
            f"preints={len(t.world.kf_preint)} imu_init={t.world.imu_initialized} "
            f"c_err={err:.3f} step_ratio={sratio:.3f}",
            flush=True,
        )
    print("final imu_initialized:", t.world.imu_initialized)


if __name__ == "__main__":
    main()
