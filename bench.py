"""Benchmark: stereo tracking-step throughput on the real device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — the driver
runs this on TPU hardware.  Baseline: the reference fork's published total
stereo tracking latency at 640x480 = 18.11 ms (~55 fps) on a desktop CPU
(BASELINE.md / reference README.md:5-17).

The measured step covers the per-frame device work of the front-end:
dual-image ORB extraction (pyramid/FAST/NMS/orientation/BRIEF), rectified
stereo matching, landmark projection matching against a 4096-point local
map, and 4x10-iteration LM pose optimization — the same stages the
reference times (ORB extract + stereo match + pose pred + LM track).

Measurement is *pipelined throughput*: each step consumes the previous
step's pose (a real data dependency, so XLA cannot elide the chain) and a
fresh image, steps are dispatched asynchronously, and we block once at the
end.  This is how the tracker actually runs (dispatch frame k+1's extraction
while frame k's optimization completes) and removes the host<->device
round-trip latency of the test harness from the number — on this rig the
device is reached through a relay tunnel whose RTT (~30 ms) would otherwise
dominate a per-frame-blocking measurement.  Per-frame blocking latency is
reported alongside in the breakdown on stderr.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.cameras import models as cam_models
    from orb_slam3_fast_tpu.ops import extractor as ext
    from orb_slam3_fast_tpu.ops import matching as mat
    from orb_slam3_fast_tpu.optim import pose_opt
    from orb_slam3_fast_tpu.utils import lie

    cfg = ext.ExtractorConfig(n_features=1024)
    cap = ext.total_capacity(cfg)
    scales = jnp.asarray(cfg.scale_factor ** np.arange(cfg.n_levels), dtype=jnp.float32)
    cam = cam_models.Camera.pinhole(458.654, 457.296, 367.215, 248.375)
    bf = 47.9
    n_lm = 4096

    rng = np.random.default_rng(0)
    # synthetic textured frames + local map
    def make_img(H=480, W=640):
        img = rng.uniform(0, 50, (H, W)).astype(np.float32)
        for _ in range(120 * (H * W) // (480 * 640)):
            cy, cx = rng.integers(20, H - 40), rng.integers(20, W - 40)
            img[cy : cy + rng.integers(8, 24), cx : cx + rng.integers(8, 24)] += rng.uniform(80, 170)
        return np.clip(img, 0, 255)

    n_imgs = 8  # rotate through a few frames so inputs vary
    imgs_l = [make_img() for _ in range(n_imgs)]
    imgs_r = [np.roll(im, -10, axis=1) for im in imgs_l]
    lm_pos = np.stack(
        [rng.uniform(-4, 4, n_lm), rng.uniform(-3, 3, n_lm), rng.uniform(3, 20, n_lm)], -1
    ).astype(np.float32)
    lm_desc = rng.integers(0, 2, (n_lm, 256)).astype(np.int8)
    lm_level = rng.integers(0, 8, n_lm).astype(np.int32)

    slot_sc = jnp.asarray(ext.slot_scales(cfg))

    def tracking_step(img_l, img_r, T_R, T_t, lm_pos, lm_desc, lm_level, slot_sc):
        kp_l = ext.extract(img_l, cfg)
        kp_r = ext.extract(img_r, cfg)
        sm = mat.stereo_match(kp_l, kp_r, scales, bf=bf, min_z=1.0,
                              slot_scale_r=slot_sc)
        T = lie.SE3(T_R, T_t)
        proj = cam_models.project(cam, T.apply(lm_pos))
        in_img = (
            (proj[:, 0] >= 0) & (proj[:, 0] < 640) & (proj[:, 1] >= 0) & (proj[:, 1] < 480)
        )
        idx, accept = mat.search_by_projection(
            kp_l, proj, in_img, lm_desc, lm_level, scales, radius=6.0
        )
        uvr = jnp.concatenate(
            [kp_l.xy[idx], jnp.where(accept, sm.right_u[idx], -1.0)[:, None]], axis=1
        )
        obs = pose_opt.PoseObs(
            xw=lm_pos,
            uv=uvr,
            inv_sigma2=jnp.ones(n_lm),
            is_stereo=accept & (sm.right_u[idx] > 0),
            valid=accept,
        )
        T_new, inlier, n_inl = pose_opt.pose_optimization(cam, jnp.float32(bf), T, obs)
        return T_new.R, T_new.t, n_inl, sm.valid.sum()

    step = jax.jit(tracking_step)
    jl = [jax.device_put(jnp.asarray(im)) for im in imgs_l]
    jr = [jax.device_put(jnp.asarray(im)) for im in imgs_r]
    jpos = jax.device_put(jnp.asarray(lm_pos))
    jdesc = jax.device_put(jnp.asarray(lm_desc))
    jlvl = jax.device_put(jnp.asarray(lm_level))
    R = jnp.eye(3)
    t = jnp.zeros(3)
    # warmup / compile
    R, t, n_inl, n_st = step(jl[0], jr[0], R, t, jpos, jdesc, jlvl, slot_sc)
    jax.block_until_ready((R, t))

    # per-frame blocking latency (includes tunnel RTT; stderr diagnostics)
    t0 = time.perf_counter()
    for i in range(10):
        R, t, n_inl, n_st = step(jl[i % n_imgs], jr[i % n_imgs], R, t, jpos, jdesc, jlvl, slot_sc)
        jax.block_until_ready((R, t))
    lat_ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"blocking per-frame latency: {lat_ms:.2f} ms", file=sys.stderr)

    # pipelined throughput: pose chains step->step (true data dependency)
    n = 60
    R, t, n_inl, n_st = step(jl[0], jr[0], R, t, jpos, jdesc, jlvl, slot_sc)
    jax.block_until_ready((R, t))
    t0 = time.perf_counter()
    for i in range(n):
        R, t, n_inl, n_st = step(jl[i % n_imgs], jr[i % n_imgs], R, t, jpos, jdesc, jlvl, slot_sc)
    jax.block_until_ready((R, t))
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt

    # --- per-stage breakdown by DIFFERENTIAL fused-step variants, all over
    # ROTATING inputs (this rig's backend memoizes identical repeated
    # executions, so fixed-input per-stage timing reads near-zero/garbage)
    # --- 1280x720 step (the reference's headline config, README.md:19-31):
    # same pipeline at the ZED2 resolution, baseline 21.25 ms (~47 fps)
    imgs_l7 = [make_img(720, 1280) for _ in range(n_imgs)]
    imgs_r7 = [np.roll(im, -10, axis=1) for im in imgs_l7]
    jl7 = [jax.device_put(jnp.asarray(im)) for im in imgs_l7]
    jr7 = [jax.device_put(jnp.asarray(im)) for im in imgs_r7]

    def tracking_step_720(img_l, img_r, T_R, T_t, lm_pos, lm_desc, lm_level, slot_sc):
        kp_l = ext.extract(img_l, cfg)
        kp_r = ext.extract(img_r, cfg)
        sm = mat.stereo_match(kp_l, kp_r, scales, bf=bf, min_z=1.0,
                              slot_scale_r=slot_sc)
        T = lie.SE3(T_R, T_t)
        proj = cam_models.project(cam, T.apply(lm_pos))
        in_img = (
            (proj[:, 0] >= 0) & (proj[:, 0] < 1280) & (proj[:, 1] >= 0) & (proj[:, 1] < 720)
        )
        idx, accept = mat.search_by_projection(
            kp_l, proj, in_img, lm_desc, lm_level, scales, radius=6.0
        )
        uvr = jnp.concatenate(
            [kp_l.xy[idx], jnp.where(accept, sm.right_u[idx], -1.0)[:, None]], axis=1
        )
        obs = pose_opt.PoseObs(
            xw=lm_pos,
            uv=uvr,
            inv_sigma2=jnp.ones(n_lm),
            is_stereo=accept & (sm.right_u[idx] > 0),
            valid=accept,
        )
        T_new, inlier, n_inl = pose_opt.pose_optimization(cam, jnp.float32(bf), T, obs)
        return T_new.R, T_new.t, n_inl, sm.valid.sum()

    step7 = jax.jit(tracking_step_720)
    R7, t7 = jnp.eye(3), jnp.zeros(3)
    R7, t7, _, _ = step7(jl7[0], jr7[0], R7, t7, jpos, jdesc, jlvl, slot_sc)
    jax.block_until_ready((R7, t7))
    t0 = time.perf_counter()
    for i in range(n):
        R7, t7, _, _ = step7(jl7[i % n_imgs], jr7[i % n_imgs], R7, t7, jpos, jdesc, jlvl, slot_sc)
    jax.block_until_ready((R7, t7))
    dt7 = (time.perf_counter() - t0) / n
    fps7 = 1.0 / dt7
    print(f"pipelined 1280x720 step time: {dt7*1e3:.2f} ms ({fps7:.1f} fps)", file=sys.stderr)

    def step_upto(stage):
        # each variant CONSUMES every intermediate it computed (eps-weighted
        # sums) — otherwise XLA dead-code-eliminates earlier stages and the
        # differential attribution is garbage
        def f(img_l, img_r, T_R, T_t, lm_pos, lm_desc, lm_level, slot_sc):
            kp_l = ext.extract(img_l, cfg)
            kp_r = ext.extract(img_r, cfg)
            acc = (
                kp_l.xy.sum() + kp_r.xy.sum() + kp_l.angle.sum() + kp_r.angle.sum()
                + kp_l.desc.astype(jnp.float32).sum() + kp_r.desc.astype(jnp.float32).sum()
            )
            if stage == "extract":
                return T_R + 1e-20 * acc, T_t, 0, 0
            sm = mat.stereo_match(kp_l, kp_r, scales, bf=bf, min_z=1.0,
                                  slot_scale_r=slot_sc)
            acc = acc + sm.depth.sum() + sm.right_u.sum()
            if stage == "stereo":
                return T_R + 1e-20 * acc, T_t, 0, 0
            T = lie.SE3(T_R, T_t)
            proj = cam_models.project(cam, T.apply(lm_pos))
            in_img = (
                (proj[:, 0] >= 0) & (proj[:, 0] < 640) & (proj[:, 1] >= 0) & (proj[:, 1] < 480)
            )
            idx, accept = mat.search_by_projection(
                kp_l, proj, in_img, lm_desc, lm_level, scales, radius=6.0
            )
            acc = acc + idx.sum() + accept.sum()
            if stage == "match":
                return T_R + 1e-20 * acc, T_t, 0, 0
            return tracking_step(img_l, img_r, T_R, T_t, lm_pos, lm_desc, lm_level, slot_sc)

        return jax.jit(f)

    def variant_time(fn, n_rep=40):
        Rv, tv = jnp.eye(3), jnp.zeros(3)
        out = jax.block_until_ready(fn(jl[0], jr[0], Rv, tv, jpos, jdesc, jlvl, slot_sc))
        Rv = out[0]
        t0 = time.perf_counter()
        for i in range(n_rep):
            out = fn(jl[i % n_imgs], jr[i % n_imgs], Rv, tv, jpos, jdesc, jlvl, slot_sc)
            Rv = out[0]
        jax.block_until_ready(Rv)
        return (time.perf_counter() - t0) / n_rep * 1e3

    t_extract = variant_time(step_upto("extract"))
    t_stereo = variant_time(step_upto("stereo"))
    t_match = variant_time(step_upto("match"))
    t_full = dt * 1e3
    stages = {
        "ORB extraction (x2 images)": t_extract,
        "Stereo matching": max(t_stereo - t_extract, 0.0),
        "LM track: projection match": max(t_match - t_stereo, 0.0),
        "Pose optimization (4x10 LM)": max(t_full - t_match, 0.0),
    }
    lines = [
        "# RESULTS — per-stage tracking latency on TPU (640x480 stereo)",
        "",
        "Pipelined measurement: stages dispatched asynchronously, device-serial",
        "execution, blocked once per batch (the tracker runs the same way; the",
        "rig's relay-tunnel RTT of ~30-40 ms/call would otherwise dominate).",
        "Reference baseline: total 18.11 ms (~55 fps) on a desktop CPU with TBB",
        "(/root/reference/README.md:5-17).",
        "",
        "| Stage | Mean (ms) |",
        "|---|---|",
    ]
    for k, v in stages.items():
        lines.append(f"| {k} | {v:.2f} |")
    lines += [
        f"| **Fused tracking step (pipelined)** | **{dt*1e3:.2f}** |",
        f"| Blocking per-frame latency (incl. tunnel RTT) | {lat_ms:.2f} |",
        "",
        f"Throughput: **{fps:.1f} fps** (baseline 55 fps -> vs_baseline {fps/55.0:.2f}).",
        "",
        f"1280x720 step (reference headline config, baseline 21.25 ms / ~47 fps,",
        f"README.md:19-31): **{dt7*1e3:.2f} ms** = **{fps7:.1f} fps**"
        f" (vs_baseline {fps7/47.0:.2f}).",
        "",
    ]
    try:
        import os

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md"), "w") as f:
            f.write("\n".join(lines))
    except OSError:
        pass
    for k, v in stages.items():
        print(f"stage {k}: {v:.2f} ms", file=sys.stderr)
    print(f"pipelined step time: {dt*1e3:.2f} ms", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "stereo_tracking_step_fps_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 55.0, 3),
                "fps_1280x720": round(fps7, 2),
                "vs_baseline_1280x720": round(fps7 / 47.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
