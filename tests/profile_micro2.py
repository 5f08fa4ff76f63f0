"""Micro-profiling 2: pose-opt iteration scaling + full matcher stages."""
import time

import numpy as np


def timeit(fn, args, n=20, warmup=4):
    import jax

    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.cameras import models as cam_models
    from orb_slam3_fast_tpu.ops import extractor as ext
    from orb_slam3_fast_tpu.ops import matching as mat
    from orb_slam3_fast_tpu.optim import pose_opt
    from orb_slam3_fast_tpu.utils import lie

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cam = cam_models.Camera.pinhole(458.654, 457.296, 367.215, 248.375)
    n = 4096
    xw = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32) + np.array([0, 0, 8.0], np.float32))
    uv_gt = cam_models.project(cam, xw)
    uv = jnp.concatenate([uv_gt + 0.5, -jnp.ones((n, 1))], axis=1)
    obs = pose_opt.PoseObs(
        xw=xw, uv=uv, inv_sigma2=jnp.ones(n), is_stereo=jnp.zeros(n, bool),
        valid=jnp.asarray(rng.uniform(size=n) < 0.2),
    )
    for (r, it) in [(1, 1), (1, 5), (2, 5), (4, 10)]:
        f = jax.jit(
            lambda R, t, o, r=r, it=it: pose_opt.pose_optimization(
                cam, jnp.float32(40.0), lie.SE3(R, t), o, n_rounds=r, iters_per_round=it
            )
        )
        ms = timeit(f, (jnp.eye(3), jnp.zeros(3), obs))
        print(f"pose_opt rounds={r} iters={it}   {ms:8.2f} ms")

    # single normal-eq build
    f_b = jax.jit(
        lambda R, t, o: pose_opt._build_normal_eqs(
            cam, jnp.float32(40.0), lie.SE3(R, t), o, jnp.ones(n, bool)
        )
    )
    print(f"one _build_normal_eqs        {timeit(f_b, (jnp.eye(3), jnp.zeros(3), obs)):8.2f} ms")

    # full extract + stereo_match + search_by_projection as separate jits
    cfg = ext.ExtractorConfig(n_features=1024)
    scales = jnp.asarray(cfg.scale_factor ** np.arange(cfg.n_levels), dtype=jnp.float32)
    img = np.clip(rng.uniform(0, 255, (480, 640)), 0, 255).astype(np.float32)
    jimg = jnp.asarray(img)
    f_e = jax.jit(lambda im: ext.extract(im, cfg))
    print(f"extract                      {timeit(f_e, (jimg,)):8.2f} ms")
    kp_l = jax.block_until_ready(f_e(jimg))
    kp_r = jax.block_until_ready(f_e(jnp.asarray(np.roll(img, -8, 1))))
    f_sm = jax.jit(lambda a, b: mat.stereo_match(a, b, scales, bf=40.0, min_z=1.0))
    print(f"stereo_match                 {timeit(f_sm, (kp_l, kp_r)):8.2f} ms")
    lm_desc = jnp.asarray(rng.integers(0, 2, (n, 256)).astype(np.int8))
    lm_level = jnp.asarray(rng.integers(0, 8, n).astype(np.int32))
    proj = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
    vis = jnp.ones(n, bool)
    f_sbp = jax.jit(lambda kp, pr, vi, de, lv: mat.search_by_projection(kp, pr, vi, de, lv, scales, radius=6.0))
    print(f"search_by_projection         {timeit(f_sbp, (kp_l, proj, vis, lm_desc, lm_level)):8.2f} ms")


if __name__ == "__main__":
    main()
