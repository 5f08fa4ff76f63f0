"""Per-stage timing of the bench tracking step on the current default device
(TPU when run bare, CPU under the test env).  Not a test.

Run: python -m tests.profile_stages
"""
import time

import numpy as np


def timeit(fn, args, n=20, warmup=4):
    import jax

    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.cameras import models as cam_models
    from orb_slam3_fast_tpu.ops import extractor as ext
    from orb_slam3_fast_tpu.ops import fast as fast_ops
    from orb_slam3_fast_tpu.ops import image as image_ops
    from orb_slam3_fast_tpu.ops import matching as mat
    from orb_slam3_fast_tpu.optim import pose_opt
    from orb_slam3_fast_tpu.utils import lie

    print("devices:", jax.devices(), flush=True)
    cfg = ext.ExtractorConfig(n_features=1024)
    cap = ext.total_capacity(cfg)
    scales = jnp.asarray(cfg.scale_factor ** np.arange(cfg.n_levels), dtype=jnp.float32)
    cam = cam_models.Camera.pinhole(458.654, 457.296, 367.215, 248.375)
    bf = 47.9
    n_lm = 4096
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 50, (480, 640)).astype(np.float32)
    for _ in range(120):
        cy, cx = rng.integers(20, 440), rng.integers(20, 600)
        img[cy : cy + rng.integers(8, 24), cx : cx + rng.integers(8, 24)] += rng.uniform(80, 170)
    img = np.clip(img, 0, 255)
    img_r = np.roll(img, -10, axis=1)
    lm_pos = np.stack(
        [rng.uniform(-4, 4, n_lm), rng.uniform(-3, 3, n_lm), rng.uniform(3, 20, n_lm)], -1
    ).astype(np.float32)
    lm_desc = rng.integers(0, 2, (n_lm, 256)).astype(np.int8)
    lm_level = rng.integers(0, 8, n_lm).astype(np.int32)

    jimg = jnp.asarray(img)
    jimg_r = jnp.asarray(img_r)

    # --- stage: full extract
    f_extract = jax.jit(lambda im: ext.extract(im, cfg))
    ms, kp_l = timeit(f_extract, (jimg,))
    print(f"extract(one image)           {ms:8.2f} ms")
    kp_r = jax.block_until_ready(f_extract(jimg_r))

    # --- sub-stages of extract (level 0 only, approximate shares)
    f_pyr = jax.jit(lambda im: image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor))
    ms, levels = timeit(f_pyr, (jimg,))
    print(f"  build_pyramid              {ms:8.2f} ms")

    def f_fast_all(im):
        lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        return [fast_ops.nonmax_3x3(fast_ops.fast_with_fallback(x, 20.0, 7.0)) for x in lv]

    ms, scores = timeit(jax.jit(f_fast_all), (jimg,))
    print(f"  pyramid+FAST+NMS           {ms:8.2f} ms")

    def f_sel(im):
        lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        budgets = ext.per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        outs = []
        for l, (x, n_l) in enumerate(zip(lv, budgets)):
            s = fast_ops.nonmax_3x3(fast_ops.fast_with_fallback(x, 20.0, 7.0))
            outs.append(ext.select_keypoints(s, n_l, cfg.cell, cfg.cand_per_cell))
        return outs

    ms, _ = timeit(jax.jit(f_sel), (jimg,))
    print(f"  +select_keypoints          {ms:8.2f} ms")

    def f_ang(im):
        lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        budgets = ext.per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        outs = []
        for l, (x, n_l) in enumerate(zip(lv, budgets)):
            s = fast_ops.nonmax_3x3(fast_ops.fast_with_fallback(x, 20.0, 7.0))
            xy, resp, valid = ext.select_keypoints(s, n_l, cfg.cell, cfg.cand_per_cell)
            outs.append(ext.ic_angles(x, xy))
        return outs

    ms, _ = timeit(jax.jit(f_ang), (jimg,))
    print(f"  +ic_angles                 {ms:8.2f} ms")

    def f_desc(im):
        lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        budgets = ext.per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        outs = []
        for l, (x, n_l) in enumerate(zip(lv, budgets)):
            s = fast_ops.nonmax_3x3(fast_ops.fast_with_fallback(x, 20.0, 7.0))
            xy, resp, valid = ext.select_keypoints(s, n_l, cfg.cell, cfg.cand_per_cell)
            ang = ext.ic_angles(x, xy)
            blur = image_ops.gaussian_blur(x)
            outs.append(ext.brief_descriptors(blur, xy, ang))
        return outs

    ms, _ = timeit(jax.jit(f_desc), (jimg,))
    print(f"  +blur+brief (full)         {ms:8.2f} ms")

    # --- stage: stereo match
    f_sm = jax.jit(lambda a, b: mat.stereo_match(a, b, scales, bf=bf, min_z=1.0))
    ms, sm = timeit(f_sm, (kp_l, kp_r))
    print(f"stereo_match                 {ms:8.2f} ms")

    # --- stage: search_by_projection
    T = lie.SE3(jnp.eye(3), jnp.zeros(3))
    proj = cam_models.project(cam, T.apply(jnp.asarray(lm_pos)))
    in_img = (proj[:, 0] >= 0) & (proj[:, 0] < 640) & (proj[:, 1] >= 0) & (proj[:, 1] < 480)
    f_sbp = jax.jit(
        lambda kp, pr, vi, de, lv: mat.search_by_projection(kp, pr, vi, de, lv, scales, radius=6.0)
    )
    ms, (idx, accept) = timeit(
        f_sbp, (kp_l, proj, in_img, jnp.asarray(lm_desc), jnp.asarray(lm_level))
    )
    print(f"search_by_projection         {ms:8.2f} ms")

    # --- stage: pose optimization
    uvr = jnp.concatenate(
        [kp_l.xy[idx], jnp.where(accept, sm.right_u[idx], -1.0)[:, None]], axis=1
    )
    obs = pose_opt.PoseObs(
        xw=jnp.asarray(lm_pos),
        uv=uvr,
        inv_sigma2=jnp.ones(n_lm),
        is_stereo=accept & (sm.right_u[idx] > 0),
        valid=accept,
    )
    f_po = jax.jit(lambda T_R, T_t, o: pose_opt.pose_optimization(cam, jnp.float32(bf), lie.SE3(T_R, T_t), o))
    ms, _ = timeit(f_po, (jnp.eye(3), jnp.zeros(3), obs))
    print(f"pose_optimization            {ms:8.2f} ms")


if __name__ == "__main__":
    main()
