"""Differential sub-stage timing of ORB extraction with ROTATING inputs
(this rig memoizes identical repeated executions — fixed-input timing reads
zero).  Each variant consumes everything it computed so XLA can't DCE.

Run: python -m tests.profile_extract2 [H W]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.ops import extractor as ext
    from orb_slam3_fast_tpu.ops import fast as fast_ops
    from orb_slam3_fast_tpu.ops import image as image_ops

    H, W = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (480, 640)
    print("devices:", jax.devices(), f"image {W}x{H}", flush=True)
    cfg = ext.ExtractorConfig(n_features=1024)
    budgets = ext.per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    rng = np.random.default_rng(0)

    def make_img():
        img = rng.uniform(0, 50, (H, W)).astype(np.float32)
        for _ in range(120):
            cy, cx = rng.integers(20, H - 40), rng.integers(20, W - 40)
            img[cy : cy + rng.integers(8, 24), cx : cx + rng.integers(8, 24)] += rng.uniform(80, 170)
        return np.clip(img, 0, 255)

    n_imgs = 8
    imgs = [jax.device_put(jnp.asarray(make_img())) for _ in range(n_imgs)]

    def upto(stage):
        def f(im, carry):
            acc = carry
            lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
            acc = acc + sum(x[0, 0] for x in lv)
            if stage == "pyramid":
                return acc
            for l, (x, n_l) in enumerate(zip(lv, budgets)):
                raw = fast_ops.fast_with_fallback(x, 20.0, 7.0)
                if stage == "fast":
                    acc = acc + raw.sum()
                    continue
                s = fast_ops.nonmax_3x3(raw)
                if stage == "nms":
                    acc = acc + s.sum()
                    continue
                xy, resp, valid = ext.select_keypoints(s, n_l, cfg.cell, cfg.cand_per_cell)
                if stage == "select":
                    acc = acc + xy.sum() + resp.sum()
                    continue
                off = ext.subpixel_refine(raw, xy)
                if stage == "subpix":
                    acc = acc + xy.sum() + off.sum()
                    continue
                ang = ext.ic_angles(x, xy)
                if stage == "angles":
                    acc = acc + ang.sum() + xy.sum() + off.sum()
                    continue
                blur = image_ops.gaussian_blur(x)
                if stage == "blur":
                    acc = acc + blur[0, 0] + ang.sum() + xy.sum() + off.sum()
                    continue
                d = ext.brief_descriptors(blur, xy, ang)
                acc = acc + d.astype(jnp.float32).sum() + ang.sum() + xy.sum() + off.sum()
            return acc

        return jax.jit(f)

    def ptime(fn, n=40):
        carry = jnp.float32(0.0)
        carry = jax.block_until_ready(fn(imgs[0], carry))
        t0 = time.perf_counter()
        for i in range(n):
            carry = fn(imgs[i % n_imgs], carry)
        jax.block_until_ready(carry)
        return (time.perf_counter() - t0) / n * 1e3

    prev = 0.0
    for stage in ["pyramid", "fast", "nms", "select", "subpix", "angles", "blur", "desc"]:
        ms = ptime(upto(stage))
        print(f"up to {stage:8s}: {ms:7.2f} ms  (delta {ms - prev:+6.2f})", flush=True)
        prev = ms
    fex = jax.jit(lambda im, c: c + sum(
        v.sum() if v.dtype != jnp.int8 else v.astype(jnp.float32).sum()
        for v in ext.extract(im, cfg)
    ))
    print(f"full extract : {ptime(fex):7.2f} ms")


if __name__ == "__main__":
    main()
