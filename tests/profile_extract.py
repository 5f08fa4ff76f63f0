"""Pipelined sub-stage timing of ORB extraction on the current device."""
import time

import numpy as np


def ptime(fn, args, n=30):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.ops import extractor as ext
    from orb_slam3_fast_tpu.ops import fast as fast_ops
    from orb_slam3_fast_tpu.ops import image as image_ops

    print("devices:", jax.devices(), flush=True)
    cfg = ext.ExtractorConfig(n_features=1024)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    jimg = jax.device_put(jnp.asarray(img))
    budgets = ext.per_level_budget(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    def upto(stage):
        def f(im):
            lv = image_ops.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
            if stage == "pyramid":
                return lv
            outs = []
            for l, (x, n_l) in enumerate(zip(lv, budgets)):
                raw = fast_ops.fast_with_fallback(x, 20.0, 7.0)
                s = fast_ops.nonmax_3x3(raw)
                if stage == "fast":
                    outs.append(s)
                    continue
                xy, resp, valid = ext.select_keypoints(s, n_l, cfg.cell, cfg.cand_per_cell)
                if stage == "select":
                    outs.append(xy)
                    continue
                off = ext.subpixel_refine(raw, xy)
                ang = ext.ic_angles(x, xy)
                if stage == "angles":
                    outs.append(ang)
                    continue
                blur = image_ops.gaussian_blur(x)
                if stage == "blur":
                    outs.append(blur[0, 0])
                    continue
                outs.append(ext.brief_descriptors(blur, xy, ang))
            return outs

        return jax.jit(f)

    for stage in ["pyramid", "fast", "select", "angles", "blur", "desc"]:
        ms = ptime(upto(stage), (jimg,))
        print(f"up to {stage:8s}: {ms:7.2f} ms")
    f_full = jax.jit(lambda im: ext.extract(im, cfg))
    print(f"full extract : {ptime(f_full, (jimg,)):7.2f} ms")


if __name__ == "__main__":
    main()
