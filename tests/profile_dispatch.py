"""Separate per-call dispatch overhead from device compute on this rig.

Measures (all with chained data dependencies so nothing can be elided):
  1. trivial scalar program   -> pure dispatch cost
  2. full ORB extract chained through the image (desc feeds next input)
  3. the bench.py tracking_step signature (7 args) with trivial body
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam3_fast_tpu.ops import extractor as ext

    print("devices:", jax.devices(), flush=True)
    cfg = ext.ExtractorConfig(n_features=1024)
    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32)))
        for _ in range(8)
    ]

    def bench(fn, chain, n=100, label=""):
        c = chain
        c = jax.block_until_ready(fn(imgs[0], c))
        t0 = time.perf_counter()
        for i in range(n):
            c = fn(imgs[i % 8], c)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:40s}: {dt:7.3f} ms/call", flush=True)
        return dt

    triv = jax.jit(lambda im, c: c + im[0, 0])
    bench(triv, jnp.float32(0), label="trivial scalar (dispatch floor)")

    def full_extract(im, c):
        kp = ext.extract(im + c * 1e-20, cfg)
        return kp.desc.astype(jnp.float32).sum() + kp.xy.sum() + kp.angle.sum()

    f1 = jax.jit(full_extract)
    bench(f1, jnp.float32(0), label="extract x1 (chained)")

    def extract2(im, c):
        kp1 = ext.extract(im + c * 1e-20, cfg)
        kp2 = ext.extract(im.T[:, ::-1][: 480, : 640] + c * 1e-20, cfg)
        return (
            kp1.desc.astype(jnp.float32).sum() + kp1.xy.sum()
            + kp2.desc.astype(jnp.float32).sum() + kp2.xy.sum()
        )

    # T of 480x640 is 640x480 -> crop breaks; just use roll instead
    def extract2b(im, c):
        kp1 = ext.extract(im + c * 1e-20, cfg)
        kp2 = ext.extract(jnp.roll(im, 7, axis=1) + c * 1e-20, cfg)
        return (
            kp1.desc.astype(jnp.float32).sum() + kp1.xy.sum()
            + kp2.desc.astype(jnp.float32).sum() + kp2.xy.sum()
        )

    f2 = jax.jit(extract2b)
    bench(f2, jnp.float32(0), label="extract x2 (chained)")

    def extract8(im, c):
        acc = c
        for j in range(8):
            kp = ext.extract(jnp.roll(im, j, axis=1) + acc * 1e-20, cfg)
            acc = kp.desc.astype(jnp.float32).sum() + kp.xy.sum()
        return acc

    f8 = jax.jit(extract8)
    bench(f8, jnp.float32(0), n=40, label="extract x8 serial-chained")


if __name__ == "__main__":
    main()
