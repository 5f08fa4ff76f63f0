"""Micro-profiling: isolate dispatch latency vs compute for the slow stages."""
import time

import numpy as np


def timeit(fn, args, n=30, warmup=5):
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

    from orb_slam3_fast_tpu.ops import hamming as ham

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N, M = 1226, 1226
    da = jnp.asarray(rng.integers(0, 2, (N, 256)).astype(np.int8))
    db = jnp.asarray(rng.integers(0, 2, (M, 256)).astype(np.int8))
    mask = jnp.asarray(rng.uniform(size=(N, M)) < 0.05)

    f0 = jax.jit(lambda x: x + 1.0)
    print(f"dispatch (x+1 scalar)        {timeit(f0, (jnp.float32(1.0),)):8.2f} ms")
    f0b = jax.jit(lambda x: x * 2.0)
    big = jnp.zeros((512, 512))
    print(f"dispatch (512x512 mul)       {timeit(f0b, (big,)):8.2f} ms")

    f1 = jax.jit(ham.hamming_matrix)
    print(f"hamming_matrix               {timeit(f1, (da, db)):8.2f} ms")

    f2 = jax.jit(lambda d, m: ham.masked_best2(d, m))
    d = f1(da, db)
    print(f"masked_best2                 {timeit(f2, (d, mask)):8.2f} ms")

    b = f2(d, mask)
    f3 = jax.jit(lambda idx, dist, acc: ham.resolve_duplicate_targets(idx, dist, acc, M))
    acc = b.dist < 100
    print(f"resolve_duplicate_targets    {timeit(f3, (b.idx, b.dist, acc)):8.2f} ms")

    f4 = jax.jit(lambda x: jnp.median(jnp.where(x < 50, x.astype(jnp.float32), jnp.nan)))
    print(f"median(masked)               {timeit(f4, (b.dist,)):8.2f} ms")

    # argmin vs top_k
    f5 = jax.jit(lambda d: jnp.argmin(d, axis=-1))
    print(f"argmin rowwise               {timeit(f5, (d,)):8.2f} ms")
    f6 = jax.jit(lambda d: jax.lax.top_k(-d, 2))
    print(f"top_k(2) rowwise             {timeit(f6, (d,)):8.2f} ms")
    # the scatter in masked_best2
    f7 = jax.jit(lambda d, i: d.at[jnp.arange(d.shape[0]), i].set(10_000))
    i1 = jnp.argmin(d, axis=-1)
    print(f"scatter set (N rows)         {timeit(f7, (d, i1)):8.2f} ms")

    # pose opt micro
    from orb_slam3_fast_tpu.cameras import models as cam_models
    from orb_slam3_fast_tpu.optim import pose_opt
    from orb_slam3_fast_tpu.utils import lie

    cam = cam_models.Camera.pinhole(458.654, 457.296, 367.215, 248.375)
    n = 4096
    xw = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    uv = jnp.asarray(np.concatenate([rng.uniform(0, 640, (n, 2)), -np.ones((n, 1))], 1).astype(np.float32))
    obs = pose_opt.PoseObs(
        xw=xw, uv=uv, inv_sigma2=jnp.ones(n), is_stereo=jnp.zeros(n, bool),
        valid=jnp.asarray(rng.uniform(size=n) < 0.2),
    )
    f8 = jax.jit(lambda R, t, o: pose_opt.pose_optimization(cam, jnp.float32(40.0), lie.SE3(R, t), o))
    print(f"pose_optimization(4096)      {timeit(f8, (jnp.eye(3), jnp.zeros(3), obs)):8.2f} ms")


if __name__ == "__main__":
    main()
