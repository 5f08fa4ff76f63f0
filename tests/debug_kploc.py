"""Measure keypoint localization accuracy against ground-truth splat corners,
with and without subpixel refinement.  Run: python -m tests.debug_kploc"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.utils import lie

from tests import synthetic as syn

CAM = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)


def corner_gt(world, T_cw, wh=(640, 480)):
    """Project the 4 corners of every splat; return visible GT corner pixels.
    The splat is drawn as an axis-aligned square of side s centered at uv."""
    Xc = np.asarray(T_cw.apply(jnp.asarray(world["centers"])))
    uv = np.asarray(cam_models.project(CAM, jnp.asarray(Xc)))
    fx = 400.0
    out = []
    w, h = wh
    order = np.argsort(-Xc[:, 2])
    occup = np.zeros((h, w), np.int32)  # crude occlusion: latest drawn wins
    for rank, i in enumerate(order):
        z = Xc[i, 2]
        if z < 0.5:
            continue
        s = world["sizes"][i] * fx / z
        if s < 6:
            continue
        u, v = uv[i]
        for du in (-0.5, 0.5):
            for dv in (-0.5, 0.5):
                cu, cv = u + du * s, v + dv * s
                if 20 < cu < w - 20 and 20 < cv < h - 20:
                    out.append((cu, cv, rank))
    return np.asarray([(u, v) for u, v, _ in out], np.float32)


def main():
    rng = np.random.default_rng(3)
    for name, mk in [("corridor", lambda: syn.make_corridor_world(rng, n=900)),
                     ("ring", lambda: syn.make_ring_world(np.random.default_rng(0)))]:
        world = mk()
        if name == "corridor":
            T = syn.arc_trajectory(5, step=0.06, lateral=0.05)[3]
        else:
            T = syn.circle_trajectory(150, radius=4.0, frac=1.12)[3]
        img = syn.render(world, CAM, T)
        gt = corner_gt(world, T)
        cfg = ext.ExtractorConfig(n_features=768)
        kp = ext.extract(jnp.asarray(img, dtype=jnp.float32), cfg)
        xy = np.asarray(kp.xy)
        lvl = np.asarray(kp.level)
        val = np.asarray(kp.valid) & (lvl == 0)
        xy0 = xy[val]
        xy0_int = np.round(xy0)  # what the integer detector would report
        # match each gt corner to nearest detected kp within 2px
        for tag, pts in [("subpix", xy0), ("integer", xy0_int)]:
            d = np.linalg.norm(gt[:, None, :] - pts[None, :, :], axis=-1)
            nn = d.min(1)
            m = nn < 1.5
            errs = nn[m]
            print(f"{name:9s} {tag:8s}: matched {m.sum():4d}/{len(gt)} "
                  f"rms={np.sqrt((errs**2).mean()):.3f}px median={np.median(errs):.3f}px")


if __name__ == "__main__":
    main()
