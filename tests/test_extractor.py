"""Feature-extractor tests: FAST detection, selection spread, BRIEF
rotation invariance (90-degree exact-pixel rotation)."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.ops import fast as fast_ops


def checkerboard(h=240, w=320, sq=24):
    y, x = np.mgrid[0:h, 0:w]
    img = (((y // sq) + (x // sq)) % 2) * 200.0 + 20.0
    return img.astype(np.float32)


def noisy_scene(rng, h=240, w=320):
    """Blobby random scene with strong corners."""
    img = rng.uniform(0, 50, size=(h, w)).astype(np.float32)
    for _ in range(40):
        cy, cx = rng.integers(30, h - 30), rng.integers(30, w - 30)
        sy, sx = rng.integers(8, 25, size=2)
        img[cy : cy + sy, cx : cx + sx] += rng.uniform(80, 180)
    return np.clip(img, 0, 255)


def test_fast_detects_square_corners():
    """Isolated bright squares: FAST-9 must fire at the 4 L-corners of each
    (X-junctions of a perfect checkerboard are NOT FAST corners — the
    differing arc is only ~8 px)."""
    img = np.full((128, 128), 20.0, np.float32)
    corners = []
    for cy, cx in [(20, 20), (20, 80), (80, 30), (70, 90)]:
        img[cy : cy + 24, cx : cx + 24] = 220.0
        corners += [(cy, cx), (cy, cx + 23), (cy + 23, cx), (cy + 23, cx + 23)]
    score = fast_ops.fast_score_map(jnp.asarray(img), 20.0)
    s = np.asarray(score)
    ys, xs = np.nonzero(s)
    assert len(ys) >= 16
    # every response is within 3 px of a true corner
    c = np.array(corners)
    d = np.abs(ys[:, None] - c[None, :, 0]) + np.abs(xs[:, None] - c[None, :, 1])
    assert (d.min(1) <= 6).all()
    # and every true corner has a response nearby
    assert (d.min(0) <= 6).all()


def test_run9_requires_contiguity():
    # mask with 9 contiguous bits -> corner; 9 scattered bits -> not
    m_contig = jnp.asarray([(0x1FF), (0x5555)], dtype=jnp.int32)
    out = np.asarray(fast_ops._has_run9(m_contig))
    assert out[0] and not out[1]
    # wrap-around run: bits 12..15 + 0..4 (9 bits crossing the seam)
    m_wrap = jnp.asarray([0xF01F], dtype=jnp.int32)
    assert np.asarray(fast_ops._has_run9(m_wrap))[0]


def test_extract_budget_and_validity(rng):
    img = jnp.asarray(noisy_scene(rng))
    cfg = ext.ExtractorConfig(n_features=512)
    kp = ext.extract(img, cfg)
    assert kp.n == ext.total_capacity(cfg)
    v = np.asarray(kp.valid)
    assert v.sum() > 200  # textured scene should fill most of the budget
    xy = np.asarray(kp.xy)[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240
    # descriptors are bits
    d = np.asarray(kp.desc)
    assert set(np.unique(d)).issubset({0, 1})


def test_spatial_spread(rng):
    """Octree-equivalent selection should cover all quadrants of a uniformly
    textured image rather than clustering."""
    img = jnp.asarray(noisy_scene(rng))
    kp = ext.extract(img, ext.ExtractorConfig(n_features=512))
    v = np.asarray(kp.valid) & (np.asarray(kp.level) == 0)
    xy = np.asarray(kp.xy)[v]
    for qy in range(2):
        for qx in range(2):
            inq = (
                (xy[:, 0] >= qx * 160)
                & (xy[:, 0] < (qx + 1) * 160)
                & (xy[:, 1] >= qy * 120)
                & (xy[:, 1] < (qy + 1) * 120)
            )
            assert inq.sum() > 20, f"quadrant {qy},{qx} starved"


def test_descriptor_rotation_invariance(rng):
    """Rotate image by 90 deg (exact pixels): matching keypoints must have
    small Hamming distance thanks to the steered pattern."""
    img = noisy_scene(rng)
    img_r = np.rot90(img).copy()  # (w,h)
    kp0 = ext.extract(jnp.asarray(img), ext.ExtractorConfig(n_features=256))
    kp1 = ext.extract(jnp.asarray(img_r), ext.ExtractorConfig(n_features=256))
    v0 = np.asarray(kp0.valid) & (np.asarray(kp0.level) == 0)
    v1 = np.asarray(kp1.valid) & (np.asarray(kp1.level) == 0)
    xy0 = np.asarray(kp0.xy)[v0]
    xy1 = np.asarray(kp1.xy)[v1]
    d0 = np.asarray(kp0.desc)[v0]
    d1 = np.asarray(kp1.desc)[v1]
    h, w = img.shape
    # map kp0 coords into rotated frame: rot90 (ccw): (x,y) -> (y, w-1-x)
    xy0_r = np.stack([xy0[:, 1], (w - 1) - xy0[:, 0]], axis=-1)
    # for each kp0, find nearest kp1 in space; require < 2px to call it a pair
    d2 = ((xy0_r[:, None, :] - xy1[None, :, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    paired = d2[np.arange(len(nn)), nn] < 4.0
    assert paired.sum() > 30
    ham = (d0[paired] != d1[nn[paired]]).sum(-1)
    # control: pairs that are spatially FAR apart (unrelated patches)
    far = d2 > 100.0**2
    ii, jj = np.nonzero(far)
    sel = np.random.default_rng(0).choice(len(ii), size=200, replace=False)
    rand_ham = (d0[ii[sel]] != d1[jj[sel]]).sum(-1)
    # matched pairs must be far below the unrelated-pair distance
    assert np.median(ham) < 45, f"median hamming {np.median(ham)}"
    assert np.median(rand_ham) > 60, f"control hamming {np.median(rand_ham)}"


def test_per_level_budget_sums():
    b = ext.per_level_budget(1024, 8, 1.2)
    assert sum(b) == 1024
    assert all(b[i] >= b[i + 1] for i in range(6))  # geometric decay
