"""Matcher tests on synthetic shifted scenes."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.ops import extractor as ext
from orb_slam3_fast_tpu.ops import hamming as ham
from orb_slam3_fast_tpu.ops import matching as mat

from tests.test_extractor import noisy_scene


def test_hamming_matrix_matches_numpy(rng):
    a = jnp.asarray(rng.integers(0, 2, size=(37, 256)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(0, 2, size=(53, 256)), dtype=jnp.int8)
    H = np.asarray(ham.hamming_matrix(a, b))
    expected = (np.asarray(a)[:, None, :] != np.asarray(b)[None, :, :]).sum(-1)
    np.testing.assert_array_equal(H, expected)


def test_masked_best2(rng):
    d = jnp.asarray(rng.integers(0, 200, size=(10, 20)), dtype=jnp.int32)
    mask = jnp.asarray(rng.random(size=(10, 20)) > 0.3)
    b = ham.masked_best2(d, mask)
    dn = np.where(np.asarray(mask), np.asarray(d), ham.INF_DIST)
    np.testing.assert_array_equal(np.asarray(b.dist), dn.min(1))
    srt = np.sort(dn, axis=1)
    np.testing.assert_array_equal(np.asarray(b.dist2), srt[:, 1])


def test_resolve_duplicate_targets():
    idx = jnp.asarray([0, 0, 1, 2, 2])
    dist = jnp.asarray([10, 5, 7, 3, 3])
    accept = jnp.asarray([True, True, True, True, True])
    keep = np.asarray(ham.resolve_duplicate_targets(idx, dist, accept, 3))
    assert list(keep) == [False, True, True, True, False]


def test_init_matching_translated_scene(rng):
    img = noisy_scene(rng)
    shift = (3, 5)  # (dy, dx)
    img2 = np.roll(img, shift, axis=(0, 1))
    cfg = ext.ExtractorConfig(n_features=512)
    kp0 = ext.extract(jnp.asarray(img), cfg)
    kp1 = ext.extract(jnp.asarray(img2), cfg)
    idx, accept = mat.search_for_initialization(kp0, kp1, window=60.0)
    acc = np.asarray(accept)
    assert acc.sum() > 60, f"only {acc.sum()} init matches"
    # matched displacement must equal the shift
    d = np.asarray(kp1.xy)[np.asarray(idx)[acc]] - np.asarray(kp0.xy)[acc]
    err = np.abs(d - np.array([shift[1], shift[0]]))
    assert (err.max(1) < 1.5).mean() > 0.9, f"bad displacement {np.median(d,0)}"


def test_frame_to_frame_projection_matching(rng):
    img = noisy_scene(rng)
    img2 = np.roll(img, (2, -4), axis=(0, 1))
    cfg = ext.ExtractorConfig(n_features=512)
    kp0 = ext.extract(jnp.asarray(img), cfg)
    kp1 = ext.extract(jnp.asarray(img2), cfg)
    scales = jnp.asarray(1.2 ** np.arange(8), dtype=jnp.float32)
    # "project" last frame keypoints at their own position (motion model with
    # zero velocity); search window must absorb the 4-5 px motion
    idx, accept = mat.search_frame_to_frame(
        kp1, kp0.xy, kp0.valid, kp0.desc, kp0.level, kp0.angle, scales, radius=15.0
    )
    acc = np.asarray(accept)
    assert acc.sum() > 80
    # displacement check only at level 0 (higher levels quantize coords by 1.2^l)
    acc0 = acc & (np.asarray(kp0.level) == 0)
    d = np.asarray(kp1.xy)[np.asarray(idx)[acc0]] - np.asarray(kp0.xy)[acc0]
    err = np.abs(d - np.array([-4.0, 2.0]))
    assert (err.max(1) < 1.5).mean() > 0.85


def test_stereo_match_constant_disparity(rng):
    img = noisy_scene(rng, h=240, w=320)
    disp = 12
    img_r = np.roll(img, -disp, axis=1)  # right image shifted left => uL-uR=disp
    cfg = ext.ExtractorConfig(n_features=512)
    kp_l = ext.extract(jnp.asarray(img), cfg)
    kp_r = ext.extract(jnp.asarray(img_r), cfg)
    scales = jnp.asarray(1.2 ** np.arange(8), dtype=jnp.float32)
    bf = 40.0  # fx*baseline
    sm = mat.stereo_match(kp_l, kp_r, scales, bf=bf, min_z=bf / 60.0)
    v = np.asarray(sm.valid)
    assert v.sum() > 60, f"{v.sum()} stereo matches"
    depth = np.asarray(sm.depth)[v]
    expected = bf / disp
    frac_good = (np.abs(depth - expected) < 0.2 * expected).mean()
    assert frac_good > 0.8, f"depth median {np.median(depth)} vs {expected}"


def test_mutual_matching(rng):
    img = noisy_scene(rng)
    img2 = np.roll(img, (30, 40), axis=(0, 1))  # big shift, no window prior
    cfg = ext.ExtractorConfig(n_features=256)
    kp0 = ext.extract(jnp.asarray(img), cfg)
    kp1 = ext.extract(jnp.asarray(img2), cfg)
    idx, accept = mat.search_descriptors_mutual(kp0.desc, kp0.valid, kp1.desc, kp1.valid)
    acc = np.asarray(accept)
    assert acc.sum() > 40
    d = np.asarray(kp1.xy)[np.asarray(idx)[acc]] - np.asarray(kp0.xy)[acc]
    # most survivors should be true correspondences (displacement = (40,30))
    good = (np.abs(d - np.array([40.0, 30.0])).max(1) < 2.0).mean()
    assert good > 0.8, f"only {good:.2f} correct"
