"""Vocabulary tree + keyframe database (DBoW2-equivalent) tests.

Mirrors the reference's place-recognition contract: similar images score
high, dissimilar score low, inverted-file candidate detection finds the
revisited keyframe (KeyFrameDatabase.cc:612-741).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_fast_tpu.vocab import database as db_mod
from orb_slam3_fast_tpu.vocab import vocabulary as voc_mod


def _random_desc(rng, n):
    return (rng.uniform(size=(n, 256)) > 0.5).astype(np.int8)


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    return voc_mod.train(_random_desc(rng, 4000), branching=6, depth=3, seed=1)


def test_train_shapes(voc):
    assert voc.n_words == 6**3
    assert voc.centroids[0].shape == (6, 256)
    assert voc.centroids[2].shape == (216, 256)
    assert bool(voc.alive[0].all())


def test_transform_determinism_and_quantization(voc):
    rng = np.random.default_rng(1)
    d = jnp.asarray(_random_desc(rng, 128))
    valid = jnp.ones(128, bool)
    w1, n1, bow1 = voc_mod.transform(voc, d, valid)
    w2, _, _ = voc_mod.transform(voc, d, valid)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert np.asarray(w1).min() >= 0 and np.asarray(w1).max() < voc.n_words
    # bow is L1-normalized
    assert abs(float(bow1.sum()) - 1.0) < 1e-5
    # nodes group words: same node id -> same prefix of the tree path
    assert np.asarray(n1).max() < 6 ** (voc.depth - voc.levels_up)


def test_transform_respects_validity(voc):
    rng = np.random.default_rng(2)
    d = jnp.asarray(_random_desc(rng, 64))
    valid = jnp.zeros(64, bool).at[:10].set(True)
    w, _, bow = voc_mod.transform(voc, d, valid)
    assert (np.asarray(w)[10:] == -1).all()
    assert abs(float(bow.sum()) - 1.0) < 1e-5


def test_descent_assigns_nearest_leaf(voc):
    """A descriptor equal to a live leaf centroid must map to a word whose
    leaf centroid is at least as close as 95% of random assignments."""
    leaf_c = np.asarray(voc.centroids[-1])
    live = np.asarray(voc.alive[-1])
    leaf_ids = np.nonzero(live)[0][:32]
    d = jnp.asarray(leaf_c[leaf_ids])
    w = np.asarray(voc_mod.transform_words(voc, d))
    # greedy descent may not be globally optimal, but hitting the exact
    # centroid should usually return that leaf
    assert (w == leaf_ids).mean() > 0.6


def test_similar_images_score_higher(voc):
    rng = np.random.default_rng(3)
    base = _random_desc(rng, 256)
    # "same place": flip 8 of 256 bits per descriptor
    noisy = base.copy()
    flips = rng.integers(0, 256, size=(256, 8))
    for i in range(256):
        noisy[i, flips[i]] ^= 1
    other = _random_desc(rng, 256)
    valid = jnp.ones(256, bool)
    _, _, bow_a = voc_mod.transform(voc, jnp.asarray(base), valid)
    _, _, bow_b = voc_mod.transform(voc, jnp.asarray(noisy), valid)
    _, _, bow_c = voc_mod.transform(voc, jnp.asarray(other), valid)
    s_same = float(voc_mod.score_l1(bow_a, bow_b))
    s_diff = float(voc_mod.score_l1(bow_a, bow_c))
    assert s_same > s_diff + 0.1
    assert float(voc_mod.score_l1(bow_a, bow_a)) > 0.999


def test_database_candidates(voc):
    rng = np.random.default_rng(4)
    db = db_mod.KeyFrameDatabase(voc.n_words, max_kf=32)
    valid = jnp.ones(256, bool)
    descs = [_random_desc(rng, 256) for _ in range(8)]
    bows = []
    for k, d in enumerate(descs):
        _, _, bow = voc_mod.transform(voc, jnp.asarray(d), valid)
        bow = np.asarray(bow)
        bows.append(bow)
        db.add(k, bow, map_id=0)
    # query = noisy copy of KF 2, excluding its temporal neighbors 1,2,3
    q = descs[2].copy()
    flips = rng.integers(0, 256, size=(256, 6))
    for i in range(256):
        q[i, flips[i]] ^= 1
    _, _, qbow = voc_mod.transform(voc, jnp.asarray(q), valid)
    loop, merge = db.detect_n_best_candidates(
        np.asarray(qbow), covisible=np.array([1, 2, 3]), n=3, query_map=0
    )
    assert len(merge) == 0
    assert len(loop) >= 1
    # reloc: no exclusion -> KF 2 itself should be the top candidate
    reloc = db.detect_reloc_candidates(np.asarray(qbow), query_map=0)
    assert reloc[0] == 2


def test_database_erase_and_clear(voc):
    rng = np.random.default_rng(5)
    db = db_mod.KeyFrameDatabase(voc.n_words, max_kf=16)
    valid = jnp.ones(64, bool)
    for k in range(4):
        _, _, bow = voc_mod.transform(voc, jnp.asarray(_random_desc(rng, 64)), valid)
        db.add(k, np.asarray(bow), map_id=k % 2)
    db.erase(0)
    assert not db.valid[0] and db.valid[1]
    db.clear_map(1)
    assert not db.valid[1] and not db.valid[3] and db.valid[2]


def test_save_load_roundtrip(tmp_path, voc):
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    v2 = voc_mod.Vocabulary.load(p)
    rng = np.random.default_rng(6)
    d = jnp.asarray(_random_desc(rng, 64))
    w1 = np.asarray(voc_mod.transform_words(voc, d))
    w2 = np.asarray(voc_mod.transform_words(v2, d))
    np.testing.assert_array_equal(w1, w2)
