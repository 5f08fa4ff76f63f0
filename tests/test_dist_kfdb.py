"""Sharded keyframe-database scoring: exact parity with the host path on the
8-virtual-device CPU mesh, incremental row updates, growth re-shard, and the
candidate API producing identical results attached vs detached."""
import numpy as np

from orb_slam3_fast_tpu.parallel import multihost
from orb_slam3_fast_tpu.vocab import database as db_mod

N_WORDS = 512


def _mk_db(attach: bool, rng):
    db = db_mod.KeyFrameDatabase(N_WORDS, max_kf=64)
    if attach:
        db.attach_mesh(multihost.global_mesh())
    for k in range(24):
        bow = rng.uniform(0, 1, N_WORDS).astype(np.float32)
        bow[rng.uniform(0, 1, N_WORDS) < 0.8] = 0.0
        bow /= max(bow.sum(), 1e-9)
        db.add(k, bow, map_id=0)
    return db


def test_sharded_scores_match_host():
    rng = np.random.default_rng(0)
    host = _mk_db(False, np.random.default_rng(7))
    shard = _mk_db(True, np.random.default_rng(7))
    q = rng.uniform(0, 1, N_WORDS).astype(np.float32)
    q[rng.uniform(0, 1, N_WORDS) < 0.8] = 0.0
    q /= q.sum()
    ch, sh_, eh = host._scores(q, np.asarray([3]))
    cs, ss, es = shard._scores(q, np.asarray([3]))
    np.testing.assert_array_equal(ch, cs)
    np.testing.assert_allclose(sh_, ss, atol=1e-5)
    np.testing.assert_array_equal(eh, es)


def test_sharded_candidates_match_host():
    host = _mk_db(False, np.random.default_rng(11))
    shard = _mk_db(True, np.random.default_rng(11))
    q = host.bow[5].copy()  # query with a known near-duplicate in the DB
    for db in (host, shard):
        db.erase(5)
    lh, mh = host.detect_n_best_candidates(q, np.asarray([4, 6]), 3, query_map=0)
    ls, ms = shard.detect_n_best_candidates(q, np.asarray([4, 6]), 3, query_map=0)
    np.testing.assert_array_equal(lh, ls)
    np.testing.assert_array_equal(mh, ms)


def test_growth_reshards():
    rng = np.random.default_rng(3)
    db = db_mod.KeyFrameDatabase(N_WORDS, max_kf=8)
    db.attach_mesh(multihost.global_mesh())
    for k in range(20):  # crosses 8 -> 16 -> 32
        bow = rng.uniform(0, 1, N_WORDS).astype(np.float32)
        bow /= bow.sum()
        db.add(k, bow)
    assert db.max_kf == 32 and db.sharded.max_kf == 32
    c, s = db.sharded.scores(db.bow[19])
    dense = db.bow
    q_has = dense[19] > 0
    np.testing.assert_array_equal(c, ((dense > 0) & q_has[None]).sum(1))
