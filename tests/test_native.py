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
