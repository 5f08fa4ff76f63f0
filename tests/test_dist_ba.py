"""Distributed BA on a virtual 8-device CPU mesh: must converge like the
single-device solver (SURVEY.md §4: fake-cluster tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_fast_tpu.optim import ba
from orb_slam3_fast_tpu.parallel import dist_ba
from tests.test_ba import CAM, BF, make_ba_problem, reproj_rmse


def test_distributed_ba_converges(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    prob, R_gt, t_gt, xw_gt = make_ba_problem(rng, K=8, M=256, noise=0.2)
    # observation count must divide the mesh: 8*256 obs = 2048, divisible by 8
    mesh = dist_ba.make_mesh(8)
    sharded = dist_ba.shard_problem(prob, mesh)
    run = dist_ba.make_distributed_ba(mesh, CAM, BF, n_iters=12)
    R, t, xw, inlier, cost = run(sharded)
    rmse = reproj_rmse(prob, R, t, xw)
    assert rmse < 0.5, f"distributed BA rmse {rmse}"
    c_est = -np.einsum("kji,kj->ki", np.asarray(R), np.asarray(t))
    c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
    assert np.linalg.norm(c_est - c_gt, axis=1).max() < 0.02


def test_distributed_matches_single_device(rng):
    prob, *_ = make_ba_problem(rng, K=8, M=256, noise=0.3)
    mesh = dist_ba.make_mesh(8)
    run = dist_ba.make_distributed_ba(mesh, CAM, BF, n_iters=8)
    R_d, t_d, xw_d, _, _ = run(dist_ba.shard_problem(prob, mesh))
    # single-device: same LM loop on one chip via a 1-device mesh
    mesh1 = dist_ba.make_mesh(1)
    run1 = dist_ba.make_distributed_ba(mesh1, CAM, BF, n_iters=8)
    R_s, t_s, xw_s, _, _ = run1(dist_ba.shard_problem(prob, mesh1))
    # identical math + deterministic reduction order differences only
    np.testing.assert_allclose(np.asarray(R_d), np.asarray(R_s), atol=5e-4)
    np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s), atol=5e-3)
