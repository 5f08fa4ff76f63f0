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


def test_distributed_vi_ba_cg_converges(rng):
    """Distributed FullInertialBA (r5): visual obs sharded over the 8-device
    mesh, preintegration chain replicated — must converge like the
    single-device CG engine on the same problem."""
    from orb_slam3_fast_tpu.optim import vi_ba_cg
    from orb_slam3_fast_tpu.utils import lie
    from tests.test_inertial import CAM  # noqa: F811 — the VI problem's camera
    from tests.test_vi_ba import build_vi_problem

    prob, R_gt, p_gt, v_gt, xw_gt = build_vi_problem(rng, n_kf=8, n_lm=256)
    # obs count = 8 KFs x 256 lms = 2048, divisible by the 8-device mesh
    mesh = dist_ba.make_mesh(8)
    T_cb = lie.SE3.identity()
    sharded = dist_ba.shard_vi_problem(prob, mesh)
    run = dist_ba.make_distributed_vi_ba_cg(
        mesh, CAM, jnp.float32(0.0), T_cb, iters1=4, iters2=8, cg_iters=32
    )
    R, p, v, b, xw, inlier = run(sharded)
    p_err = np.linalg.norm(np.asarray(p) - p_gt, axis=1)
    v_err = np.linalg.norm(np.asarray(v) - v_gt, axis=1)
    assert p_err.max() < 0.01, f"pos err {p_err}"
    assert v_err.max() < 0.05, f"vel err {v_err}"
    # parity with the single-device engine
    R1, p1, v1, b1, xw1, inl1, aborted = vi_ba_cg.full_inertial_ba_cg(
        CAM, jnp.float32(0.0), T_cb, prob, iters1=4, iters2=8, cg_iters=32
    )
    assert not aborted
    assert np.abs(np.asarray(p) - np.asarray(p1)).max() < 5e-3
