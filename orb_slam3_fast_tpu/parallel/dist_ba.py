"""Distributed bundle adjustment over a device mesh.

The reference has NO multi-device capability (SURVEY.md §2.3: single-process
shared-memory only) — this is the additive north-star feature from
BASELINE.json: "partition keyframes and Atlas map blocks across hosts,
running distributed bundle adjustment with the camera/landmark Schur
complement reduced over psum/all-gather collectives".

Design (data-parallel over observations, the natural BA decomposition):
  * the observation table is sharded over the mesh axis ``obs`` — each chip
    holds O/n observations and the full (small) pose/landmark state,
  * each chip builds its partial normal-equation blocks (all plain sums over
    observations: Hpp, Hll, bp, bl, the Z coupling tensor, robust cost),
  * one ``psum`` over ICI reduces the blocks; every chip then solves the
    identical reduced camera system and applies the identical update —
    replicated solve is optimal here because the reduced system is tiny
    (<= ~100 poses) while block building is O(observations), which is where
    the FLOPs are.

Landmark-sharded variants (reduce_scatter of Hll/Z) become worthwhile at
global-BA scale and are the planned extension.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam3_fast_tpu.optim import ba as ba_mod
from orb_slam3_fast_tpu.optim.ba import BAProblem


def shard_problem(prob: BAProblem, mesh: Mesh) -> BAProblem:
    """Place observation arrays sharded over the ``obs`` axis and state
    arrays replicated.  Observation count must divide the mesh size (pad
    with obs_valid=False rows)."""
    obs_sharding = NamedSharding(mesh, P("obs"))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return BAProblem(
        R=put(prob.R, rep),
        t=put(prob.t, rep),
        pose_fixed=put(prob.pose_fixed, rep),
        xw=put(prob.xw, rep),
        lm_valid=put(prob.lm_valid, rep),
        obs_kf=put(prob.obs_kf, obs_sharding),
        obs_lm=put(prob.obs_lm, obs_sharding),
        obs_uv=put(prob.obs_uv, obs_sharding),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, obs_sharding),
        obs_is_stereo=put(prob.obs_is_stereo, obs_sharding),
        obs_valid=put(prob.obs_valid, obs_sharding),
    )


def make_distributed_ba(mesh: Mesh, cam, bf, n_iters: int = 10):
    """Build a jitted distributed-BA step function for a fixed problem shape.

    Returns ``fn(prob) -> (R, t, xw, cost)`` running ``n_iters`` LM
    iterations with all block reductions as ``psum`` over the ``obs`` axis.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # R
            P(),  # t
            P(),  # pose_fixed
            P(),  # xw
            P(),  # lm_valid
            P("obs"),
            P("obs"),
            P("obs"),
            P("obs"),
            P("obs"),
            P("obs"),
        ),
        out_specs=(P(), P(), P(), P()),
    )
    def dist_step(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va):
        local = BAProblem(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va)

        def body(carry, _):
            R, t, xw, lam = carry
            blocks = ba_mod.build_normal_blocks(cam, bf, R, t, xw, local._replace(R=R, t=t, xw=xw), jnp.ones_like(o_va))
            Hpp, Hll, bp, bl, Z, w_lm, cost = (
                jax.lax.psum(b, "obs") for b in blocks
            )
            dp, dl = ba_mod.schur_solve(Hpp, Hll, bp, bl, Z, w_lm, pose_fixed, lm_valid, lam)
            R_new, t_new, xw_new = ba_mod.apply_update(R, t, xw, dp, dl)
            # recompute cost at the candidate (local + psum)
            r_new, _, posd = ba_mod._obs_residuals(cam, bf, R_new, t_new, xw_new, local)
            act = o_va & posd & lm_valid[o_lm]
            c_new_local, _ = ba_mod._robust_cost(r_new, local, act)
            c_new = jax.lax.psum(c_new_local, "obs")
            accept = c_new < cost
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            xw = jnp.where(accept, xw_new, xw)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
            return (R, t, xw, lam), cost

        (R, t, xw, _), costs = jax.lax.scan(
            body, (R, t, xw, jnp.float32(1e-4)), None, length=n_iters
        )
        return R, t, xw, costs[-1]

    @jax.jit
    def run(prob: BAProblem):
        return dist_step(
            prob.R,
            prob.t,
            prob.pose_fixed,
            prob.xw,
            prob.lm_valid,
            prob.obs_kf,
            prob.obs_lm,
            prob.obs_uv,
            prob.obs_inv_sigma2,
            prob.obs_is_stereo,
            prob.obs_valid,
        )

    return run


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))
