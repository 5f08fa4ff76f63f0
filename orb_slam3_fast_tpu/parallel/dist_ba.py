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


def make_distributed_ba(mesh: Mesh, cam, bf, n_iters: int = 10, iters1: int | None = None,
                        iters2: int | None = None):
    """Build a jitted distributed-BA function for a fixed problem shape.

    Two robust phases with chi2 inlier reclassification between them (the
    reference GBA schedule, Optimizer.cc:984-1094 applied to the global
    problem): ``iters1`` LM iterations on all observations, reclassify,
    ``iters2`` more on the inlier set.  All block reductions are ``psum``
    over the ``obs`` mesh axis; every chip solves the identical (small)
    reduced camera system — block building over observations is where the
    FLOPs are and shards perfectly.

    Returns ``fn(prob) -> (R, t, xw, inlier, cost)``.
    """
    i1 = iters1 if iters1 is not None else n_iters
    i2 = iters2 if iters2 is not None else 0

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
        out_specs=(P(), P(), P(), P("obs"), P()),
    )
    def dist_step(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va):
        local = BAProblem(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va)

        def body(carry, _):
            R, t, xw, lam, inlier = carry
            blocks = ba_mod.build_normal_blocks(
                cam, bf, R, t, xw, local._replace(R=R, t=t, xw=xw), inlier
            )
            Hpp, Hll, bp, bl, Z, w_lm, cost = (
                jax.lax.psum(b, "obs") for b in blocks
            )
            dp, dl = ba_mod.schur_solve(Hpp, Hll, bp, bl, Z, w_lm, pose_fixed, lm_valid, lam)
            R_new, t_new, xw_new = ba_mod.apply_update(R, t, xw, dp, dl)
            # recompute cost at the candidate (local + psum)
            r_new, _, posd = ba_mod._obs_residuals(cam, bf, R_new, t_new, xw_new, local)
            act = o_va & posd & lm_valid[o_lm] & inlier
            c_new_local, _ = ba_mod._robust_cost(r_new, local, act)
            c_new = jax.lax.psum(c_new_local, "obs")
            accept = c_new < cost
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            xw = jnp.where(accept, xw_new, xw)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
            return (R, t, xw, lam, inlier), cost

        def classify(R, t, xw):
            # per-observation chi2 gate — purely local, no collective needed
            r, _, posd = ba_mod._obs_residuals(cam, bf, R, t, xw, local)
            chi2 = jnp.sum(r * r, axis=-1) * o_is2
            delta2 = jnp.where(o_st, 7.815, 5.991)
            return o_va & posd & (chi2 <= delta2) & lm_valid[o_lm]

        inlier = jnp.ones_like(o_va)
        (R, t, xw, _, _), costs = jax.lax.scan(
            body, (R, t, xw, jnp.float32(1e-4), inlier), None, length=i1
        )
        inlier = classify(R, t, xw)
        if i2 > 0:
            (R, t, xw, _, _), costs = jax.lax.scan(
                body, (R, t, xw, jnp.float32(1e-4), inlier), None, length=i2
            )
            inlier = classify(R, t, xw)
        return R, t, xw, inlier, costs[-1]

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


def make_distributed_ba_cg(mesh: Mesh, cam, bf, iters1: int = 5, iters2: int = 10,
                           cg_iters: int = 24):
    """Distributed implicit-Schur CG bundle adjustment (optim/ba_cg.py) —
    the GLOBAL-BA path at reference scale.  The dense-Z psum of
    ``make_distributed_ba`` moves O(M*K*18) floats per iteration; here the
    coupling blocks ``Wob`` STAY sharded with their observations and each CG
    matvec reduces only an (M,3) and a (K,6) psum — the collective volume
    drops from the coupling tensor to the state itself.
    """
    from orb_slam3_fast_tpu.optim import ba_cg

    def psum(x):
        return jax.lax.psum(x, "obs")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),
            P("obs"), P("obs"), P("obs"), P("obs"), P("obs"), P("obs"),
        ),
        out_specs=(P(), P(), P(), P("obs"), P()),
    )
    def dist(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va):
        local = BAProblem(R, t, pose_fixed, xw, lm_valid, o_kf, o_lm, o_uv, o_is2, o_st, o_va)

        def phase(R, t, xw, inlier, lam, n):
            def body(carry, _):
                R, t, xw, lam = carry
                R, t, xw, lam, cost = ba_cg._lm_step(
                    cam, bf, local, R, t, xw, inlier, lam, cg_iters,
                    reduce_k=psum, reduce_m=psum, reduce_s=psum,
                )
                return (R, t, xw, lam), cost

            (R, t, xw, lam), costs = jax.lax.scan(body, (R, t, xw, lam), None, length=n)
            return R, t, xw, lam, costs[-1]

        def classify(R, t, xw):
            r, _, posd = ba_mod._obs_residuals(cam, bf, R, t, xw, local)
            chi2 = jnp.sum(r * r, axis=-1) * o_is2
            delta2 = jnp.where(o_st, 7.815, 5.991)
            return o_va & posd & (chi2 <= delta2) & lm_valid[o_lm]

        inlier = jnp.ones_like(o_va)
        R, t, xw, lam, cost = phase(R, t, xw, inlier, jnp.float32(1e-4), iters1)
        inlier = classify(R, t, xw)
        R, t, xw, lam, cost = phase(R, t, xw, inlier, jnp.float32(1e-4), iters2)
        inlier = classify(R, t, xw)
        return R, t, xw, inlier, cost

    @jax.jit
    def run(prob: BAProblem):
        return dist(
            prob.R, prob.t, prob.pose_fixed, prob.xw, prob.lm_valid,
            prob.obs_kf, prob.obs_lm, prob.obs_uv,
            prob.obs_inv_sigma2, prob.obs_is_stereo, prob.obs_valid,
        )

    return run


def shard_vi_problem(prob, mesh: Mesh):
    """Place a ``vi_ba.VIBAProblem``: visual observation arrays sharded over
    ``obs``; body states, landmarks, and the (tiny) preintegration-edge
    tables replicated."""
    obs_sharding = NamedSharding(mesh, P("obs"))
    rep = NamedSharding(mesh, P())
    put = jax.device_put
    return prob._replace(
        R_wb=put(prob.R_wb, rep), p_wb=put(prob.p_wb, rep),
        v_w=put(prob.v_w, rep), bias=put(prob.bias, rep),
        state_fixed=put(prob.state_fixed, rep),
        xw=put(prob.xw, rep), lm_valid=put(prob.lm_valid, rep),
        obs_kf=put(prob.obs_kf, obs_sharding),
        obs_lm=put(prob.obs_lm, obs_sharding),
        obs_uv=put(prob.obs_uv, obs_sharding),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, obs_sharding),
        obs_is_stereo=put(prob.obs_is_stereo, obs_sharding),
        obs_valid=put(prob.obs_valid, obs_sharding),
        edge_i=put(prob.edge_i, rep), edge_j=put(prob.edge_j, rep),
        edge_valid=put(prob.edge_valid, rep),
        preint=jax.tree.map(lambda a: put(a, rep), prob.preint),
    )


def make_distributed_vi_ba_cg(mesh: Mesh, cam, bf, T_cb,
                              iters1: int = 5, iters2: int = 8,
                              cg_iters: int = 40):
    """Distributed FullInertialBA (optim/vi_ba_cg.py) — the inertial GBA of
    the stereo-inertial north-star configs sharded over the mesh.  Visual
    observations (where the FLOPs are) shard over ``obs``; the 15-D state,
    landmarks, and preintegration chain replicate (the chain is O(K) tiny
    blocks — replicating it costs less than one (K,6) psum).  Per CG matvec
    the collective volume is one (M,3) + one (K,6) psum, exactly like the
    visual CG path."""
    from orb_slam3_fast_tpu.optim import vi_ba_cg
    from orb_slam3_fast_tpu.optim.vi_ba import VIBAProblem

    def psum(x):
        return jax.lax.psum(x, "obs")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),          # states
            P(), P(),                          # xw, lm_valid
            P("obs"), P("obs"), P("obs"), P("obs"), P("obs"), P("obs"),
            P(), P(), P(), P(),                # edges + preint pytree
        ),
        out_specs=(P(), P(), P(), P(), P(), P("obs")),
    )
    def dist(R_wb, p_wb, v_w, bias, state_fixed, xw, lm_valid,
             o_kf, o_lm, o_uv, o_is2, o_st, o_va, e_i, e_j, e_val, preint):
        local = VIBAProblem(
            R_wb, p_wb, v_w, bias, state_fixed, xw, lm_valid,
            o_kf, o_lm, o_uv, o_is2, o_st, o_va, e_i, e_j, e_val, preint,
        )

        def phase(R_wb, p_wb, v_w, bias, xw, inlier, lam, n):
            def body(carry, _):
                R_wb, p_wb, v_w, bias, xw, lam = carry
                out = vi_ba_cg._lm_step_vi(
                    cam, bf, T_cb, local, R_wb, p_wb, v_w, bias, xw, inlier,
                    lam, cg_iters, reduce_k=psum, reduce_m=psum, reduce_s=psum,
                )
                return out[:6], out[6]

            (R_wb, p_wb, v_w, bias, xw, lam), _ = jax.lax.scan(
                body, (R_wb, p_wb, v_w, bias, xw, lam), None, length=n
            )
            return R_wb, p_wb, v_w, bias, xw, lam

        def classify(R_wb, p_wb, xw):
            # purely local chi2 gate on the obs shard
            return vi_ba_cg._classify_vi_impl(cam, bf, T_cb, local, R_wb, p_wb, xw)

        inlier = jnp.ones_like(o_va)
        R_wb, p_wb, v_w, bias, xw, lam = phase(
            R_wb, p_wb, v_w, bias, xw, inlier, jnp.float32(1e-4), iters1
        )
        inlier = classify(R_wb, p_wb, xw)
        R_wb, p_wb, v_w, bias, xw, lam = phase(
            R_wb, p_wb, v_w, bias, xw, inlier, jnp.float32(1e-4), iters2
        )
        inlier = classify(R_wb, p_wb, xw)
        return R_wb, p_wb, v_w, bias, xw, inlier

    @jax.jit
    def run(prob):
        return dist(
            prob.R_wb, prob.p_wb, prob.v_w, prob.bias, prob.state_fixed,
            prob.xw, prob.lm_valid,
            prob.obs_kf, prob.obs_lm, prob.obs_uv,
            prob.obs_inv_sigma2, prob.obs_is_stereo, prob.obs_valid,
            prob.edge_i, prob.edge_j, prob.edge_valid, prob.preint,
        )

    return run


_DIST_VI_BA_CG_CACHE: dict = {}


def get_distributed_vi_ba_cg(mesh: Mesh, cam, bf, T_cb, iters1: int, iters2: int,
                             cg_iters: int = 40):
    key = (len(mesh.devices.flat), cam.kind, iters1, iters2, cg_iters)
    fn = _DIST_VI_BA_CG_CACHE.get(key)
    if fn is None:
        fn = make_distributed_vi_ba_cg(
            mesh, cam, bf, T_cb, iters1=iters1, iters2=iters2, cg_iters=cg_iters
        )
        _DIST_VI_BA_CG_CACHE[key] = fn
    return fn


_DIST_BA_CG_CACHE: dict = {}


def get_distributed_ba_cg(mesh: Mesh, cam, bf, iters1: int, iters2: int, cg_iters: int = 24):
    key = (len(mesh.devices.flat), cam.kind, iters1, iters2, cg_iters)
    fn = _DIST_BA_CG_CACHE.get(key)
    if fn is None:
        fn = make_distributed_ba_cg(mesh, cam, bf, iters1=iters1, iters2=iters2,
                                    cg_iters=cg_iters)
        _DIST_BA_CG_CACHE[key] = fn
    return fn


_DIST_BA_CACHE: dict = {}


def get_distributed_ba(mesh: Mesh, cam, bf, iters1: int, iters2: int):
    """Cached factory (one compiled program per (mesh size, iters))."""
    key = (len(mesh.devices.flat), cam.kind, iters1, iters2)
    fn = _DIST_BA_CACHE.get(key)
    if fn is None:
        fn = make_distributed_ba(mesh, cam, bf, iters1=iters1, iters2=iters2)
        _DIST_BA_CACHE[key] = fn
    return fn


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))
