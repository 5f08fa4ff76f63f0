"""Scalable FullInertialBA: implicit-Schur Levenberg-Marquardt over 15-D
body states (pose, velocity, bias) with block-Jacobi preconditioned CG.

TPU-native replacement for the reference's inertial GLOBAL bundle adjustment
(``Optimizer::FullInertialBA``, ``/root/reference/src/Optimizer.cc:374-780``:
ALL keyframes as VertexPose/Velocity/GyroBias/AccBias, ALL landmarks, the
whole preintegration chain as EdgeInertial + EdgeGyroRW/EdgeAccRW, dispatched
from the loop-closing GBA thread at ``LoopClosing.cc:2397-2650`` and honoring
the mbStopGBA abort).  The windowed dense solver (``optim/vi_ba.py``)
materializes a (15K x 15K) state Hessian plus a dense (M,K,6,3) coupling
tensor — right for a <=32-state window, a memory wall at global scale.  This
module never builds either:

  * the inertial + bias-random-walk chain stays PER-EDGE: (E,15,15) blocks
    applied in the CG matvec as two gathers + einsum + scatter-add (the chain
    is a block-tridiagonal operator; E = K-1),
  * the visual reprojection factors keep the per-observation (O,6,3) coupling
    of ``optim/ba_cg.py``, embedded in the first 6 slots of the 15-D state
    tangent,
  * landmarks are Schur-eliminated implicitly: S = H_state - Z Hll^-1 Z^T is
    applied as an operator, never formed.

Memory is O(K*15^2 + E*3*15^2 + M*9 + O*18): a 1000-KF / 50k-landmark /
300k-obs inertial GBA fits in ~80 MB.  The LM schedule is host-segmented
(``lm_segment_vi``) so the GBA thread polls the abort flag between device
dispatches — the reference's interruptible GBA (Optimizer.cc:566-571 region
checks pbStopFlag inside FullInertialBA's iteration loop).

State tangent convention matches ``optim/inertial.retract`` /
``optim/vi_ba.py`` (G2oTypes.h:78-240 oplus): R <- R Exp(dth), p <- p + R dp.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.optim import inertial as inr
from orb_slam3_fast_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, _huber_weight
from orb_slam3_fast_tpu.optim.vi_ba import VIBAProblem, _camera_pose
from orb_slam3_fast_tpu.utils import lie

S = 15  # [theta(3), p(3), v(3), bg(3), ba(3)]


def _noreduce(x):
    return x


def _visual_blocks_cg(cam, bf, T_cb, R_wb, p_wb, xw, prob: VIBAProblem, inlier):
    """Reprojection normal-equation pieces w.r.t. the body-pose tangent
    (first 6 state slots) WITHOUT the dense (M,K,6,3) coupling tensor:
    the per-observation ``Wob (O,6,3)`` stays on the observation table
    (mirrors ``ba_cg.build_blocks``; math identical to
    ``vi_ba._visual_blocks``)."""
    K = R_wb.shape[0]
    M = xw.shape[0]
    R_cw, t_cw = _camera_pose(T_cb, R_wb, p_wb)
    Rk = R_cw[prob.obs_kf]
    tk = t_cw[prob.obs_kf]
    xo = xw[prob.obs_lm]
    xc = jnp.einsum("oij,oj->oi", Rk, xo) + tk
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = prob.obs_uv - uvr
    r = r.at[:, 2].set(jnp.where(prob.obs_is_stereo, r[:, 2], 0.0))
    posd = xc[:, 2] > 0.05
    active = prob.obs_valid & inlier & posd & prob.lm_valid[prob.obs_lm]
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    w = jnp.where(active, _huber_weight(chi2, delta2) * prob.obs_inv_sigma2, 0.0)

    Jproj = jax.vmap(jax.jacfwd(lambda x: cam_models.stereo_project(cam, x, bf)))(xc)
    Jproj = jnp.where(prob.obs_is_stereo[:, None, None], Jproj, Jproj.at[:, 2, :].set(0.0))
    Rwb_o = R_wb[prob.obs_kf]
    xb = jnp.einsum("oji,oj->oi", Rwb_o, xo - p_wb[prob.obs_kf])
    Rcb = T_cb.R
    dxc_dth = jnp.einsum("ij,ojk->oik", Rcb, lie.hat(xb))
    dxc_dp = jnp.broadcast_to(-Rcb, (xc.shape[0], 3, 3))
    dxc_dpose = jnp.concatenate([dxc_dth, dxc_dp], axis=-1)  # (O,3,6)
    Jp = -jnp.einsum("oij,ojk->oik", Jproj, dxc_dpose)
    Jl = -jnp.einsum("oij,ojk->oik", Jproj, Rk)
    free = (~prob.state_fixed)[prob.obs_kf]
    Jp = Jp * free[:, None, None]

    Hpp = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(jnp.einsum("oij,o,oik->ojk", Jp, w, Jp))
    Hll = jnp.zeros((M, 3, 3)).at[prob.obs_lm].add(jnp.einsum("oij,o,oik->ojk", Jl, w, Jl))
    bp = jnp.zeros((K, 6)).at[prob.obs_kf].add(-jnp.einsum("oij,o,oi->oj", Jp, w, r))
    bl = jnp.zeros((M, 3)).at[prob.obs_lm].add(-jnp.einsum("oij,o,oi->oj", Jl, w, r))
    Wob = jnp.einsum("oij,o,oik->ojk", Jp, w, Jl)  # (O,6,3)
    w_lm = jnp.zeros((M,)).at[prob.obs_lm].add(w)
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    )
    cost = jnp.sum(jnp.where(active, rho, 0.0))
    return Hpp, Hll, bp, bl, Wob, w_lm, cost


def _inertial_edge_blocks(prob: VIBAProblem, R_wb, p_wb, v_w, bias):
    """Per-edge 15x15 blocks of the preintegration + bias-RW chain
    (EdgeInertial + EdgeGyroRW/EdgeAccRW): ``Hii/Hjj/Hij (E,15,15)`` stay on
    the edge table for the CG matvec; only the gradient is scattered.
    Same AD Jacobians as ``vi_ba._inertial_blocks``, minus the dense
    (K,S,K,S) assembly."""
    K = R_wb.shape[0]
    E = prob.edge_i.shape[0]
    zero = jnp.zeros(S)

    def edge_res(d_i, d_j, i, j, p):
        si = inr.retract(inr.BodyState(R_wb[i], p_wb[i], v_w[i], bias[i]), d_i)
        sj = inr.retract(inr.BodyState(R_wb[j], p_wb[j], v_w[j], bias[j]), d_j)
        return inr.inertial_residual(si, sj, p), sj.bias - si.bias

    def one_edge(e):
        i = prob.edge_i[e]
        j = prob.edge_j[e]
        p = jax.tree.map(lambda a: a[e], prob.preint)
        r9, rb = edge_res(zero, zero, i, j, p)
        J_i = jax.jacfwd(lambda d: edge_res(d, zero, i, j, p)[0])(zero)  # (9,S)
        J_j = jax.jacfwd(lambda d: edge_res(zero, d, i, j, p)[0])(zero)
        Jb_i = jax.jacfwd(lambda d: edge_res(d, zero, i, j, p)[1])(zero)  # (6,S)
        Jb_j = jax.jacfwd(lambda d: edge_res(zero, d, i, j, p)[1])(zero)
        info9 = inr.inertial_information(p)
        walk = jnp.linalg.inv(p.C[9:15, 9:15] + 1e-8 * jnp.eye(6))
        return r9, rb, J_i, J_j, Jb_i, Jb_j, info9, walk

    r9, rb, J_i, J_j, Jb_i, Jb_j, info9, walk = jax.vmap(one_edge)(jnp.arange(E))
    ev = prob.edge_valid.astype(jnp.float32)
    free = (~prob.state_fixed).astype(jnp.float32)
    J_i = J_i * (ev * free[prob.edge_i])[:, None, None]
    J_j = J_j * (ev * free[prob.edge_j])[:, None, None]
    Jb_i = Jb_i * (ev * free[prob.edge_i])[:, None, None]
    Jb_j = Jb_j * (ev * free[prob.edge_j])[:, None, None]

    Hii = jnp.einsum("eap,eab,ebq->epq", J_i, info9, J_i) + jnp.einsum(
        "eap,eab,ebq->epq", Jb_i, walk, Jb_i
    )
    Hjj = jnp.einsum("eap,eab,ebq->epq", J_j, info9, J_j) + jnp.einsum(
        "eap,eab,ebq->epq", Jb_j, walk, Jb_j
    )
    Hij = jnp.einsum("eap,eab,ebq->epq", J_i, info9, J_j) + jnp.einsum(
        "eap,eab,ebq->epq", Jb_i, walk, Jb_j
    )
    g = jnp.zeros((K, S))
    g = g.at[prob.edge_i].add(
        -jnp.einsum("eap,eab,eb->ep", J_i, info9, r9 * ev[:, None])
        - jnp.einsum("eap,eab,eb->ep", Jb_i, walk, rb * ev[:, None])
    )
    g = g.at[prob.edge_j].add(
        -jnp.einsum("eap,eab,eb->ep", J_j, info9, r9 * ev[:, None])
        - jnp.einsum("eap,eab,eb->ep", Jb_j, walk, rb * ev[:, None])
    )
    cost = jnp.sum(ev * jnp.einsum("ea,eab,eb->e", r9, info9, r9))
    cost += jnp.sum(ev * jnp.einsum("ea,eab,eb->e", rb, walk, rb))
    return Hii, Hjj, Hij, g, cost


def _inertial_cost(prob: VIBAProblem, R_wb, p_wb, v_w, bias):
    """Chain cost only (for LM acceptance) — no Jacobians."""
    E = prob.edge_i.shape[0]

    def one_edge(e):
        i = prob.edge_i[e]
        j = prob.edge_j[e]
        p = jax.tree.map(lambda a: a[e], prob.preint)
        si = inr.BodyState(R_wb[i], p_wb[i], v_w[i], bias[i])
        sj = inr.BodyState(R_wb[j], p_wb[j], v_w[j], bias[j])
        r9 = inr.inertial_residual(si, sj, p)
        rb = sj.bias - si.bias
        info9 = inr.inertial_information(p)
        walk = jnp.linalg.inv(p.C[9:15, 9:15] + 1e-8 * jnp.eye(6))
        return jnp.einsum("a,ab,b->", r9, info9, r9) + jnp.einsum(
            "a,ab,b->", rb, walk, rb
        )

    c = jax.vmap(one_edge)(jnp.arange(E))
    return jnp.sum(c * prob.edge_valid.astype(jnp.float32))


def _visual_cost(cam, bf, T_cb, R_wb, p_wb, xw, prob: VIBAProblem, inlier):
    R_cw, t_cw = _camera_pose(T_cb, R_wb, p_wb)
    xc = (
        jnp.einsum("oij,oj->oi", R_cw[prob.obs_kf], xw[prob.obs_lm])
        + t_cw[prob.obs_kf]
    )
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = prob.obs_uv - uvr
    r = r.at[:, 2].set(jnp.where(prob.obs_is_stereo, r[:, 2], 0.0))
    active = (
        prob.obs_valid & inlier & (xc[:, 2] > 0.05) & prob.lm_valid[prob.obs_lm]
    )
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    )
    return jnp.sum(jnp.where(active, rho, 0.0))


def _implicit_vi_solve(
    Hpp, Hll, bp, bl, Wob, Hii, Hjj, Hij, g_chain,
    obs_kf, obs_lm, edge_i, edge_j, w_lm,
    state_fixed, lm_valid, lam, cg_iters: int,
    reduce_k=_noreduce, reduce_m=_noreduce,
):
    """PCG on the landmark-Schur-reduced 15-D state system, applied as an
    operator.  Returns (dx (K,15), dl (M,3)).

    ``reduce_k``/``reduce_m`` are identity on one device and ``psum`` over
    the obs mesh axis in the distributed path (Hpp/Hll/bp/bl/w_lm and the
    chain blocks must already be globally consistent there: visual blocks
    psum-reduced by the caller, chain blocks replicated)."""
    K = Hpp.shape[0]
    M = Hll.shape[0]
    free = ~state_fixed
    free_f = free.astype(jnp.float32)

    # full-state gradient: chain + visual pose slots
    b = g_chain.at[:, 0:6].add(bp)

    # damped landmark block inverse
    Hll_d = Hll + (lam * jnp.maximum(jnp.diagonal(Hll, axis1=1, axis2=2), 1e-3))[
        :, :, None
    ] * jnp.eye(3)
    lm_seen = w_lm > 0
    Hll_d = jnp.where(lm_seen[:, None, None], Hll_d, jnp.eye(3))
    Vinv = jnp.linalg.inv(Hll_d)

    # per-state damping from the undamped block diagonal
    diag15 = jnp.zeros((K, S))
    diag15 = diag15.at[:, 0:6].add(jnp.diagonal(Hpp, axis1=1, axis2=2))
    diag15 = diag15.at[edge_i].add(jnp.diagonal(Hii, axis1=1, axis2=2))
    diag15 = diag15.at[edge_j].add(jnp.diagonal(Hjj, axis1=1, axis2=2))
    damp = lam * jnp.maximum(diag15, 1e-3)

    def Zt_v(v6):  # (K,6) -> (M,3)
        tmp = jnp.einsum("oab,oa->ob", Wob, v6[obs_kf])
        return reduce_m(jnp.zeros((M, 3)).at[obs_lm].add(tmp))

    def Z_y(y):  # (M,3) -> (K,6)
        tmp = jnp.einsum("oab,ob->oa", Wob, y[obs_lm])
        return reduce_k(jnp.zeros((K, 6)).at[obs_kf].add(tmp))

    def H_state_mv(v):  # block-tridiagonal chain + visual pose blocks
        out = damp * v
        out = out.at[:, 0:6].add(jnp.einsum("kab,kb->ka", Hpp, v[:, 0:6]))
        vi = v[edge_i]
        vj = v[edge_j]
        out = out.at[edge_i].add(
            jnp.einsum("eab,eb->ea", Hii, vi) + jnp.einsum("eab,eb->ea", Hij, vj)
        )
        out = out.at[edge_j].add(
            jnp.einsum("eab,eb->ea", Hjj, vj) + jnp.einsum("eba,eb->ea", Hij, vi)
        )
        return out

    def S_mv(v):
        v = v * free_f[:, None]
        hv = H_state_mv(v)
        y = jnp.einsum("mab,mb->ma", Vinv, Zt_v(v[:, 0:6]))
        hv = hv.at[:, 0:6].add(-Z_y(y))
        return hv * free_f[:, None]

    # rhs: b_s = b - Z Hll^-1 bl (pose slots only)
    y0 = jnp.einsum("mab,mb->ma", Vinv, bl)
    b_s = (b.at[:, 0:6].add(-Z_y(y0))) * free_f[:, None]

    # block-Jacobi preconditioner: exact 15x15 diagonal blocks of S
    D = jnp.zeros((K, S, S))
    D = D.at[:, 0:6, 0:6].add(Hpp)
    D = D.at[edge_i].add(Hii)
    D = D.at[edge_j].add(Hjj)
    D = D + jax.vmap(jnp.diag)(damp)
    diag_coup = jnp.einsum("oab,obc,odc->oad", Wob, Vinv[obs_lm], Wob)  # (O,6,6)
    D = D.at[:, 0:6, 0:6].add(
        -reduce_k(jnp.zeros((K, 6, 6)).at[obs_kf].add(diag_coup))
    )
    D = jnp.where(free[:, None, None], D, jnp.eye(S))
    Dinv = jnp.linalg.inv(D + 1e-5 * jnp.eye(S))

    def precond(r):
        return jnp.einsum("kab,kb->ka", Dinv, r) * free_f[:, None]

    x = jnp.zeros_like(b_s)
    r = b_s
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = S_mv(p)
        pAp = jnp.sum(p * Ap)
        ok = rz > 1e-12
        alpha = jnp.where(ok, rz / jnp.maximum(pAp, 1e-20), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z_new = precond(r)
        rz_new = jnp.sum(r * z_new)
        beta = jnp.where(ok, rz_new / jnp.maximum(rz, 1e-20), 0.0)
        p = z_new + beta * p
        return (x, r, z_new, p, rz_new), None

    (x, _, _, _, _), _ = jax.lax.scan(body, (x, r, z, p, rz), None, length=cg_iters)
    dx = x * free_f[:, None]
    dl = jnp.einsum("mab,mb->ma", Vinv, bl - Zt_v(dx[:, 0:6]))
    dl = dl * (lm_seen & lm_valid)[:, None]
    return dx, dl


def _lm_step_vi(cam, bf, T_cb, prob, R_wb, p_wb, v_w, bias, xw, inlier, lam, cg_iters,
                reduce_k=_noreduce, reduce_m=_noreduce, reduce_s=_noreduce):
    Hpp, Hll, bp, bl, Wob, w_lm, vcost = _visual_blocks_cg(
        cam, bf, T_cb, R_wb, p_wb, xw, prob, inlier
    )
    # distributed: visual blocks are partial sums over the local obs shard —
    # psum them; the inertial chain is REPLICATED (edges are tiny), no psum
    Hpp, Hll, bp, bl, w_lm, vcost = (
        reduce_s(Hpp), reduce_s(Hll), reduce_s(bp), reduce_s(bl),
        reduce_s(w_lm), reduce_s(vcost),
    )
    Hii, Hjj, Hij, g_chain, icost = _inertial_edge_blocks(prob, R_wb, p_wb, v_w, bias)
    dx, dl = _implicit_vi_solve(
        Hpp, Hll, bp, bl, Wob, Hii, Hjj, Hij, g_chain,
        prob.obs_kf, prob.obs_lm, prob.edge_i, prob.edge_j, w_lm,
        prob.state_fixed, prob.lm_valid, lam, cg_iters,
        reduce_k=reduce_k, reduce_m=reduce_m,
    )
    R_new = jnp.einsum("kij,kjl->kil", R_wb, jax.vmap(lie.so3_exp)(dx[:, 0:3]))
    p_new = p_wb + jnp.einsum("kij,kj->ki", R_wb, dx[:, 3:6])
    v_new = v_w + dx[:, 6:9]
    b_new = bias + dx[:, 9:15]
    xw_new = xw + dl
    cost_new = reduce_s(_visual_cost(cam, bf, T_cb, R_new, p_new, xw_new, prob, inlier))
    cost_new = cost_new + _inertial_cost(prob, R_new, p_new, v_new, b_new)
    accept = cost_new < (vcost + icost)
    pick = lambda a, b: jnp.where(accept, a, b)
    return (
        pick(R_new, R_wb), pick(p_new, p_wb), pick(v_new, v_w),
        pick(b_new, bias), pick(xw_new, xw),
        jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6)),
        vcost + icost,
    )


@partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
def lm_segment_vi(cam, bf, T_cb, prob: VIBAProblem, R_wb, p_wb, v_w, bias, xw,
                  inlier, lam, n_iters: int = 2, cg_iters: int = 32):
    """``n_iters`` LM iterations as one device program; the GBA thread polls
    the abort flag between segments (LoopClosing.cc:1072-1086 semantics)."""

    def body(carry, _):
        R_wb, p_wb, v_w, bias, xw, lam = carry
        out = _lm_step_vi(
            cam, bf, T_cb, prob, R_wb, p_wb, v_w, bias, xw, inlier, lam, cg_iters
        )
        return out[:6], out[6]

    (R_wb, p_wb, v_w, bias, xw, lam), costs = jax.lax.scan(
        body, (R_wb, p_wb, v_w, bias, xw, lam), None, length=n_iters
    )
    return R_wb, p_wb, v_w, bias, xw, lam, costs[-1]


def _classify_vi_impl(cam, bf, T_cb, prob: VIBAProblem, R_wb, p_wb, xw):
    """chi2 inlier gate on the reprojection factors (unjitted; purely local
    per observation, so the distributed path calls it inside shard_map)."""
    R_cw, t_cw = _camera_pose(T_cb, R_wb, p_wb)
    xc = (
        jnp.einsum("oij,oj->oi", R_cw[prob.obs_kf], xw[prob.obs_lm])
        + t_cw[prob.obs_kf]
    )
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = prob.obs_uv - uvr
    r = r.at[:, 2].set(jnp.where(prob.obs_is_stereo, r[:, 2], 0.0))
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    delta2 = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    return prob.obs_valid & (chi2 <= delta2) & (xc[:, 2] > 0.05)


classify_vi = jax.jit(_classify_vi_impl)


def full_inertial_ba_cg(cam, bf, T_cb, prob: VIBAProblem,
                        iters1: int = 5, iters2: int = 8,
                        cg_iters: int = 40, seg: int = 2, abort_flag=None):
    """Two-phase robust FullInertialBA, host-segmented for abortability.

    Returns (R_wb, p_wb, v_w, bias, xw, obs_inlier, aborted).  An aborted
    solve returns the current (partially optimized) state with aborted=True;
    the caller discards it (the reference discards an aborted GBA,
    LoopClosing.cc:2412-2422)."""
    R_wb, p_wb, v_w, bias, xw = prob.R_wb, prob.p_wb, prob.v_w, prob.bias, prob.xw
    lam = jnp.float32(1e-4)
    inlier = jnp.ones(prob.obs_uv.shape[0], dtype=bool)

    def run_phase(R_wb, p_wb, v_w, bias, xw, inlier, lam, total):
        done = 0
        while done < total:
            n = min(seg, total - done)
            R_wb, p_wb, v_w, bias, xw, lam, _ = lm_segment_vi(
                cam, bf, T_cb, prob, R_wb, p_wb, v_w, bias, xw, inlier, lam,
                n_iters=n, cg_iters=cg_iters,
            )
            done += n
            if abort_flag is not None and abort_flag.is_set():
                return R_wb, p_wb, v_w, bias, xw, lam, True
        return R_wb, p_wb, v_w, bias, xw, lam, False

    R_wb, p_wb, v_w, bias, xw, lam, aborted = run_phase(
        R_wb, p_wb, v_w, bias, xw, inlier, lam, iters1
    )
    if aborted:
        return R_wb, p_wb, v_w, bias, xw, inlier, True
    inlier = classify_vi(cam, bf, T_cb, prob, R_wb, p_wb, xw)
    R_wb, p_wb, v_w, bias, xw, lam, aborted = run_phase(
        R_wb, p_wb, v_w, bias, xw, inlier, jnp.float32(1e-4), iters2
    )
    inlier = classify_vi(cam, bf, T_cb, prob, R_wb, p_wb, xw)
    return R_wb, p_wb, v_w, bias, xw, inlier, aborted
