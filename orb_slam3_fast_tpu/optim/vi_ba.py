"""Visual-inertial bundle adjustment: keyframe body states (pose, velocity,
bias) + landmarks, with reprojection, preintegration, and bias random-walk
factors.

TPU-native replacement for ``Optimizer::LocalInertialBA``
(``/root/reference/src/Optimizer.cc:2426-3024``: sliding temporal window with
EdgeMono/EdgeStereo + EdgeInertial + EdgeGyroRW/EdgeAccRW chains) and
``FullInertialBA`` (:374-780).  Structure per LM iteration:

  * visual blocks: identical Schur machinery as optim/ba.py but the pose
    tangent lives on the 15-D body state's first 6 slots (the camera pose is
    a deterministic function of the body pose through T_cb),
  * inertial chain: per-edge 9-D residuals between consecutive window states
    with AD Jacobians w.r.t. both 15-D endpoints, scattered into a dense
    (15K x 15K) H_cc — dense is right, the window is <= ~30 states,
  * landmarks Schur-eliminated exactly as in ba.py, with the coupling tensor
    embedded in the pose slots of the big system.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.optim import inertial as inr
from orb_slam3_fast_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, _huber_weight
from orb_slam3_fast_tpu.utils import lie

S = 15  # per-keyframe state dim [theta(3), p(3), v(3), bg(3), ba(3)]


class VIBAProblem(NamedTuple):
    # body states (K)
    R_wb: jnp.ndarray  # (K,3,3)
    p_wb: jnp.ndarray  # (K,3)
    v_w: jnp.ndarray  # (K,3)
    bias: jnp.ndarray  # (K,6)
    state_fixed: jnp.ndarray  # (K,) bool
    # landmarks (M)
    xw: jnp.ndarray
    lm_valid: jnp.ndarray
    # visual observations (O)
    obs_kf: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray  # (O,3)
    obs_inv_sigma2: jnp.ndarray
    obs_is_stereo: jnp.ndarray
    obs_valid: jnp.ndarray
    # inertial chain (E edges)
    edge_i: jnp.ndarray  # (E,) source state idx
    edge_j: jnp.ndarray  # (E,) target state idx
    edge_valid: jnp.ndarray  # (E,)
    preint: pre.Preintegrated  # stacked (E,...)


def _camera_pose(T_cb: lie.SE3, R_wb, p_wb):
    """T_cw from body state: T_cw = T_cb o T_bw."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    t_bw = -jnp.einsum("kij,kj->ki", R_bw, p_wb)
    R_cw = jnp.einsum("ij,kjl->kil", T_cb.R, R_bw)
    t_cw = jnp.einsum("ij,kj->ki", T_cb.R, t_bw) + T_cb.t
    return R_cw, t_cw


def _visual_blocks(cam, bf, T_cb, R_wb, p_wb, xw, prob: VIBAProblem, inlier):
    """Normal-equation blocks of the reprojection factors w.r.t. the body
    pose tangent (first 6 state slots) and landmarks."""
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
    # body-state pose tangent: R_wb <- R_wb Exp(dth), p_wb <- p_wb + R_wb dp
    # xc = R_cb (R_wb')^T (x - p') + ...  =>
    #   dxc/dth = R_cb hat(R_bw (x - p))  (right-mult),  dxc/dp = -R_cb
    Rwb_o = R_wb[prob.obs_kf]
    xb = jnp.einsum("oji,oj->oi", Rwb_o, xo - p_wb[prob.obs_kf])  # body coords
    Rcb = T_cb.R
    dxc_dth = jnp.einsum("ij,ojk->oik", Rcb, lie.hat(xb))
    dxc_dp = jnp.broadcast_to(-Rcb, (xc.shape[0], 3, 3))
    dxc_dpose = jnp.concatenate([dxc_dth, dxc_dp], axis=-1)  # (O,3,6)
    Jp = -jnp.einsum("oij,ojk->oik", Jproj, dxc_dpose)  # (O,3,6)
    Jl = -jnp.einsum("oij,ojk->oik", Jproj, Rk)  # (O,3,3)
    free = (~prob.state_fixed)[prob.obs_kf]
    Jp = Jp * free[:, None, None]

    Hpp = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(jnp.einsum("oij,o,oik->ojk", Jp, w, Jp))
    Hll = jnp.zeros((M, 3, 3)).at[prob.obs_lm].add(jnp.einsum("oij,o,oik->ojk", Jl, w, Jl))
    bp = jnp.zeros((K, 6)).at[prob.obs_kf].add(-jnp.einsum("oij,o,oi->oj", Jp, w, r))
    bl = jnp.zeros((M, 3)).at[prob.obs_lm].add(-jnp.einsum("oij,o,oi->oj", Jl, w, r))
    Wob = jnp.einsum("oij,o,oik->ojk", Jp, w, Jl)
    Z = jnp.zeros((M, K, 6, 3)).at[prob.obs_lm, prob.obs_kf].add(Wob)
    w_lm = jnp.zeros((M,)).at[prob.obs_lm].add(w)

    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    )
    cost = jnp.sum(jnp.where(active, rho, 0.0))
    return Hpp, Hll, bp, bl, Z, w_lm, cost


def _inertial_blocks(prob: VIBAProblem, R_wb, p_wb, v_w, bias):
    """Dense (K*S x K*S) contributions of the inertial + bias-RW chain."""
    K = R_wb.shape[0]
    E = prob.edge_i.shape[0]

    def edge_res(d_i, d_j, i, j, p):
        si = inr.retract(inr.BodyState(R_wb[i], p_wb[i], v_w[i], bias[i]), d_i)
        sj = inr.retract(inr.BodyState(R_wb[j], p_wb[j], v_w[j], bias[j]), d_j)
        r9 = inr.inertial_residual(si, sj, p)
        rb = sj.bias - si.bias
        return r9, rb

    zero = jnp.zeros(S)

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

    H = jnp.zeros((K, S, K, S))
    g = jnp.zeros((K, S))
    iI = prob.edge_i
    jI = prob.edge_j
    # 9-D inertial terms
    Hii = jnp.einsum("eap,eab,ebq->epq", J_i, info9, J_i)
    Hjj = jnp.einsum("eap,eab,ebq->epq", J_j, info9, J_j)
    Hij = jnp.einsum("eap,eab,ebq->epq", J_i, info9, J_j)
    H = H.at[iI, :, iI, :].add(Hii)
    H = H.at[jI, :, jI, :].add(Hjj)
    H = H.at[iI, :, jI, :].add(Hij)
    H = H.at[jI, :, iI, :].add(jnp.swapaxes(Hij, 1, 2))
    g = g.at[iI].add(-jnp.einsum("eap,eab,eb->ep", J_i, info9, r9 * ev[:, None]))
    g = g.at[jI].add(-jnp.einsum("eap,eab,eb->ep", J_j, info9, r9 * ev[:, None]))
    # bias random walk
    Bii = jnp.einsum("eap,eab,ebq->epq", Jb_i, walk, Jb_i)
    Bjj = jnp.einsum("eap,eab,ebq->epq", Jb_j, walk, Jb_j)
    Bij = jnp.einsum("eap,eab,ebq->epq", Jb_i, walk, Jb_j)
    H = H.at[iI, :, iI, :].add(Bii)
    H = H.at[jI, :, jI, :].add(Bjj)
    H = H.at[iI, :, jI, :].add(Bij)
    H = H.at[jI, :, iI, :].add(jnp.swapaxes(Bij, 1, 2))
    g = g.at[iI].add(-jnp.einsum("eap,eab,eb->ep", Jb_i, walk, rb * ev[:, None]))
    g = g.at[jI].add(-jnp.einsum("eap,eab,eb->ep", Jb_j, walk, rb * ev[:, None]))

    cost = jnp.sum(ev * jnp.einsum("ea,eab,eb->e", r9, info9, r9))
    cost += jnp.sum(ev * jnp.einsum("ea,eab,eb->e", rb, walk, rb))
    return H, g, cost


@partial(jax.jit, static_argnames=("iters1", "iters2"))
def vi_bundle_adjust(
    cam: cam_models.Camera,
    bf: jnp.ndarray,
    T_cb: lie.SE3,
    prob: VIBAProblem,
    iters1: int = 4,
    iters2: int = 8,
):
    """Two-phase robust VI-BA.  Returns (R_wb, p_wb, v_w, bias, xw, obs_inlier)."""
    K = prob.R_wb.shape[0]
    M = prob.xw.shape[0]

    def lm_step(R_wb, p_wb, v_w, bias, xw, inlier, lam):
        Hpp6, Hll, bp6, bl, Z, w_lm, vcost = _visual_blocks(
            cam, bf, T_cb, R_wb, p_wb, xw, prob, inlier
        )
        Hi, gi, icost = _inertial_blocks(prob, R_wb, p_wb, v_w, bias)
        # assemble big H: inertial dense + visual pose blocks into [0:6] slots
        H = Hi.at[jnp.arange(K), 0:6, jnp.arange(K), 0:6].add(Hpp6)
        g = gi.at[:, 0:6].add(bp6)

        # damping
        Hflat = H.reshape(K * S, K * S)
        diag = jnp.diag(Hflat)
        Hflat = Hflat + jnp.diag(lam * jnp.maximum(diag, 1e-3))
        # fixed states
        free = (~prob.state_fixed).astype(jnp.float32)
        mask = jnp.repeat(free, S)
        Hflat = Hflat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        gflat = g.reshape(-1) * mask

        # landmark elimination: Hll damped inverse
        Hll_d = Hll + (lam * jnp.maximum(jnp.diagonal(Hll, axis1=1, axis2=2), 1e-3))[
            :, :, None
        ] * jnp.eye(3)
        lm_seen = w_lm > 0
        Hll_d = jnp.where(lm_seen[:, None, None], Hll_d, jnp.eye(3))
        Vinv = jnp.linalg.inv(Hll_d)
        ZV = jnp.einsum("mkab,mbc->mkac", Z, Vinv)
        S_coup6 = jnp.einsum("mkac,mjbc->kajb", ZV, Z)  # (K,6,K,6)
        Scoup = jnp.zeros((K, S, K, S))
        Scoup = Scoup.at[:, 0:6, :, 0:6].set(S_coup6)
        Hflat = Hflat - (Scoup.reshape(K * S, K * S) * mask[:, None] * mask[None, :])
        b_corr6 = jnp.einsum("mkac,mc->ka", ZV, bl)
        gflat = gflat - (
            jnp.zeros((K, S)).at[:, 0:6].set(b_corr6).reshape(-1) * mask
        )

        dx = jnp.linalg.solve(Hflat + 1e-6 * jnp.eye(K * S), gflat).reshape(K, S)
        dx = dx * free[:, None]
        # landmark back-substitution
        dp6 = dx[:, 0:6]
        Wt_dp = jnp.einsum("mkab,ka->mb", Z, dp6)
        dl = jnp.einsum("mab,mb->ma", Vinv, bl - Wt_dp)
        dl = dl * (lm_seen & prob.lm_valid)[:, None]

        # apply
        R_new = jnp.einsum("kij,kjl->kil", R_wb, jax.vmap(lie.so3_exp)(dx[:, 0:3]))
        p_new = p_wb + jnp.einsum("kij,kj->ki", R_wb, dx[:, 3:6])
        v_new = v_w + dx[:, 6:9]
        b_new = bias + dx[:, 9:15]
        xw_new = xw + dl

        _, _, _, _, _, _, vcost_new = _visual_blocks(
            cam, bf, T_cb, R_new, p_new, xw_new, prob, inlier
        )
        _, _, icost_new = _inertial_blocks(prob, R_new, p_new, v_new, b_new)
        accept = (vcost_new + icost_new) < (vcost + icost)
        pick = lambda a, b: jnp.where(accept, a, b)
        return (
            pick(R_new, R_wb),
            pick(p_new, p_wb),
            pick(v_new, v_w),
            pick(b_new, bias),
            pick(xw_new, xw),
            jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6)),
        )

    def run_phase(state, inlier, n):
        def body(carry, _):
            R_wb, p_wb, v_w, bias, xw, lam = carry
            out = lm_step(R_wb, p_wb, v_w, bias, xw, inlier, lam)
            return out, None

        (R_wb, p_wb, v_w, bias, xw, _), _ = jax.lax.scan(
            body, state + (jnp.float32(1e-4),), None, length=n
        )
        return R_wb, p_wb, v_w, bias, xw

    def classify(R_wb, p_wb, xw):
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

    state = (prob.R_wb, prob.p_wb, prob.v_w, prob.bias, prob.xw)
    inlier = jnp.ones(prob.obs_uv.shape[0], dtype=bool)
    state = run_phase(state, inlier, iters1)
    inlier = classify(state[0], state[1], state[4])
    state = run_phase(state, inlier, iters2)
    inlier = classify(state[0], state[1], state[4])
    return (*state, inlier)
