"""Inertial factors and visual-inertial frame optimization.

TPU-native replacement for the reference's custom g2o inertial machinery:
``EdgeInertial`` (9-D residual vs bias-corrected preintegrated deltas,
``/root/reference/src/G2oTypes.cc:497-616``), the bias random-walk edges
(``EdgeGyroRW/EdgeAccRW``, G2oTypes.h:597-696), and the sliding-window-of-2
visual-inertial trackers ``PoseInertialOptimizationLastKeyFrame/LastFrame``
(``/root/reference/src/Optimizer.cc:4544-5357``).

States follow the reference convention: body pose (R_wb, p_wb), world-frame
velocity v_w, biases [bg, ba].  Updates are right-multiplicative on R_wb and
body-frame on p (VertexPose::oplusImpl semantics).  Jacobians come from AD
(jacfwd of the residual stack w.r.t. the 15-D tangent) — identical values to
the reference's hand-derived ``linearizeOplus``, zero hand-derivation bugs.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.cameras import models as cam_models
from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO, _huber_weight
from orb_slam3_fast_tpu.utils import lie

GRAVITY = pre.GRAVITY


class BodyState(NamedTuple):
    """IMU body state: R_wb (3,3), p_wb (3,), v_w (3,), bias (6,) [bg, ba]."""

    R: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    bias: jnp.ndarray


def retract(s: BodyState, d: jnp.ndarray) -> BodyState:
    """Apply a 15-D tangent update [dtheta(3), dp(3), dv(3), dbg(3), dba(3)].

    Matches VertexPose/VertexVelocity/Vertex*Bias oplus (G2oTypes.h:78-240):
    R <- R Exp(dtheta), p <- p + R dp (body-frame translation update)."""
    return BodyState(
        R=s.R @ lie.so3_exp(d[0:3]),
        p=s.p + s.R @ d[3:6],
        v=s.v + d[6:9],
        bias=s.bias + d[9:15],
    )


def inertial_residual(
    si: BodyState, sj: BodyState, p: pre.Preintegrated
) -> jnp.ndarray:
    """9-D residual [er, ev, ep] of EdgeInertial (G2oTypes.cc:497-527)."""
    dt = p.dT
    dR = pre.delta_rotation(p, si.bias)
    dV = pre.delta_velocity(p, si.bias)
    dP = pre.delta_position(p, si.bias)
    er = lie.so3_log(dR.T @ si.R.T @ sj.R)
    ev = si.R.T @ (sj.v - si.v - GRAVITY * dt) - dV
    ep = si.R.T @ (sj.p - si.p - si.v * dt - 0.5 * GRAVITY * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


def inertial_information(p: pre.Preintegrated) -> jnp.ndarray:
    """(9,9) information = inverse of the preintegration covariance rvp block
    (EdgeInertial ctor, G2oTypes.cc:463-486), symmetrized and regularized."""
    C = p.C[:9, :9]
    C = 0.5 * (C + C.T) + 1e-9 * jnp.eye(9)
    return jnp.linalg.inv(C)


def bias_walk_residual(si: BodyState, sj: BodyState) -> jnp.ndarray:
    """6-D random-walk residual [dbg, dba] (EdgeGyroRW/EdgeAccRW)."""
    return sj.bias - si.bias


class VIObs(NamedTuple):
    """Visual observations for one frame in body-state form."""

    xw: jnp.ndarray  # (N,3)
    uv: jnp.ndarray  # (N,3) [u,v,ur] (ur=-1 mono)
    inv_sigma2: jnp.ndarray
    is_stereo: jnp.ndarray
    valid: jnp.ndarray


def _visual_residuals(cam, bf, T_cb: lie.SE3, s: BodyState, obs: VIObs):
    """Reprojection residuals with the body-state parametrization.

    T_cb: body->camera extrinsic (reference Calib.Tcb).  T_cw = T_cb * T_bw.
    """
    R_bw = s.R.T
    t_bw = -R_bw @ s.p
    R_cw = T_cb.R @ R_bw
    t_cw = T_cb.R @ t_bw + T_cb.t
    xc = obs.xw @ R_cw.T + t_cw
    uvr = cam_models.stereo_project(cam, xc, bf)
    r = obs.uv - uvr
    r = r.at[:, 2].set(jnp.where(obs.is_stereo, r[:, 2], 0.0))
    return r, xc[:, 2] > 0.05


class PriorState(NamedTuple):
    """15-D marginalization prior on the previous frame (ConstraintPoseImu,
    G2oTypes.h:698-781)."""

    state: BodyState
    H: jnp.ndarray  # (15,15) information


def prior_residual(s: BodyState, prior: PriorState) -> jnp.ndarray:
    er = lie.so3_log(prior.state.R.T @ s.R)
    ep = s.p - prior.state.p
    ev = s.v - prior.state.v
    eb = s.bias - prior.state.bias
    return jnp.concatenate([er, ep, ev, eb])


@partial(jax.jit, static_argnames=("n_rounds", "iters"))
def pose_inertial_optimization(
    cam: cam_models.Camera,
    bf: jnp.ndarray,
    T_cb: lie.SE3,
    s_prev: BodyState,
    preint: pre.Preintegrated,
    s0: BodyState,
    obs: VIObs,
    prior: PriorState | None = None,
    n_rounds: int = 4,
    iters: int = 10,
):
    """Optimize the current frame's 15-D body state given the (fixed)
    previous state, the preintegrated IMU factor, and visual observations
    (reference PoseInertialOptimizationLastKeyFrame/LastFrame,
    Optimizer.cc:4544-5357, incl. the 4-round chi2 reclassification).

    Returns (state, visual_inlier_mask, n_inliers, H) where H is the 15x15
    information of the solved state (all edges at the solution) — the
    marginalization prior carried to the next frame as ``ConstraintPoseImu``
    (reference recovers it from the solved edges, Optimizer.cc:5296-5356).
    """
    info9 = inertial_information(preint)
    # bias walk info from the walk covariance accumulated over the window
    walk_info = jnp.linalg.inv(preint.C[9:15, 9:15] + 1e-8 * jnp.eye(6))

    def residual_stack(d, s, inlier):
        sd = retract(s, d)
        rv, posd = _visual_residuals(cam, bf, T_cb, sd, obs)
        delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        chi2 = jnp.sum(rv * rv, axis=-1) * obs.inv_sigma2
        w_h = _huber_weight(chi2, delta2)
        w = jnp.where(obs.valid & inlier & posd, w_h * obs.inv_sigma2, 0.0)
        ri = inertial_residual(s_prev, sd, preint)
        rb = bias_walk_residual(s_prev, sd)
        return rv, w, ri, rb, sd

    def gn_cost(rv, w, ri, rb, sd):
        c = jnp.sum(w * jnp.sum(rv * rv, axis=-1))
        c += ri @ info9 @ ri
        c += rb @ walk_info @ rb
        if prior is not None:
            rp = prior_residual(sd, prior)
            c += rp @ prior.H @ rp
        return c

    def lm_iter(carry, _):
        s, lam, inlier = carry

        def r_flat(d):
            rv, w, ri, rb, sd = residual_stack(d, s, inlier)
            return rv, w, ri, rb, sd

        zero = jnp.zeros(15)
        rv, w, ri, rb, _ = r_flat(zero)
        Jv = jax.jacfwd(lambda d: r_flat(d)[0])(zero)  # (N,3,15)
        Ji = jax.jacfwd(lambda d: r_flat(d)[2])(zero)  # (9,15)
        Jb = jax.jacfwd(lambda d: r_flat(d)[3])(zero)  # (6,15)
        H = jnp.einsum("nij,n,nik->jk", Jv, w, Jv)
        g = -jnp.einsum("nij,n,ni->j", Jv, w, rv)
        H = H + Ji.T @ info9 @ Ji
        g = g - Ji.T @ info9 @ ri
        H = H + Jb.T @ walk_info @ Jb
        g = g - Jb.T @ walk_info @ rb
        if prior is not None:
            Jp = jax.jacfwd(lambda d: prior_residual(retract(s, d), prior))(zero)
            rp = prior_residual(s, prior)
            H = H + Jp.T @ prior.H @ Jp
            g = g - Jp.T @ prior.H @ rp
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6)) + 1e-8 * jnp.eye(15)
        d = jnp.linalg.solve(Hd, g)
        rv0, w0, ri0, rb0, sd0 = residual_stack(jnp.zeros(15), s, inlier)
        cost0 = gn_cost(rv0, w0, ri0, rb0, sd0)
        rv1, w1, ri1, rb1, sd1 = residual_stack(d, s, inlier)
        cost1 = gn_cost(rv1, w1, ri1, rb1, sd1)
        accept = cost1 < cost0
        s = jax.tree.map(lambda a, b: jnp.where(accept, a, b), sd1, s)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e5))
        return (s, lam, inlier), None

    inlier_ref = jnp.ones(obs.uv.shape[0], dtype=bool)
    s = s0
    for _ in range(n_rounds):
        (s, _, _), _ = jax.lax.scan(
            lm_iter, (s, jnp.float32(1e-2), inlier_ref), None, length=iters
        )
        rv, posd = _visual_residuals(cam, bf, T_cb, s, obs)
        chi2 = jnp.sum(rv * rv, axis=-1) * obs.inv_sigma2
        delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier_ref = obs.valid & (chi2 <= delta2) & posd

    # information of the solved state: Gauss-Newton Hessian of every edge at
    # the solution (the next frame's EdgePriorPoseImu, G2oTypes.h:698-781)
    # — the KF-anchored variant treats the keyframe as fixed, so the
    # current-frame Hessian IS the marginal
    zero = jnp.zeros(15)
    _, w_f, _, _, _ = residual_stack(zero, s, inlier_ref)
    Jv = jax.jacfwd(lambda d: residual_stack(d, s, inlier_ref)[0])(zero)
    Ji = jax.jacfwd(lambda d: residual_stack(d, s, inlier_ref)[2])(zero)
    Jb = jax.jacfwd(lambda d: residual_stack(d, s, inlier_ref)[3])(zero)
    H = jnp.einsum("nij,n,nik->jk", Jv, w_f, Jv)
    H = H + Ji.T @ info9 @ Ji + Jb.T @ walk_info @ Jb
    if prior is not None:
        Jp = jax.jacfwd(lambda d: prior_residual(retract(s, d), prior))(zero)
        H = H + Jp.T @ prior.H @ Jp
    H = 0.5 * (H + H.T)
    return s, inlier_ref, jnp.sum(inlier_ref.astype(jnp.int32)), H


@partial(jax.jit, static_argnames=("n_rounds", "iters"))
def pose_inertial_optimization_last_frame(
    cam: cam_models.Camera,
    bf: jnp.ndarray,
    T_cb: lie.SE3,
    s_prev: BodyState,
    prior_prev: PriorState,
    preint: pre.Preintegrated,
    s0: BodyState,
    obs: VIObs,
    n_rounds: int = 4,
    iters: int = 10,
):
    """PoseInertialOptimizationLastFrame (Optimizer.cc:4933-5357): the
    previous FRAME's 15-D state is free under its marginalization prior
    (EdgePriorPoseImu / ConstraintPoseImu), the current frame carries the
    visual edges, and the two are chained by the preintegrated inertial
    factor — a sliding window of two.  After the solve the previous state is
    Schur-marginalized out of the 30x30 Hessian; the 15x15 remainder is the
    prior for the NEXT frame (reference Marginalize, Optimizer.cc:3026-3106).

    Returns (state_cur, inlier_mask, n_inliers, H_marg).
    """
    info9 = inertial_information(preint)
    walk_info = jnp.linalg.inv(preint.C[9:15, 9:15] + 1e-8 * jnp.eye(6))

    def unpack(d, sp, sc):
        return retract(sp, d[:15]), retract(sc, d[15:30])

    def residual_stack(d, sp, sc, inlier):
        spd, scd = unpack(d, sp, sc)
        rv, posd = _visual_residuals(cam, bf, T_cb, scd, obs)
        delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        chi2 = jnp.sum(rv * rv, axis=-1) * obs.inv_sigma2
        w_h = _huber_weight(chi2, delta2)
        w = jnp.where(obs.valid & inlier & posd, w_h * obs.inv_sigma2, 0.0)
        ri = inertial_residual(spd, scd, preint)
        rb = bias_walk_residual(spd, scd)
        rp = prior_residual(spd, prior_prev)
        return rv, w, ri, rb, rp, spd, scd

    def cost_of(rv, w, ri, rb, rp):
        return (
            jnp.sum(w * jnp.sum(rv * rv, axis=-1))
            + ri @ info9 @ ri
            + rb @ walk_info @ rb
            + rp @ prior_prev.H @ rp
        )

    def build_H_g(sp, sc, inlier):
        zero = jnp.zeros(30)
        rv, w, ri, rb, rp, _, _ = residual_stack(zero, sp, sc, inlier)
        Jv = jax.jacfwd(lambda d: residual_stack(d, sp, sc, inlier)[0])(zero)
        Ji = jax.jacfwd(lambda d: residual_stack(d, sp, sc, inlier)[2])(zero)
        Jb = jax.jacfwd(lambda d: residual_stack(d, sp, sc, inlier)[3])(zero)
        Jp = jax.jacfwd(lambda d: residual_stack(d, sp, sc, inlier)[4])(zero)
        H = jnp.einsum("nij,n,nik->jk", Jv, w, Jv)
        g = -jnp.einsum("nij,n,ni->j", Jv, w, rv)
        H = H + Ji.T @ info9 @ Ji
        g = g - Ji.T @ info9 @ ri
        H = H + Jb.T @ walk_info @ Jb
        g = g - Jb.T @ walk_info @ rb
        H = H + Jp.T @ prior_prev.H @ Jp
        g = g - Jp.T @ prior_prev.H @ rp
        return H, g

    def lm_iter(carry, _):
        sp, sc, lam, inlier = carry
        H, g = build_H_g(sp, sc, inlier)
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6)) + 1e-8 * jnp.eye(30)
        d = jnp.linalg.solve(Hd, g)
        rv0, w0, ri0, rb0, rp0, _, _ = residual_stack(jnp.zeros(30), sp, sc, inlier)
        c0 = cost_of(rv0, w0, ri0, rb0, rp0)
        rv1, w1, ri1, rb1, rp1, sp1, sc1 = residual_stack(d, sp, sc, inlier)
        c1 = cost_of(rv1, w1, ri1, rb1, rp1)
        accept = c1 < c0
        sp = jax.tree.map(lambda a, b: jnp.where(accept, a, b), sp1, sp)
        sc = jax.tree.map(lambda a, b: jnp.where(accept, a, b), sc1, sc)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 5.0, 1e5))
        return (sp, sc, lam, inlier), None

    inlier_ref = jnp.ones(obs.uv.shape[0], dtype=bool)
    sp, sc = s_prev, s0
    for _ in range(n_rounds):
        (sp, sc, _, _), _ = jax.lax.scan(
            lm_iter, (sp, sc, jnp.float32(1e-2), inlier_ref), None, length=iters
        )
        rv, posd = _visual_residuals(cam, bf, T_cb, sc, obs)
        chi2 = jnp.sum(rv * rv, axis=-1) * obs.inv_sigma2
        delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier_ref = obs.valid & (chi2 <= delta2) & posd

    # marginalize the previous state out of the solved 30x30 Hessian
    H, _ = build_H_g(sp, sc, inlier_ref)
    H = 0.5 * (H + H.T)
    H11 = H[:15, :15] + 1e-6 * jnp.eye(15)
    H12 = H[:15, 15:]
    H22 = H[15:, 15:]
    H_marg = H22 - H12.T @ jnp.linalg.solve(H11, H12)
    H_marg = 0.5 * (H_marg + H_marg.T)
    return sc, inlier_ref, jnp.sum(inlier_ref.astype(jnp.int32)), H_marg
