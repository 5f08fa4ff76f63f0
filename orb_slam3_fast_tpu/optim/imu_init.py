"""IMU initialization: inertial-only optimization of gravity direction,
scale, velocities, and biases over a keyframe chain.

TPU-native replacement for ``Optimizer::InertialOptimization`` (three
overloads, ``/root/reference/src/Optimizer.cc:3108-3995``) built on the
``EdgeInertialGS`` factor (G2oTypes.cc:618-656): keyframe poses stay FIXED
at their visual-SLAM estimates; the optimizer recovers
  * gravity direction ``Rwg`` (2-DoF tangent about x/y, VertexGDir),
  * a global scale ``s`` (log-parametrized, VertexScale),
  * per-keyframe world velocities,
  * one shared gyro/acc bias with a prior (EdgePriorGyro/Acc).

The whole problem is a few hundred parameters, solved as one dense
AD-Jacobian LM — no g2o graph assembly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.imu import preintegration as pre
from orb_slam3_fast_tpu.optim.inertial import inertial_information
from orb_slam3_fast_tpu.utils import lie

GI = jnp.asarray([0.0, 0.0, -pre.GRAVITY_VALUE])


class InertialInit(NamedTuple):
    Rwg: jnp.ndarray  # (3,3) gravity direction (g_world = Rwg @ gI)
    scale: jnp.ndarray  # ()
    vel: jnp.ndarray  # (K,3)
    bias: jnp.ndarray  # (6,) shared [bg, ba]


def _gs_residual(R_i, p_i, R_j, p_j, v_i, v_j, bias, Rwg, log_s, preint, scale_known):
    """EdgeInertialGS (G2oTypes.cc:618-656): scaled-position/velocity inertial
    residual with estimated gravity direction + scale."""
    s = jnp.where(scale_known, 1.0, jnp.exp(log_s))
    g = Rwg @ GI
    dt = preint.dT
    dR = pre.delta_rotation(preint, bias)
    dV = pre.delta_velocity(preint, bias)
    dP = pre.delta_position(preint, bias)
    er = lie.so3_log(dR.T @ R_i.T @ R_j)
    ev = R_i.T @ (s * (v_j - v_i) - g * dt) - dV
    ep = R_i.T @ (s * (p_j - p_i - v_i * dt) - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def inertial_only_optimization(
    R_wb: jnp.ndarray,  # (K,3,3) body rotations from visual SLAM (fixed)
    p_wb: jnp.ndarray,  # (K,3) body positions (fixed, up to scale)
    preints: pre.Preintegrated,  # stacked (K-1) windows between consecutive KFs
    prior_gyro: float = 1e2,  # InitializeIMU priorG (LocalMapping.cc:1244)
    prior_acc: float = 1e6,  # priorA
    iters: int = 40,
    fix_scale: bool = False,
    edge_valid: jnp.ndarray | None = None,  # (K-1,) bool; False = padding edge
) -> InertialInit:
    """Callers may PAD the chain to a fixed K (repeating the last state and
    preint) and mask the padding with ``edge_valid`` — keeps the jit cache at
    one program per bucket instead of one per chain length (varying-shape
    recompiles were crashing XLA CPU in long VI sessions)."""
    K = R_wb.shape[0]
    n_e = K - 1
    infos = jax.vmap(inertial_information)(
        jax.tree.map(lambda a: a, preints)
    )  # (K-1,9,9)
    if edge_valid is not None:
        infos = infos * edge_valid[:, None, None].astype(infos.dtype)

    # parameter vector: [theta_g(2), log_s(1), bias(6), vel(K*3)]
    def unpack(x):
        theta = jnp.concatenate([x[0:2], jnp.zeros(1)])
        Rwg = lie.so3_exp(theta)
        log_s = x[2]
        bias = x[3:9]
        vel = x[9:].reshape(K, 3)
        return Rwg, log_s, bias, vel

    scale_known = jnp.asarray(fix_scale)

    def residuals(x):
        Rwg, log_s, bias, vel = unpack(x)
        def edge(i):
            return _gs_residual(
                R_wb[i], p_wb[i], R_wb[i + 1], p_wb[i + 1],
                vel[i], vel[i + 1], bias, Rwg, log_s,
                jax.tree.map(lambda a: a[i], preints), scale_known,
            )
        r = jax.vmap(edge)(jnp.arange(n_e))  # (K-1,9)
        return r, bias

    def cost_fn(x):
        r, bias = residuals(x)
        c = jnp.sum(jnp.einsum("ei,eij,ej->e", r, infos, r))
        c += prior_gyro * jnp.sum(bias[:3] ** 2) + prior_acc * jnp.sum(bias[3:] ** 2)
        return c

    # Informed start (LocalMapping::InitializeIMU, LocalMapping.cc:1197-1221):
    # starting from zeros has a strong local minimum at scale->0 where the
    # gravity direction alone explains the preintegrated dV (measured: the
    # solver returned s=1e-4 on every init attempt).  The reference seeds the
    # gravity direction from the rotated preintegrated velocity deltas and
    # velocities from keyframe position differences.
    ev_mask = (
        edge_valid.astype(jnp.float32)
        if edge_valid is not None
        else jnp.ones(n_e, dtype=jnp.float32)
    )
    dV = jax.vmap(lambda i: pre.delta_velocity(jax.tree.map(lambda a: a[i], preints), jnp.zeros(6)))(
        jnp.arange(n_e)
    )
    dirG = -jnp.sum(jnp.einsum("eij,ej->ei", R_wb[:-1], dV) * ev_mask[:, None], axis=0)
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI_hat = jnp.asarray([0.0, 0.0, -1.0])
    axis = jnp.cross(gI_hat, dirG)
    s_norm = jnp.linalg.norm(axis)
    ang = jnp.arctan2(s_norm, jnp.dot(gI_hat, dirG))
    theta0 = jnp.where(s_norm > 1e-6, axis / jnp.maximum(s_norm, 1e-9) * ang, jnp.zeros(3))
    # velocities from scaled position differences (dT from the preintegration)
    dts = preints.dT
    v_fd = (p_wb[1:] - p_wb[:-1]) / jnp.maximum(dts[:, None], 1e-6)
    v0 = jnp.concatenate([v_fd, v_fd[-1:]], axis=0)
    x0 = jnp.concatenate([theta0[:2], jnp.zeros(1), jnp.zeros(6), v0.reshape(-1)])

    def lm_iter(carry, _):
        x, lam = carry
        r, bias = residuals(x)
        J = jax.jacfwd(lambda xx: residuals(xx)[0])(x)  # (K-1,9,P)
        H = jnp.einsum("eip,eij,ejq->pq", J, infos, J)
        g = -jnp.einsum("eip,eij,ej->p", J, infos, r)
        # bias priors
        P = x.shape[0]
        prior_diag = jnp.zeros(P).at[3:6].set(prior_gyro).at[6:9].set(prior_acc)
        H = H + jnp.diag(2.0 * prior_diag)
        g = g - 2.0 * prior_diag * x
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6)) + 1e-9 * jnp.eye(P)
        dx = jnp.linalg.solve(Hd, g)
        accept = cost_fn(x + dx) < cost_fn(x)
        x = jnp.where(accept, x + dx, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        return (x, lam), None

    (x, _), _ = jax.lax.scan(lm_iter, (x0, jnp.float32(1e-3)), None, length=iters)
    Rwg, log_s, bias, vel = unpack(x)
    return InertialInit(
        Rwg=Rwg,
        scale=jnp.where(scale_known, 1.0, jnp.exp(log_s)),
        vel=vel,
        bias=bias,
    )


@partial(jax.jit, static_argnames=("iters",))
def scale_gravity_refinement(
    R_wb: jnp.ndarray,  # (K,3,3) body rotations (fixed)
    p_wb: jnp.ndarray,  # (K,3) body positions (fixed)
    vel: jnp.ndarray,  # (K,3) velocities (fixed)
    bias: jnp.ndarray,  # (6,) current bias (fixed)
    preints: pre.Preintegrated,  # (K-1) stacked edges
    edge_valid: jnp.ndarray | None = None,
    iters: int = 20,
):
    """ScaleRefinement (LocalMapping.cc:1420 -> the InertialOptimization
    overload optimizing ONLY gravity direction + scale, Optimizer.cc:3452):
    everything else frozen; run periodically after IMU init to polish the
    metric scale as the map grows.  Returns (Rwg, scale)."""
    K = R_wb.shape[0]
    n_e = K - 1
    infos = jax.vmap(inertial_information)(preints)
    if edge_valid is not None:
        infos = infos * edge_valid[:, None, None].astype(infos.dtype)

    def residuals(x):
        theta = jnp.concatenate([x[0:2], jnp.zeros(1)])
        Rwg = lie.so3_exp(theta)
        log_s = x[2]

        def edge(i):
            return _gs_residual(
                R_wb[i], p_wb[i], R_wb[i + 1], p_wb[i + 1],
                vel[i], vel[i + 1], bias, Rwg, log_s,
                jax.tree.map(lambda a: a[i], preints), jnp.asarray(False),
            )

        return jax.vmap(edge)(jnp.arange(n_e))

    def lm_iter(carry, _):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = jnp.einsum("eip,eij,ejq->pq", J, infos, J)
        g = -jnp.einsum("eip,eij,ej->p", J, infos, r)
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6)) + 1e-9 * jnp.eye(3)
        dx = jnp.linalg.solve(Hd, g)

        def cost(xx):
            rr = residuals(xx)
            return jnp.sum(jnp.einsum("ei,eij,ej->e", rr, infos, rr))

        accept = cost(x + dx) < cost(x)
        x = jnp.where(accept, x + dx, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        return (x, lam), None

    (x, _), _ = jax.lax.scan(lm_iter, (jnp.zeros(3), jnp.float32(1e-3)), None, length=iters)
    theta = jnp.concatenate([x[0:2], jnp.zeros(1)])
    return lie.so3_exp(theta), jnp.exp(x[2])


def gravity_alignment_transform(init: InertialInit):
    """World-frame correction applied after init (LocalMapping.cc:1310-1340 +
    Map::ApplyScaledRotation): rotate the world so gravity is -z and apply
    the recovered scale.  Returns (R_gw, s): x_new = s * R_gw @ x_old."""
    return init.Rwg.T, init.scale
