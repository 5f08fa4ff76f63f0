"""IMU preintegration on-manifold (Forster et al.) as a JAX scan.

TPU-native replacement for the reference's ``IMU::Preintegrated``
(``/root/reference/src/ImuTypes.cc:187-247`` ``IntegrateNewMeasurement``,
``include/ImuTypes.h:164-273``).  State layout and semantics match the
reference so the inertial factors produce the same residuals:

  * delta state ``dR (3,3), dV (3,), dP (3,)`` integrated with the midpoint
    rule actually used by the reference (position updated with the *pre*
    update rotation/velocity),
  * 15x15 covariance ``C`` ordered [phi(3), v(3), p(3), bg(3), ba(3)] with
    the gyro/acc white noise propagated through the A/B system matrices and
    the random-walk noise accumulated on the bias block,
  * bias Jacobians ``JRg, JVg, JVa, JPg, JPa`` for first-order bias
    correction (``GetDeltaRotation/Velocity/Position``,
    ImuTypes.cc:249-293).

Instead of a mutable accumulator object fed one measurement at a time from a
mutex-guarded queue (Tracking.cc:1630-1733), the whole inter-frame batch is
integrated in one ``lax.scan`` — one device program per frame, no host loop.
Variable measurement counts are handled with a validity mask so shapes stay
static under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_fast_tpu.utils import lie

GRAVITY_VALUE = 9.81  # reference ImuTypes.h:42
GRAVITY = jnp.asarray([0.0, 0.0, -GRAVITY_VALUE], dtype=jnp.float32)


class ImuNoise(NamedTuple):
    """Continuous-time noise densities scaled to discrete (reference
    Settings::readIMU -> Calib ctor, ImuTypes.h:105-147: Cov = (sigma*freq^0.5)^2)."""

    gyro: jnp.ndarray  # scalar std of discrete gyro noise [rad/s]
    acc: jnp.ndarray
    gyro_walk: jnp.ndarray
    acc_walk: jnp.ndarray

    @staticmethod
    def from_continuous(noise_gyro, noise_acc, walk_gyro, walk_acc, freq) -> "ImuNoise":
        sf = float(freq) ** 0.5
        return ImuNoise(
            jnp.float32(noise_gyro * sf),
            jnp.float32(noise_acc * sf),
            jnp.float32(walk_gyro / sf),
            jnp.float32(walk_acc / sf),
        )


class Preintegrated(NamedTuple):
    dT: jnp.ndarray  # scalar
    dR: jnp.ndarray  # (3,3)
    dV: jnp.ndarray  # (3,)
    dP: jnp.ndarray  # (3,)
    C: jnp.ndarray  # (15,15) covariance [phi, v, p, bg, ba]
    JRg: jnp.ndarray  # (3,3) d dR / d bg
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    bias: jnp.ndarray  # (6,) [bg, ba] linearization point

    @staticmethod
    def identity(bias=None) -> "Preintegrated":
        b = jnp.zeros(6, dtype=jnp.float32) if bias is None else jnp.asarray(bias, jnp.float32)
        z33 = jnp.zeros((3, 3), dtype=jnp.float32)
        return Preintegrated(
            dT=jnp.float32(0.0),
            dR=jnp.eye(3, dtype=jnp.float32),
            dV=jnp.zeros(3, dtype=jnp.float32),
            dP=jnp.zeros(3, dtype=jnp.float32),
            C=jnp.zeros((15, 15), dtype=jnp.float32),
            JRg=z33,
            JVg=z33,
            JVa=z33,
            JPg=z33,
            JPa=z33,
            bias=b,
        )


def integrate_step(
    p: Preintegrated, acc: jnp.ndarray, gyro: jnp.ndarray, dt: jnp.ndarray, noise: ImuNoise
) -> Preintegrated:
    """One measurement update (reference IntegrateNewMeasurement, ImuTypes.cc:187-247)."""
    bg, ba = p.bias[:3], p.bias[3:]
    a = acc - ba
    w = gyro - bg
    dt2 = dt * dt

    Wa = lie.hat(a)
    dRa = p.dR @ Wa  # dR * hat(a), used in A blocks and bias Jacobians

    # --- position & velocity updates use the *old* dR, dV (midpoint as in ref)
    dP_new = p.dP + p.dV * dt + 0.5 * (p.dR @ a) * dt2
    dV_new = p.dV + (p.dR @ a) * dt

    # --- covariance propagation (A,B as in ImuTypes.cc:210-231)
    # state order [phi, v, p]; noise order [eta_g, eta_a]
    dRi = lie.so3_exp(w * dt)
    Jr = lie.so3_right_jacobian(w * dt)
    A = jnp.zeros((9, 9), dtype=jnp.float32)
    A = A.at[0:3, 0:3].set(dRi.T)
    A = A.at[3:6, 0:3].set(-dRa * dt)
    A = A.at[6:9, 0:3].set(-0.5 * dRa * dt2)
    A = A.at[3:6, 3:6].set(jnp.eye(3))
    A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
    A = A.at[6:9, 6:9].set(jnp.eye(3))
    B = jnp.zeros((9, 6), dtype=jnp.float32)
    B = B.at[0:3, 0:3].set(Jr * dt)
    B = B.at[3:6, 3:6].set(p.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * p.dR * dt2)
    Nga = jnp.diag(
        jnp.concatenate(
            [jnp.full((3,), noise.gyro**2), jnp.full((3,), noise.acc**2)]
        )
    )
    C_rvp = A @ p.C[:9, :9] @ A.T + B @ Nga @ B.T
    # bias random walk accumulates on the bias block
    NgaWalk = jnp.diag(
        jnp.concatenate(
            [jnp.full((3,), noise.gyro_walk**2), jnp.full((3,), noise.acc_walk**2)]
        )
    )
    # cross term phi/v/p x bias propagates through A as well (ref keeps
    # C.block<9,6> updated via A * C; it is zero until biases couple — ref
    # updates only the 9x9 and adds walk to the 6x6; we mirror that).
    C_cross = A @ p.C[:9, 9:15]
    C_new = (
        p.C.at[:9, :9]
        .set(C_rvp)
        .at[:9, 9:15]
        .set(C_cross)
        .at[9:15, :9]
        .set(C_cross.T)
        .at[9:15, 9:15]
        .set(p.C[9:15, 9:15] + NgaWalk * dt)
    )

    # --- bias jacobians (update P before V before R, with old values; ref order)
    JPa_new = p.JPa + p.JVa * dt - 0.5 * p.dR * dt2
    JPg_new = p.JPg + p.JVg * dt - 0.5 * dRa @ p.JRg * dt2
    JVa_new = p.JVa - p.dR * dt
    JVg_new = p.JVg - dRa @ p.JRg * dt
    JRg_new = dRi.T @ p.JRg - Jr * dt

    # --- rotation update last
    dR_new = lie.normalize_rotation(p.dR @ dRi)

    return Preintegrated(
        dT=p.dT + dt,
        dR=dR_new,
        dV=dV_new,
        dP=dP_new,
        C=C_new,
        JRg=JRg_new,
        JVg=JVg_new,
        JVa=JVa_new,
        JPg=JPg_new,
        JPa=JPa_new,
        bias=p.bias,
    )


def preintegrate(
    acc: jnp.ndarray,
    gyro: jnp.ndarray,
    dt: jnp.ndarray,
    bias: jnp.ndarray,
    noise: ImuNoise,
    valid: jnp.ndarray | None = None,
) -> Preintegrated:
    """Integrate a batch of measurements with one ``lax.scan``.

    Args:
      acc, gyro: (N,3) measurements.
      dt: (N,) per-measurement integration intervals.
      bias: (6,) [bg, ba] linearization bias.
      valid: optional (N,) bool mask — padded slots are skipped (dt forced
        to 0), keeping shapes static across frames with varying IMU counts.
    """
    if valid is not None:
        dt = jnp.where(valid, dt, 0.0)

    def step(p, x):
        a, w, d = x
        # dt == 0 slots are exact no-ops (A,B scale with dt; dRi = I)
        return integrate_step(p, a, w, d, noise), None

    init = Preintegrated.identity(bias)
    out, _ = jax.lax.scan(step, init, (acc, gyro, dt))
    return out


def delta_rotation(p: Preintegrated, bias: jnp.ndarray) -> jnp.ndarray:
    """Bias-corrected dR (reference GetDeltaRotation, ImuTypes.cc:249-258).

    No SVD renormalization here (the reference calls NormalizeRotation): the
    product of two exact rotations is orthonormal to f32 rounding, and this
    function sits inside differentiated factors — the SVD derivative is
    undefined at the identical singular values of a rotation and poisons
    every inertial Jacobian with NaNs."""
    dbg = bias[:3] - p.bias[:3]
    return p.dR @ lie.so3_exp(p.JRg @ dbg)


def delta_velocity(p: Preintegrated, bias: jnp.ndarray) -> jnp.ndarray:
    dbg = bias[:3] - p.bias[:3]
    dba = bias[3:] - p.bias[3:]
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, bias: jnp.ndarray) -> jnp.ndarray:
    dbg = bias[:3] - p.bias[:3]
    dba = bias[3:] - p.bias[3:]
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(
    Rwb: jnp.ndarray,
    pwb: jnp.ndarray,
    vwb: jnp.ndarray,
    p: Preintegrated,
    bias: jnp.ndarray,
):
    """IMU state prediction (reference Tracking::PredictStateIMU, Tracking.cc:1734-1792).

    Returns (Rwb2, pwb2, vwb2) at the end of the preintegration window.
    """
    t = p.dT
    dR = delta_rotation(p, bias)
    dV = delta_velocity(p, bias)
    dP = delta_position(p, bias)
    Rwb2 = lie.normalize_rotation(Rwb @ dR)
    vwb2 = vwb + GRAVITY * t + Rwb @ dV
    pwb2 = pwb + vwb * t + 0.5 * GRAVITY * t * t + Rwb @ dP
    return Rwb2, pwb2, vwb2


def merge(prev: Preintegrated, acc, gyro, dt, noise: ImuNoise, valid=None) -> Preintegrated:
    """Continue integration of an existing window with more measurements
    (reference MergePrevious/Reintegrate use-case, ImuTypes.cc:249)."""
    if valid is not None:
        dt = jnp.where(valid, dt, 0.0)

    def step(p, x):
        a, w, d = x
        return integrate_step(p, a, w, d, noise), None

    out, _ = jax.lax.scan(step, prev, (acc, gyro, dt))
    return out


def compose(p1: Preintegrated, p2: Preintegrated) -> Preintegrated:
    """Compose two CONSECUTIVE preintegrated windows (same linearization
    bias) into one without the raw measurements.

    Standard on-manifold composition (Forster et al. eq. 29-31 applied
    blockwise); the reference instead re-integrates stored raw measurements
    (ImuTypes.cc Reintegrate/MergePrevious) — state-level composition is the
    array-native equivalent and is what lets (a) the IMU initializer build
    LONG edges between widely-spaced keyframes (short 0.1 s edges make the
    visual-pose noise dominate the mm-level IMU information and open a
    spurious scale->0 minimum) and (b) keyframe culling merge the inertial
    chain across a removed keyframe."""
    dR1, dR2 = p1.dR, p2.dR
    dT2 = p2.dT
    dV2, dP2 = p2.dV, p2.dP
    dR = lie.normalize_rotation(dR1 @ dR2)
    dV = p1.dV + dR1 @ dV2
    dP = p1.dP + p1.dV * dT2 + dR1 @ dP2
    # bias Jacobians
    JRg = dR2.T @ p1.JRg + p2.JRg
    JVg = p1.JVg + dR1 @ p2.JVg - dR1 @ lie.hat(dV2) @ p1.JRg
    JVa = p1.JVa + dR1 @ p2.JVa
    JPg = p1.JPg + p1.JVg * dT2 + dR1 @ p2.JPg - dR1 @ lie.hat(dP2) @ p1.JRg
    JPa = p1.JPa + p1.JVa * dT2 + dR1 @ p2.JPa
    # covariance: delta-error propagation [phi, v, p]
    Z = jnp.zeros((3, 3), dtype=jnp.float32)
    I = jnp.eye(3, dtype=jnp.float32)
    F1 = jnp.block([
        [dR2.T, Z, Z],
        [-dR1 @ lie.hat(dV2), I, Z],
        [-dR1 @ lie.hat(dP2), I * dT2, I],
    ])
    G = jnp.block([[I, Z, Z], [Z, dR1, Z], [Z, Z, dR1]])
    C9 = F1 @ p1.C[:9, :9] @ F1.T + G @ p2.C[:9, :9] @ G.T
    C = (
        jnp.zeros((15, 15), dtype=jnp.float32)
        .at[:9, :9]
        .set(C9)
        .at[9:15, 9:15]
        .set(p1.C[9:15, 9:15] + p2.C[9:15, 9:15])
    )
    return Preintegrated(
        dT=p1.dT + dT2, dR=dR, dV=dV, dP=dP, C=C,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, bias=p1.bias,
    )


# Jitted entry points: the tracker calls these once per frame with a
# fixed-size measurement bucket, so each compiles exactly once.  (Calling
# the raw functions re-traces the whole scan per call — measured to blow up
# XLA CPU compile memory over long sequences.)
preintegrate_jit = jax.jit(preintegrate)
merge_jit = jax.jit(merge)
compose_jit = jax.jit(compose)
