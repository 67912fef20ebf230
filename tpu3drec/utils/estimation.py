"""State estimation + control primitives: Kalman filter and PID.

Capability-parity with the flight-autonomy math inside the reference's
AirSim client (SURVEY.md C1): barometer+Kalman altitude fusion
(`ref/airsim/main.cpp:214-220,1317-1354`) and PID position/height/yaw
control (`main.cpp:1463-1468`). Implemented as pure-JAX scans so whole
telemetry logs filter in one device dispatch (the reference filters one
tick per control-loop iteration).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KalmanParams(NamedTuple):
    F: jnp.ndarray  # (n, n) state transition
    H: jnp.ndarray  # (m, n) observation
    Q: jnp.ndarray  # (n, n) process noise
    R: jnp.ndarray  # (m, m) observation noise


def kalman_filter(
    params: KalmanParams,
    x0: jnp.ndarray,       # (n,)
    P0: jnp.ndarray,       # (n, n)
    measurements: jnp.ndarray,  # (T, m)
):
    """Batch Kalman filtering over a measurement sequence via lax.scan.
    Returns (states (T, n), covariances (T, n, n))."""
    F, H, Q, R = params

    def step(carry, z):
        x, P = carry
        # predict
        x = F @ x
        P = F @ P @ F.T + Q
        # update
        S = H @ P @ H.T + R
        K = P @ H.T @ jnp.linalg.inv(S)
        x = x + K @ (z - H @ x)
        P = (jnp.eye(P.shape[0], dtype=P.dtype) - K @ H) @ P
        return (x, P), (x, P)

    (_, _), (xs, Ps) = jax.lax.scan(step, (x0, P0), measurements)
    return xs, Ps


def altitude_kalman(dt: float = 0.02, q: float = 0.05, r: float = 1.0) -> KalmanParams:
    """Constant-velocity altitude model, the reference's barometer filter
    configuration class (`main.cpp:1317-1354`)."""
    F = jnp.array([[1.0, dt], [0.0, 1.0]])
    H = jnp.array([[1.0, 0.0]])
    Q = jnp.array([[0.25 * dt ** 4, 0.5 * dt ** 3],
                   [0.5 * dt ** 3, dt ** 2]]) * q
    R = jnp.array([[r]])
    return KalmanParams(F, H, Q, R)


class PIDState(NamedTuple):
    integral: jnp.ndarray
    prev_error: jnp.ndarray


class PIDController(NamedTuple):
    """Gains; stateless apply so the controller vmaps/scans."""

    kp: float
    ki: float
    kd: float
    i_limit: float = 1e9
    out_limit: float = 1e9

    def init(self, shape=()):
        return PIDState(jnp.zeros(shape), jnp.zeros(shape))

    def step(self, state: PIDState, error, dt: float):
        integral = jnp.clip(
            state.integral + error * dt, -self.i_limit, self.i_limit
        )
        deriv = (error - state.prev_error) / dt
        out = jnp.clip(
            self.kp * error + self.ki * integral + self.kd * deriv,
            -self.out_limit, self.out_limit,
        )
        return PIDState(integral, error), out


@partial(jax.jit, static_argnames=("controller", "dt"))
def pid_rollout(controller: PIDController, errors: jnp.ndarray, dt: float = 0.02):
    """Apply the controller over an error sequence (T,) -> outputs (T,)."""

    def step(s, e):
        s, out = controller.step(s, e, dt)
        return s, out

    _, outs = jax.lax.scan(step, controller.init(), errors)
    return outs
