"""Jittable mission controller: the reference's autonomous-flight state
machine as a pure function over static-shape state.

The reference client runs a 15-branch while(1) loop on the host
(`ref/airsim/main.cpp:1633-3974`): takeoff, per-pillar waypoint queue
(`main.cpp:1591-1610`), ring-gate search + PID visual servoing to center
the gate within ±10 px of (310, 260) before dashing through
(`main.cpp:903-1287`), an ArUco scan sweep (right2left/forward/left2right
enum, `main.cpp:1575-1581`), parking-pad search, and landing. Every branch
is an RPC to the simulator.

Here the same control policy is `mission_step`: phase transitions via
`lax.switch`, PID servoing on detector pixel errors, waypoint tables as
static arrays — so the whole perception→decision→command tick jits, and
`mission_rollout` closes the loop with a user-supplied jittable
observation function (`lax.scan`: entire missions compile as ONE XLA
program, batched over fleets with vmap if desired).
"""

from __future__ import annotations

from enum import IntEnum
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.utils.estimation import PIDController, PIDState


class Phase(IntEnum):
    TAKEOFF = 0
    NAV_WAYPOINT = 1
    SEARCH_GATE = 2
    ALIGN_GATE = 3
    PASS_GATE = 4
    ARUCO_SCAN = 5
    PARK_SEARCH = 6
    ALIGN_PARK = 7
    DESCEND = 8
    LANDED = 9


class Observation(NamedTuple):
    """Per-tick sensing, produced by the detect/aruco kernels (or a sim)."""

    ring_px: jnp.ndarray      # (2,) gate center (x, y) in the front image
    ring_score: jnp.ndarray   # scalar detection confidence
    blob_px: jnp.ndarray      # (2,) pad center (x, y) in the below image
    blob_found: jnp.ndarray   # bool
    altitude: jnp.ndarray     # scalar (world z)
    position: jnp.ndarray     # (3,) estimated world position
    marker_ids: jnp.ndarray   # (M,) decoded ids this tick (-1 = none)


class Command(NamedTuple):
    velocity: jnp.ndarray  # (3,) world-frame commanded velocity
    yaw_rate: jnp.ndarray  # scalar


class MissionConfig(NamedTuple):
    waypoints: jnp.ndarray          # (N, 3) pillar/gate approach points
    gate_waypoint: jnp.ndarray      # (N,) bool: search for a ring on arrival
    task_ids: jnp.ndarray           # (K,) ArUco ids to collect
    image_center: jnp.ndarray       # (2,) servo setpoint (the ref's 310, 260)
    cruise_alt: float = 4.0         # reference pillar_height ~4.1
    land_alt: float = 0.3
    wp_tol: float = 0.5
    align_tol_px: float = 10.0      # reference's ±10 px gate gate
    align_ticks: int = 3            # consecutive centered ticks before dash
    pass_ticks: int = 20
    scan_ticks: int = 60            # one right2left/forward/left2right leg
    ring_score_min: float = 0.25
    speed: float = 1.5
    servo_gain: tuple = (0.01, 0.0, 0.004)  # PID on pixel error


class MissionState(NamedTuple):
    phase: jnp.ndarray          # int32 Phase
    wp_index: jnp.ndarray       # int32
    ticks_in_phase: jnp.ndarray
    align_streak: jnp.ndarray   # consecutive centered ticks (ref count_go)
    scan_leg: jnp.ndarray       # 0 right2left, 1 forward, 2 left2right
    found_mask: jnp.ndarray     # (K,) task ids collected so far
    pid_y: PIDState
    pid_z: PIDState


def mission_init(cfg: MissionConfig) -> MissionState:
    pid = PIDController(*cfg.servo_gain)
    return MissionState(
        phase=jnp.int32(Phase.TAKEOFF),
        wp_index=jnp.int32(0),
        ticks_in_phase=jnp.int32(0),
        align_streak=jnp.int32(0),
        scan_leg=jnp.int32(0),
        found_mask=jnp.zeros_like(cfg.task_ids, jnp.bool_),
        pid_y=pid.init(),
        pid_z=pid.init(),
    )


def _goto(cfg, target, pos):
    d = target - pos
    dist = jnp.linalg.norm(d)
    v = d / jnp.maximum(dist, 1e-6) * jnp.minimum(cfg.speed, dist * 2.0)
    return v, dist


@partial(jax.jit, static_argnames=("dt",))
def mission_step(
    cfg: MissionConfig, state: MissionState, obs: Observation,
    dt: float = 0.1,
) -> tuple[MissionState, Command]:
    """One control tick. Pure and batched-compatible; see module doc."""
    pid = PIDController(*cfg.servo_gain)
    n_wp = cfg.waypoints.shape[0]
    pos = obs.position
    zero3 = jnp.zeros(3)

    # collect any task markers seen this tick, in every phase
    seen = (cfg.task_ids[:, None] == obs.marker_ids[None, :]).any(axis=1)
    found_mask = state.found_mask | seen

    def takeoff(s):
        v = jnp.array([0.0, 0.0, 1.0]) * cfg.speed
        done = obs.altitude >= cfg.cruise_alt
        return jnp.where(done, Phase.NAV_WAYPOINT, Phase.TAKEOFF), v, s

    def nav(s):
        wp = cfg.waypoints[jnp.clip(s.wp_index, 0, n_wp - 1)]
        v, dist = _goto(cfg, wp, pos)
        arrived = dist < cfg.wp_tol
        is_gate = cfg.gate_waypoint[jnp.clip(s.wp_index, 0, n_wp - 1)]
        last = s.wp_index >= n_wp - 1
        nxt = jnp.where(
            arrived & is_gate, Phase.SEARCH_GATE,
            jnp.where(arrived & last, Phase.ARUCO_SCAN, Phase.NAV_WAYPOINT))
        s = s._replace(wp_index=jnp.where(
            arrived & ~is_gate & ~last, s.wp_index + 1, s.wp_index))
        return nxt, jnp.where(arrived, zero3, v), s

    def search(s):
        # lateral sweep until the ring detector fires (ref front_circle),
        # holding cruise altitude (the reference re-commands pillar height
        # before every search leg, main.cpp:1666)
        period = 2 * cfg.scan_ticks
        sweep = jnp.where((s.ticks_in_phase % period) < cfg.scan_ticks,
                          1.0, -1.0)
        vz = jnp.clip(cfg.cruise_alt - obs.altitude, -1.0, 1.0) * cfg.speed
        v = jnp.array([0.0, 1.0, 0.0]) * sweep * cfg.speed * 0.5 \
            + jnp.array([0.0, 0.0, 1.0]) * vz
        hit = obs.ring_score > cfg.ring_score_min
        return jnp.where(hit, Phase.ALIGN_GATE, Phase.SEARCH_GATE), v, s

    def align(s):
        err = cfg.image_center - obs.ring_px  # (x, y) pixel error
        pid_y, vy = pid.step(s.pid_y, err[0], dt)
        pid_z, vz = pid.step(s.pid_z, err[1], dt)
        centered = jnp.all(jnp.abs(err) < cfg.align_tol_px)
        streak = jnp.where(centered, s.align_streak + 1, 0)
        lost = obs.ring_score < cfg.ring_score_min
        s = s._replace(pid_y=pid_y, pid_z=pid_z, align_streak=streak)
        nxt = jnp.where(
            streak >= cfg.align_ticks, Phase.PASS_GATE,
            jnp.where(lost, Phase.SEARCH_GATE, Phase.ALIGN_GATE))
        # image y grows downward: a gate ABOVE center has pixel y < setpoint,
        # so positive err[1] means climb (+z); err[0] likewise maps to +y
        return nxt, jnp.array([0.0, 1.0, 0.0]) * vy \
            + jnp.array([0.0, 0.0, 1.0]) * vz, s

    def dash_fixed(s):
        v = jnp.array([1.0, 0.0, 0.0]) * cfg.speed
        done = s.ticks_in_phase >= cfg.pass_ticks
        s = s._replace(
            wp_index=jnp.where(done, s.wp_index + 1, s.wp_index),
            align_streak=jnp.int32(0))
        all_done = s.wp_index >= n_wp
        nxt = jnp.where(
            done, jnp.where(all_done, Phase.ARUCO_SCAN, Phase.NAV_WAYPOINT),
            Phase.PASS_GATE)
        return nxt, v, s

    def scan(s):
        # the reference's right2left / forward / left2right sweep enum
        leg_v = jnp.asarray(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        v = leg_v[jnp.clip(s.scan_leg, 0, 2)] * cfg.speed * 0.5
        leg_done = s.ticks_in_phase >= (s.scan_leg + 1) * cfg.scan_ticks
        s = s._replace(scan_leg=jnp.where(leg_done, s.scan_leg + 1,
                                          s.scan_leg))
        all_found = found_mask.all()
        finished = (s.scan_leg > 2) | all_found
        return jnp.where(finished, Phase.PARK_SEARCH, Phase.ARUCO_SCAN), v, s

    def park_search(s):
        period = 2 * cfg.scan_ticks
        sweep = jnp.where((s.ticks_in_phase % period) < cfg.scan_ticks,
                          1.0, -1.0)
        v = jnp.array([0.3, 1.0 * sweep, 0.0]) * cfg.speed * 0.5
        return jnp.where(obs.blob_found, Phase.ALIGN_PARK,
                         Phase.PARK_SEARCH), v, s

    def align_park(s):
        # below-camera: image x ~ world y, image y ~ world x (ref PARK servo)
        err = cfg.image_center - obs.blob_px
        pid_y, vy = pid.step(s.pid_y, err[0], dt)
        pid_z, vx = pid.step(s.pid_z, err[1], dt)
        centered = jnp.all(jnp.abs(err) < cfg.align_tol_px)
        streak = jnp.where(centered, s.align_streak + 1, 0)
        s = s._replace(pid_y=pid_y, pid_z=pid_z, align_streak=streak)
        nxt = jnp.where(streak >= cfg.align_ticks, Phase.DESCEND,
                        jnp.where(obs.blob_found, Phase.ALIGN_PARK,
                                  Phase.PARK_SEARCH))
        return nxt, jnp.array([vx, vy, 0.0]), s

    def descend(s):
        v = jnp.array([0.0, 0.0, -0.6]) * cfg.speed
        done = obs.altitude <= cfg.land_alt
        return jnp.where(done, Phase.LANDED, Phase.DESCEND), v, s

    def landed(s):
        return jnp.int32(Phase.LANDED), zero3, s

    branches = [takeoff, nav, search, align, dash_fixed, scan,
                park_search, align_park, descend, landed]

    def _norm(branch):
        # lax.switch needs identical output pytrees: pin phase to int32
        # and velocity to f32 across every branch
        def wrapped(s):
            nxt, v, s2 = branch(s)
            return (jnp.asarray(nxt, jnp.int32),
                    jnp.asarray(v, jnp.float32), s2)
        return wrapped

    nxt, v, state = jax.lax.switch(
        state.phase, [_norm(b) for b in branches], state)
    state = state._replace(
        phase=nxt,
        found_mask=found_mask,
        ticks_in_phase=jnp.where(nxt == state.phase,
                                 state.ticks_in_phase + 1, 0),
    )
    return state, Command(v, jnp.float32(0.0))


def mission_rollout(
    cfg: MissionConfig,
    observe: Callable[[jnp.ndarray], Observation],
    n_steps: int,
    start: jnp.ndarray,
    dt: float = 0.1,
):
    """Close the loop: integrate single-integrator dynamics against a
    jittable observation function. One lax.scan — the entire mission is a
    single compiled program. Returns (final_state, positions (T, 3),
    phases (T,))."""

    def tick(carry, _):
        state, pos = carry
        obs = observe(pos)
        state, cmd = mission_step(cfg, state, obs, dt=dt)
        pos = pos + cmd.velocity * dt
        return (state, pos), (pos, state.phase)

    (state, _), (traj, phases) = jax.lax.scan(
        tick, (mission_init(cfg), jnp.asarray(start, jnp.float32)),
        length=n_steps)
    return state, traj, phases
