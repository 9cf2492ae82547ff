"""Vehicle dynamics and controllers — pure jax, shape-polymorphic.

Replaces CARLA's UE4 physics (external, /root/reference/oatomobile/utils/
carla.py:85-98 spawns the server) with a kinematic bicycle model, and
CARLA's ``VehiclePIDController`` (consumed at /root/reference/oatomobile/
baselines/base.py:96-100 and the LocalPlanner inside autopilot/agent.py:87)
with in-graph PID controllers using the reference gains
(baselines/base.py:32-43).
"""

from typing import Tuple

import jax.numpy as jnp

from oatomobile_tpu.sim.types import PIDState, VehicleSpec

# Reference PID gains (baselines/base.py:32-43).
LATERAL_PID = {"K_P": 1.95, "K_D": 0.01, "K_I": 1.4}
LONGITUDINAL_PID = {"K_P": 1.0, "K_D": 0.0, "K_I": 1.0}
# The integral term is a 30-sample sliding window (see pid_update /
# types.PIDState) matching CARLA's error deque — bounded to
# 30 * dt * err <= ~2.4 for saturated heading errors and self-flushing
# within 1.5 s, unlike the round-1 clamped accumulator which latched
# full-lock steering through every standstill.


def bicycle_step(
    xy: jnp.ndarray,
    yaw: jnp.ndarray,
    speed: jnp.ndarray,
    throttle: jnp.ndarray,
    steer: jnp.ndarray,
    brake: jnp.ndarray,
    spec: VehicleSpec,
    dt: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """One kinematic-bicycle integration step.

  Works elementwise over any leading batch shape (hero: scalars, NPCs: [K]).

  Returns:
    (new_xy, new_yaw, new_speed).
  """
  throttle = jnp.clip(throttle, 0.0, 1.0)
  steer = jnp.clip(steer, -1.0, 1.0)
  brake = jnp.clip(brake, 0.0, 1.0)

  accel = (throttle * spec.max_accel - brake * spec.max_brake -
           spec.drag * speed * speed -
           jnp.where(speed > 0.0, spec.roll, 0.0))
  new_speed = jnp.maximum(speed + dt * accel, 0.0)

  wheel = steer * spec.max_steer_rad
  yaw_rate = new_speed / spec.wheelbase * jnp.tan(wheel)
  new_yaw = yaw + dt * yaw_rate
  # Midpoint heading keeps circular arcs honest at 20 Hz.
  mid = 0.5 * (yaw + new_yaw)
  heading = jnp.stack([jnp.cos(mid), jnp.sin(mid)], axis=-1)
  new_xy = xy + (dt * new_speed)[..., None] * heading
  return new_xy, new_yaw, new_speed


def pid_update(state: PIDState, error: jnp.ndarray, dt: jnp.ndarray,
               k_p: float, k_d: float, k_i: float) -> Tuple[jnp.ndarray,
                                                            PIDState]:
  """Single PID update with CARLA's sliding-window integral.

  CARLA's controllers integrate ``sum(deque(maxlen=30)) * dt`` — a
  bounded, self-flushing window rather than an accumulator.  Emulated
  here as a shift register along the last axis (elementwise over any
  leading batch shape).  See PIDState for why the window (vs a clamped
  accumulator) is behaviourally essential at standstill.
  """
  derivative = (error - state.prev_error) / dt
  err_buf = jnp.concatenate(
      [state.err_buf[..., 1:], error[..., None]], axis=-1)
  integral = jnp.sum(err_buf, axis=-1) * dt
  out = k_p * error + k_d * derivative + k_i * integral
  return out, PIDState(err_buf=err_buf, prev_error=error)


def longitudinal_control(state: PIDState, current_speed: jnp.ndarray,
                         target_speed: jnp.ndarray,
                         dt: jnp.ndarray) -> Tuple[jnp.ndarray, PIDState]:
  """Throttle from speed error.  CARLA's PIDLongitudinalController operates
  in km/h and clips output to [0, 1] (throttle only, no brake)."""
  error = (target_speed - current_speed) * 3.6
  out, new_state = pid_update(state, error, dt, **{
      "k_p": LONGITUDINAL_PID["K_P"],
      "k_d": LONGITUDINAL_PID["K_D"],
      "k_i": LONGITUDINAL_PID["K_I"],
  })
  return jnp.clip(out, 0.0, 1.0), new_state


def longitudinal_control_with_brake(
    state: PIDState, current_speed: jnp.ndarray, target_speed: jnp.ndarray,
    dt: jnp.ndarray, *, brake_deadband: float = 0.1,
    brake_slope: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray, PIDState]:
  """(throttle, brake, state) from speed error.

  Deviation from the reference: CARLA's PIDLongitudinalController clips to
  [0, 1] — agents can never brake except at hazard stops, so they coast
  through route ends and carry full speed into hairpins.  Here a negative
  PID output maps to the brake pedal past a dead-band:
  ``brake = brake_slope * (-out - brake_deadband)``.

  The defaults (tight dead-band, steep slope) suit the privileged
  autopilot, whose speed command is a clean route-curvature program.
  Learned bridges should pass a WIDE dead-band (~1.0) and gentle slope:
  the PID operates in km/h (K_P = 1.0), so a +-0.3 m/s tracking ripple
  at cruise already produces out ~ -1, and braking on that ripple
  measurably destabilises learned agents (the model, conditioned on the
  lower speed, predicts a slower future -> lower target -> more brake ->
  standstill mid-block).
  """
  error = (target_speed - current_speed) * 3.6
  out, new_state = pid_update(state, error, dt, **{
      "k_p": LONGITUDINAL_PID["K_P"],
      "k_d": LONGITUDINAL_PID["K_D"],
      "k_i": LONGITUDINAL_PID["K_I"],
  })
  throttle = jnp.clip(out, 0.0, 1.0)
  brake = jnp.clip(brake_slope * (-out - brake_deadband), 0.0, 1.0)
  return throttle, brake, new_state


def lateral_control(state: PIDState, xy: jnp.ndarray, yaw: jnp.ndarray,
                    target_xy: jnp.ndarray,
                    dt: jnp.ndarray) -> Tuple[jnp.ndarray, PIDState]:
  """Steering from the signed angle between the heading and the ray to the
  target waypoint (CARLA PIDLateralController semantics)."""
  forward = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
  to_target = target_xy - xy
  norm = jnp.linalg.norm(to_target, axis=-1) + 1e-6
  cos_a = jnp.clip(
      jnp.sum(forward * to_target, axis=-1) / norm, -1.0, 1.0)
  angle = jnp.arccos(cos_a)
  # Sign from the 2D cross product (positive -> target to the right).
  cross = forward[..., 0] * to_target[..., 1] - forward[..., 1] * to_target[
      ..., 0]
  error = jnp.where(cross < 0.0, -angle, angle)
  out, new_state = pid_update(state, error, dt, **{
      "k_p": LATERAL_PID["K_P"],
      "k_d": LATERAL_PID["K_D"],
      "k_i": LATERAL_PID["K_I"],
  })
  return jnp.clip(out, -1.0, 1.0), new_state
