"""Tests for the kinematic bicycle model and PID controllers."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.sim import dynamics
from oatomobile_tpu.sim.types import PIDState, VehicleSpec

SPEC = VehicleSpec()
DT = jnp.float32(0.05)


@functools.partial(jax.jit, static_argnames=("n",))
def _scan_roll(xy, yaw, speed, controls, n):

  def body(carry, _):
    xy, yaw, speed = carry
    out = dynamics.bicycle_step(xy, yaw, speed, *controls, SPEC, DT)
    return out, out[0]

  (xy, yaw, speed), traj = jax.lax.scan(body, (xy, yaw, speed), None,
                                        length=n)
  return xy, yaw, speed, traj


def _roll(xy, yaw, speed, controls, n):
  xy, yaw, speed, _ = _scan_roll(xy, yaw, speed, jnp.asarray(controls), n)
  return np.asarray(xy), float(yaw), float(speed)


def test_straight_line_motion():
  xy, yaw, speed = _roll(jnp.zeros(2), jnp.float32(0.3), jnp.float32(5.0),
                         (0.5, 0.0, 0.0), 40)
  # Heading unchanged, displacement along heading.
  assert yaw == np.float32(0.3)
  direction = xy / np.linalg.norm(xy)
  np.testing.assert_allclose(direction, [np.cos(0.3), np.sin(0.3)], atol=1e-5)


def test_full_brake_stops():
  _, _, speed = _roll(jnp.zeros(2), jnp.float32(0.0), jnp.float32(10.0),
                      (0.0, 0.0, 1.0), 60)
  assert speed == 0.0


def test_no_reverse():
  _, _, speed = _roll(jnp.zeros(2), jnp.float32(0.0), jnp.float32(0.0),
                      (0.0, 0.0, 1.0), 10)
  assert speed == 0.0


def test_top_speed_plausible():
  _, _, speed = _roll(jnp.zeros(2), jnp.float32(0.0), jnp.float32(0.0),
                      (1.0, 0.0, 0.0), 2000)
  # Drag-limited top speed ~ sqrt((max_accel - roll) / drag) ~ 25 m/s.
  assert 20.0 < speed < 30.0


def test_turning_circle_radius():
  # At constant speed with constant steer, the trajectory is a circle with
  # radius R = wheelbase / tan(steer * max_steer).
  steer = 0.5
  v = 5.0
  _, _, _, traj = _scan_roll(jnp.zeros(2), jnp.float32(0.0), jnp.float32(v),
                             jnp.asarray([0.33, steer, 0.0]), 400)
  pts = np.asarray(traj)
  # Fit circle: center is equidistant from points.
  center = pts.mean(axis=0)
  radii = np.linalg.norm(pts - center, axis=1)
  expected = float(SPEC.wheelbase) / np.tan(steer * float(SPEC.max_steer_rad))
  # Speed varies slightly (throttle balance), allow 25% tolerance.
  assert abs(radii.mean() - expected) / expected < 0.25
  assert radii.std() / radii.mean() < 0.1


def test_positive_steer_turns_right():
  # CARLA convention: positive steer increases yaw (turn towards +y).
  _, yaw, _ = _roll(jnp.zeros(2), jnp.float32(0.0), jnp.float32(5.0),
                    (0.3, 1.0, 0.0), 10)
  assert yaw > 0.0


def test_longitudinal_pid_converges():
  target = 20.0 / 3.6

  @jax.jit
  def run():

    def body(carry, _):
      pid, xy, yaw, speed = carry
      throttle, pid = dynamics.longitudinal_control(pid, speed, target, DT)
      xy, yaw, speed = dynamics.bicycle_step(xy, yaw, speed, throttle, 0.0,
                                             0.0, SPEC, DT)
      return (pid, xy, yaw, speed), None

    carry, _ = jax.lax.scan(
        body, (PIDState.zero(), jnp.zeros(2), jnp.float32(0.0),
               jnp.float32(0.0)), None, length=600)
    return carry[-1]

  assert abs(float(run()) - target) < 1.0


def test_lateral_pid_steers_toward_target():
  state = PIDState.zero()
  # Target to the right of heading -> positive steer.
  steer, _ = dynamics.lateral_control(state, jnp.zeros(2), jnp.float32(0.0),
                                      jnp.asarray([5.0, 3.0]), DT)
  assert float(steer) > 0.0
  # Target to the left -> negative.
  steer, _ = dynamics.lateral_control(state, jnp.zeros(2), jnp.float32(0.0),
                                      jnp.asarray([5.0, -3.0]), DT)
  assert float(steer) < 0.0
