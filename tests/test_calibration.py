"""Dynamics calibration: CARLA-Mustang-anchored behaviour bands.

Without the CARLA binary there are no logged UE4 trajectories to replay
(SURVEY.md §7 "hard parts"), so calibration is asserted against the
CARLA hero's documented behaviour (ford.mustang, the hero spawned at
reference utils/carla.py:236-264) with +-20% bands:

- full-throttle 0-50 km/h in ~4.5 s (muscle-car launch, traction-
  limited in UE4; VehicleSpec.max_accel is fitted to this),
- full-brake stop from 50 km/h in ~12 m (~0.8 g deceleration, the
  UE4 wheel-friction default; drag+roll shorten the discrete stop),
- steady-state turn radius == wheelbase / tan(wheel angle) to 2%
  (kinematic-bicycle geometry; CARLA's low-speed handling follows
  Ackermann geometry closely),
- closed-loop cruise within 10% of the reference TARGET_SPEED
  (20 km/h, simulators/carla/defaults.py:185).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.sim import dynamics
from oatomobile_tpu.sim.types import VehicleSpec

SPEC = VehicleSpec()
DT = jnp.float32(0.05)


@functools.partial(jax.jit, static_argnames=("n",))
def _full_throttle(n):
  def body(carry, _):
    xy, yaw, speed = carry
    out = dynamics.bicycle_step(xy, yaw, speed, 1.0, 0.0, 0.0, SPEC, DT)
    return out, out[2]

  _, speeds = jax.lax.scan(body, (jnp.zeros(2), jnp.float32(0.0),
                                  jnp.float32(0.0)), None, length=n)
  return speeds


def test_zero_to_fifty_kmh_time():
  # Anchor: ~4.5 s (CARLA mustang full-throttle launch); +-20%.
  speeds = np.asarray(_full_throttle(400))
  crossing = np.argmax(speeds >= 50.0 / 3.6)
  assert crossing > 0, "never reached 50 km/h"
  t = crossing * 0.05
  assert 3.6 < t < 5.4, t


def test_top_speed_band():
  # VehicleSpec documents ~90 km/h top speed (drag-limited).
  speeds = np.asarray(_full_throttle(1200))
  top = speeds[-1] * 3.6
  assert 80.0 < top < 100.0, top


def test_braking_distance_from_50_kmh():
  # Anchor: ~12 m from 50 km/h (0.8 g); +-20%.
  @jax.jit
  def run():
    def body(carry, _):
      xy, yaw, speed = carry
      out = dynamics.bicycle_step(xy, yaw, speed, 0.0, 0.0, 1.0, SPEC, DT)
      return out, None

    carry, _ = jax.lax.scan(body, (jnp.zeros(2), jnp.float32(0.0),
                                   jnp.float32(50.0 / 3.6)), None,
                            length=200)
    return carry[0]

  dist = float(jnp.linalg.norm(run()))
  assert 9.6 < dist < 14.4, dist


def test_constant_radius_turn_matches_steering_geometry():
  # Steady-state circle at |steer| = 0.5: radius must equal
  # wheelbase / tan(0.5 * max_steer) within 2% (Ackermann geometry).
  @jax.jit
  def run():
    def body(carry, _):
      xy, yaw, speed = carry
      out = dynamics.bicycle_step(xy, yaw, speed, 0.12, 0.5, 0.0, SPEC, DT)
      return out, out[0]

    _, pts = jax.lax.scan(body, (jnp.zeros(2), jnp.float32(0.0),
                                 jnp.float32(3.0)), None, length=600)
    return pts

  pts = np.asarray(run())[200:]  # steady-state portion
  # Algebraic circle fit.
  A = np.c_[2 * pts[:, 0], 2 * pts[:, 1], np.ones(len(pts))]
  b = (pts ** 2).sum(1)
  c, *_ = np.linalg.lstsq(A, b, rcond=None)
  radius = np.sqrt(c[2] + c[0] ** 2 + c[1] ** 2)
  geometric = float(SPEC.wheelbase) / np.tan(
      0.5 * float(SPEC.max_steer_rad))
  assert abs(radius - geometric) / geometric < 0.02, (radius, geometric)


def test_autopilot_cruise_tracks_target_speed():
  # Closed-loop autopilot on a long empty straight runs the targeted
  # fast cruise (30 km/h = 8.33 m/s, sim/autopilot.py) on clear
  # junction-free segments, within 10%, and never exceeds it.  The
  # reference's blanket 20 km/h TARGET_SPEED remains the cap near
  # junctions/bends/traffic — covered by the capped-speed assertion and
  # the traffic suites.
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.sim import autopilot_policy, init_scene, make_params, \
      world_step

  town = load_town("Town01")
  params = make_params(town)
  state = init_scene(town, spawn_point=1, destination=100, jax_seed=2)

  @jax.jit
  def run(state):
    def body(carry, _):
      a, carry = autopilot_policy(params, carry)
      carry = world_step(params, carry, a)
      return carry, carry.hero_speed

    return jax.lax.scan(body, state, None, length=400)

  _, speeds = run(state)
  speeds = np.asarray(speeds)
  # Post-rampup cruise segments (ignore stops at lights/turns): the
  # top-quartile speed should sit within 10% of the fast-cruise target.
  cruise = np.quantile(speeds[100:], 0.75)
  assert 7.5 < cruise < 9.2, cruise
  # Transient PID overshoot on the 0 -> 8.3 m/s ramp stays bounded.
  assert speeds.max() < 10.0, speeds.max()
