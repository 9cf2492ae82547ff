"""Learned-policy bridge + window-PID semantics.

These lock in the round-2 stabilisation findings (see
baselines/learned/bridge.py and sim/dynamics.pid_update): the sliding
window integral flushes after standstill, the learned brake mapping
coasts on km/h-scale ripple, and degenerate standstill plans steer along
the route instead of toward plan noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from oatomobile_tpu.baselines.learned import bridge
from oatomobile_tpu.maps import load_town
from oatomobile_tpu.sim import dynamics, init_scene_batch, make_params
from oatomobile_tpu.sim.types import PID_WINDOW, PIDState

DT = jnp.float32(0.05)


def test_pid_window_flushes_after_error_drops():
  """CARLA's deque(maxlen=30) semantics: a long saturated-error episode
  must stop influencing the output within PID_WINDOW steps of the error
  dropping — the round-1 accumulator latched for hundreds of steps."""
  state = PIDState.zero()
  err = jnp.float32(1.0)
  for _ in range(200):  # way beyond the window: standstill with offset
    out_sat, state = dynamics.pid_update(state, err, DT, k_p=1.95,
                                         k_d=0.01, k_i=1.4)
  # Integral contribution is bounded by the window, not by 200 steps.
  assert float(out_sat) <= 1.95 + 1.4 * PID_WINDOW * 0.05 + 0.5
  for _ in range(PID_WINDOW):
    out, state = dynamics.pid_update(state, jnp.float32(0.0), DT,
                                     k_p=1.95, k_d=0.01, k_i=1.4)
  assert abs(float(out)) < 1e-4  # fully flushed


def test_learned_brake_deadband_coasts_on_ripple():
  """A sub-km/h tracking ripple must coast (no brake) under the learned
  mapping, while a hard slow-down command still brakes."""
  state = PIDState.zero()
  throttle, brake, state = dynamics.longitudinal_control_with_brake(
      state, jnp.float32(5.6), jnp.float32(5.35), DT,
      brake_deadband=1.0, brake_slope=0.25)
  assert float(brake) == 0.0
  state = PIDState.zero()
  for _ in range(10):
    throttle, brake, state = dynamics.longitudinal_control_with_brake(
        state, jnp.float32(5.6), jnp.float32(0.0), DT,
        brake_deadband=1.0, brake_slope=0.25)
  assert float(brake) > 0.5 and float(throttle) == 0.0


def _scene_batch(B=2):
  town = load_town("Town01")
  params = make_params(town)
  states = init_scene_batch(town, B, num_vehicles=0, seed=0)
  return params, states


def test_degenerate_plan_steers_along_route():
  """A collapsed standstill plan must not command hard steering: the
  bridge falls back to the first route waypoint >= 4 m ahead."""
  params, states = _scene_batch()
  B = 2
  # Degenerate plan: every point ~0 with a slight BACKWARD-left bias (the
  # measured v=0 failure shape) -> without the fallback the lateral error
  # is ~pi and steer saturates.
  plan = jnp.tile(jnp.asarray([[-0.0, 0.0], [-0.1, 0.1],
                               [-0.2, 0.2], [-0.5, 0.4]]), (B, 1, 1))
  # Straight-ahead route goals in ego frame.
  goal = jnp.tile(jnp.stack([jnp.arange(1.0, 11.0),
                             jnp.zeros(10)], axis=-1), (B, 1, 1))
  actions, _ = bridge.plan_to_action(params, states, plan, goal=goal)
  steer = np.asarray(actions[:, 1])
  assert np.all(np.abs(steer) < 0.3), steer
  # Without goals (no fallback) the same plan saturates the steer —
  # guards that the fallback is actually doing the work.  (Run the
  # control above the standstill steering clamp's 0.5 m/s gate so the
  # PID saturation stays observable.)
  moving = states.replace(hero_speed=jnp.full(B, 1.0))
  actions_nofb, _ = bridge.plan_to_action(params, moving, plan)
  assert np.any(np.abs(np.asarray(actions_nofb[:, 1])) > 0.8)


def test_healthy_plan_ignores_fallback():
  """A normal cruise plan (>2 m reach) must use the plan setpoint even
  when goals are provided — fallback is standstill-only."""
  params, states = _scene_batch()
  B = 2
  plan = jnp.tile(jnp.asarray([[0.3, 0.0], [5.6, 0.5],
                               [11.0, 1.0], [16.5, 1.5]]), (B, 1, 1))
  goal_left = jnp.tile(jnp.stack([jnp.arange(1.0, 11.0),
                                  jnp.arange(1.0, 11.0)], axis=-1),
                       (B, 1, 1))  # 45-degree-left route
  a_with, _ = bridge.plan_to_action(params, states, plan, goal=goal_left)
  a_without, _ = bridge.plan_to_action(params, states, plan)
  np.testing.assert_allclose(np.asarray(a_with), np.asarray(a_without),
                             atol=1e-6)


def test_speed_gain_scales_target():
  params, states = _scene_batch()
  B = 2
  # Gentle plan (0.15 m/s) — the PID works in km/h, so anything faster
  # saturates the throttle at both gains and hides the difference.
  plan = jnp.tile(jnp.asarray([[0.05, 0.0], [0.2, 0.0],
                               [0.35, 0.0], [2.1, 0.0]]), (B, 1, 1))
  # Same state, higher gain -> more throttle (both from rest).
  a1, _ = bridge.plan_to_action(params, states, plan, speed_gain=1.0,
                                warmup_floor=0.0)
  a2, _ = bridge.plan_to_action(params, states, plan, speed_gain=1.5,
                                warmup_floor=0.0)
  assert float(a2[0, 0]) >= float(a1[0, 0])
  assert float(jnp.max(jnp.abs(a2 - a1))) > 0.0


def test_bev_clear_ahead_geometry():
  """Obstacle-channel returns gate by position: only the forward corridor
  (past the hero's nose, within reach) blocks."""
  B = 4
  lidar = np.zeros((B, 200, 200, 2), np.float32)
  ppm = 200 / 101.0
  r = lambda f: int(round((f + 50.0) * ppm))
  # scene 0: empty.  scene 1: car 5 m dead ahead.  scene 2: car 5 m
  # BEHIND.  scene 3: car 20 m ahead (outside reach).
  lidar[1, r(5.0) - 1:r(5.0) + 2, 98:102, 1] = 1.0
  lidar[2, r(-5.0) - 1:r(-5.0) + 2, 98:102, 1] = 1.0
  lidar[3, r(20.0) - 1:r(20.0) + 2, 98:102, 1] = 1.0
  clear = np.asarray(bridge.bev_clear_ahead(jnp.asarray(lidar)))
  assert clear.tolist() == [True, False, True, True], clear


def test_warmup_floor_gated_by_clear_ahead():
  """The spawn warm-up floor must not push into an occupied forward
  corridor (a degenerate standstill plan + blocked BEV -> no throttle)."""
  params, states = _scene_batch()
  B = 2
  plan = jnp.zeros((B, 4, 2))
  goal = jnp.tile(jnp.stack([jnp.arange(1.0, 11.0),
                             jnp.zeros(10)], axis=-1), (B, 1, 1))
  blocked = jnp.asarray([False, True])  # scene 0 blocked, scene 1 clear
  actions, _ = bridge.plan_to_action(params, states, plan, goal=goal,
                                     clear_ahead=blocked)
  throttle = np.asarray(actions[:, 0])
  assert throttle[0] == 0.0, throttle     # blocked: no warm-up push
  assert throttle[1] > 0.1, throttle      # clear: floor drives off


def test_stall_kick_steers_route_at_full_floor():
  """Mid-kick the bridge must (a) command the UNSCALED 2.5 m/s floor —
  the plan-curvature factor pinned the old kick at 0.75 m/s crawl when
  the standstill plan curled — and (b) steer along the route fallback,
  not the degenerate plan."""
  params, states = _scene_batch()
  B = 2
  # Sharply curling plan with healthy reach (3.5 m > 2 m: the plain
  # standstill fallback does NOT trigger; only the kick redirects).
  plan = jnp.tile(jnp.asarray([[1.0, 0.0], [1.5, 1.5],
                               [1.0, 3.0], [0.0, 3.5]]), (B, 1, 1))
  goal = jnp.tile(jnp.stack([jnp.arange(1.0, 11.0),
                             jnp.zeros(10)], axis=-1), (B, 1, 1))
  bev = jnp.zeros((B, 200, 200, 2))
  armed = states.replace(hero_wait=jnp.full(B, 40, jnp.int32),
                         step=jnp.full(B, 200, jnp.int32))
  idle = states.replace(step=jnp.full(B, 200, jnp.int32))
  a_kick, _ = bridge.plan_to_action(params, armed, plan, goal=goal,
                                    bev=bev, warmup_floor=0.0)
  a_idle, _ = bridge.plan_to_action(params, idle, plan, goal=goal,
                                    bev=bev, warmup_floor=0.0)
  # Unscaled floor: the kick pushes hard from rest; idle barely moves
  # (curling plan -> slow=0.3 scales the plan-derived target down).
  assert float(a_kick[0, 0]) > 0.5, a_kick
  # Route steering: the kick tracks the straight-ahead goal ray while
  # the idle bridge steers into the curling plan.
  assert abs(float(a_kick[0, 1])) < 0.3, a_kick
  assert abs(float(a_idle[0, 1])) > abs(float(a_kick[0, 1])), (a_idle,
                                                               a_kick)


def test_bev_clear_toward_follows_ray():
  """The direction-aware corridor probes along the ray to the setpoint:
  a wall dead ahead must not block a kick that steers away from it
  (the measured Hills hairpin standstill), while an obstacle ON the ray
  must."""
  B = 3
  lidar = np.zeros((B, 200, 200, 2), np.float32)
  ppm = 200 / 101.0
  r = lambda f: int(round((f + 50.0) * ppm))
  # 4 m-wide wall face 5 m dead ahead (lateral -1.5..2.5 m) in scenes 0
  # and 1.  Scene 2: obstacle on the diagonal ray instead.
  lidar[0, r(5.0) - 1:r(5.0) + 2, 96:104, 1] = 1.0
  lidar[1, r(5.0) - 1:r(5.0) + 2, 96:104, 1] = 1.0
  lidar[2, r(4.0) - 2:r(4.0) + 3, r(4.0) - 2:r(4.0) + 3, 1] = 1.0
  toward = jnp.asarray([[8.0, 0.0],    # straight at the wall: blocked
                        [5.0, 5.0],    # 45 deg away from it: clear
                        [5.0, 5.0]])   # 45 deg into the diagonal car
  clear = np.asarray(bridge.bev_clear_toward(jnp.asarray(lidar), toward))
  assert clear.tolist() == [False, True, False], clear
