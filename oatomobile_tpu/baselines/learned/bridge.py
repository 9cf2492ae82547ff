"""Shared plan -> control bridge for the learned in-graph policies.

Semantics follow SetPointAgent (reference baselines/base.py:116-176): the
[T, 2] ego-frame plan (1 s spacing) is tracked via an interpolated
setpoint; target speed derives from setpoint spacing; lateral and
longitudinal PIDs produce the control.  Two measured improvements over
the reference bridge (both validated on the CARNOVEL sweep, see
PARITY.md):

- Brake-capable longitudinal control: the reference PID clips to [0, 1]
  (throttle only, base.py:96-100) so learned agents could never slow
  down for turns — they coasted into hairpins at cruise speed.
- Plan-curvature slow-down: target speed is scaled down by the bend of
  the plan itself (max heading change across plan segments), mirroring
  the expert autopilot's upcoming-route-curvature brake (sim/autopilot.py)
  with information available to a non-privileged agent: its own plan.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.sim import dynamics
from oatomobile_tpu.sim.types import SceneState, WorldParams

_PLAN_DT = 1.0  # seconds between downsampled plan points


def bev_clear_ahead(lidar: jnp.ndarray,
                    *,
                    reach_m: float = 8.0,
                    half_width_m: float = 1.3,
                    threshold: float = 0.15) -> jnp.ndarray:
  """[B] bool: no obstacle return in the forward corridor of the agent's
  own 200x200x2 BEV observation (channel 1 = above-ground returns;
  layout per ops/bev.py: rows = forward offsets -50..50 m at 0.505 m/bin,
  cols = lateral).  The window starts past the hero's own nose (2.5 m)
  so the test is about OTHER bodies.  Non-privileged: this reads the
  sensor the model itself consumes, not simulator state."""
  ppm = 200 / 101.0  # 1 / BIN_WIDTH
  r0 = int(round((2.5 + 50.0) * ppm))
  r1 = int(round((reach_m + 50.0) * ppm))
  c0 = int(round((-half_width_m + 50.0) * ppm))
  c1 = int(round((half_width_m + 50.0) * ppm)) + 1
  window = lidar[:, r0:r1, c0:c1, 1]
  return jnp.max(window, axis=(1, 2)) <= threshold


def bev_clear_toward(lidar: jnp.ndarray,
                     toward_xy: jnp.ndarray,
                     *,
                     reach_m: float = 8.0,
                     half_width_m: float = 1.1,
                     threshold: float = 0.15,
                     num_samples: int = 16) -> jnp.ndarray:
  """[B] bool: the corridor toward an ego-frame target point is free of
  above-ground returns in the agent's own BEV observation.

  The straight-ahead window (`bev_clear_ahead`) is the wrong question at
  a bend: a hero stalled mid-hairpin faces a wall dead ahead while the
  route it would actually steer along (the stall kick follows the
  goal-fallback setpoint) curls away into free space — measured RIP-WCM
  Hills: 85% timeout with ZERO collisions because the wall return kept
  the kick permanently disarmed.  This probes a pixel corridor along the
  ray to ``toward_xy`` instead: samples at 0.35 m spacing from past the
  hero's nose (2.5 m) out to ``reach_m``, three lateral offsets each.
  Still non-privileged — it reads the sensor the model itself consumes.
  """
  ppm = 200 / 101.0
  theta = jnp.arctan2(toward_xy[:, 1], toward_xy[:, 0])       # [B]
  u = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)         # [B, 2]
  n = jnp.stack([-u[:, 1], u[:, 0]], -1)                      # [B, 2]
  d = jnp.linspace(2.5, reach_m, num_samples)                 # [S]
  w = jnp.asarray([-half_width_m, 0.0, half_width_m])         # [3]
  # [B, S, 3, 2] ego-frame sample points.
  pts = (d[None, :, None, None] * u[:, None, None, :] +
         w[None, None, :, None] * n[:, None, None, :])
  rows = jnp.clip(jnp.round((pts[..., 0] + 50.0) * ppm), 0, 199)
  cols = jnp.clip(jnp.round((pts[..., 1] + 50.0) * ppm), 0, 199)
  flat = (rows * 200 + cols).astype(jnp.int32).reshape(lidar.shape[0], -1)
  above = lidar[..., 1].reshape(lidar.shape[0], -1)           # [B, H*W]
  vals = jnp.take_along_axis(above, flat, axis=1)             # [B, S*3]
  return jnp.max(vals, axis=-1) <= threshold


def plan_to_action(
    world_params: WorldParams,
    states: SceneState,
    plan: jnp.ndarray,
    *,
    setpoint_frac: float = 0.5,
    use_brake: bool = True,
    curvature_slowdown: bool = True,
    warmup_floor: float = 20.0 / 3.6,
    goal: jnp.ndarray = None,
    speed_gain: float = 1.0,
    stall_recovery: bool = True,
    red_held: jnp.ndarray = None,
    clear_ahead: jnp.ndarray = None,
    bev: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, SceneState]:
  """Converts an ego-frame plan batch [B, T, 2] into actions [B, 3].

  Args:
    goal: optional [B, G, 2] ego-frame route waypoints (the goal sensor).
      When given, steers toward the first waypoint >= 4 m ahead whenever
      the plan is degenerate (endpoint closer than 2 m: a standstill
      plan carries no usable direction — measured plans at v = 0 point
      sideways or even backward, which pins the lateral PID at +-pi and
      restarts the vehicle at full steering lock).
    speed_gain: multiplier on the plan-derived target speed.  The model's
      predicted speed tracks its CURRENT speed (imitation inertia), so a
      gain of exactly 1.0 is only marginally stable — any disturbance
      that slows the car lowers the next prediction and spirals to a
      standstill.  A gain slightly above 1 biases the loop back toward
      cruise; stops still happen because a stopping plan collapses
      toward zero faster than the gain can offset.

  Returns (actions, states with updated PID controllers).
  """
  # Tracked setpoint: interpolated between plan[0] (~1 s ahead) and
  # plan[1].  Shorter lookaheads destabilise the lateral PID (measured:
  # 64/64 crashes at 0.4x plan[0]); this matches the reference's
  # interpolated index-5 setpoint.
  setpoint_local = ((1.0 - setpoint_frac) * plan[:, 0] +
                    setpoint_frac * plan[:, 1])
  fallback = None
  if goal is not None:
    plan_reach = jnp.linalg.norm(plan[:, -1], axis=-1)          # [B]
    dist = jnp.linalg.norm(goal, axis=-1)                       # [B, G]
    ahead = dist >= 4.0
    # First waypoint >= 4 m out; the farthest one when none qualifies.
    idx = jnp.where(jnp.any(ahead, axis=-1),
                    jnp.argmax(ahead, axis=-1),
                    jnp.argmax(dist, axis=-1))                  # [B]
    fallback = jnp.take_along_axis(goal, idx[:, None, None],
                                   axis=1)[:, 0]                # [B, 2]
    setpoint_local = jnp.where((plan_reach < 2.0)[:, None],
                               fallback, setpoint_local)

  # Physically-correct target speed: consecutive plan points are
  # _PLAN_DT apart (future 80 steps @20 Hz downsampled to 4).  The
  # reference's interpolated-buffer formula commands 2x this and closed
  # loop runs away to 3x (out-of-distribution velocities beget larger
  # predicted displacements) — measured 17.7 m/s vs the 5.56 m/s
  # expert.  Deviation documented in PARITY.md.
  target_speed = speed_gain * jnp.linalg.norm(plan[:, 1] - plan[:, 0],
                                              axis=-1) / _PLAN_DT

  slow = jnp.ones(plan.shape[0], plan.dtype)
  if curvature_slowdown:
    # Bend of the plan: max heading change between consecutive plan
    # segments plus the initial heading offset (the first segment's
    # angle in ego frame).  Untrained/OOD plans that curl sharply get
    # driven slowly instead of at full cruise.
    seg = plan[:, 1:] - plan[:, :-1]              # [B, T-1, 2]
    seg_yaw = jnp.arctan2(seg[..., 1], seg[..., 0])
    first = jnp.abs(jnp.arctan2(jnp.sin(seg_yaw[:, 0]),
                                jnp.cos(seg_yaw[:, 0])))
    dyaw = seg_yaw[:, 1:] - seg_yaw[:, :-1]
    bend = jnp.max(jnp.abs(jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))),
                   axis=-1)
    bend = jnp.maximum(bend, first)
    slow = jnp.clip(1.0 - 0.8 * bend, 0.3, 1.0)
    target_speed = target_speed * slow

  limit = world_params.map["wp_speed_limit"][states.hero_wp]
  target_speed = jnp.minimum(target_speed, limit)

  # Stall-kick phase (armed by the counter threaded below).  Computed
  # up front because the kick redirects the SETPOINT as well as the
  # speed floor: a stalled model's plan is degenerate (points sideways
  # or curls back on itself), so during the kick window the bridge
  # steers along the route waypoint (goal fallback) instead.
  phase_now = jnp.mod(states.hero_wait, 120)
  phase_kick = (phase_now > 20) & (phase_now <= 100)
  kick_target = setpoint_local
  if stall_recovery and fallback is not None:
    kick_target = jnp.where(phase_kick[:, None], fallback, setpoint_local)

  # Direction-aware corridor: when the raw BEV is available, test
  # clearance along the ray the floor/kick would actually steer (the
  # kick's route-fallback ray during a kick window, the tracked
  # setpoint otherwise) instead of dead ahead.  ``clear_short`` is the
  # same probe truncated to 4 m: the escalated creep (below) uses it so
  # a wedged hero still stops 4 m behind a stationary queue leader
  # while ignoring wall corners the full 8 m ray clips at hairpins.
  clear_short = None
  if bev is not None:
    clear_ahead = bev_clear_toward(bev, kick_target)
    clear_short = bev_clear_toward(bev, kick_target, reach_m=4.0,
                                   num_samples=8)
  # Spawn warm-up floor (base.py:165-167): bootstraps motion out of the
  # v=0 regime where the model's predicted displacements collapse.  The
  # floor itself is scaled by the plan-curvature factor — the reference's
  # unconditional 20 km/h floor forces full speed through bends for the
  # first 100 steps, which is lethal on CARNOVEL spawns that open onto
  # abnormal turns (measured: crashes cluster at t~95 at exactly floor
  # speed).
  if warmup_floor > 0.0:
    floor_ok = (jnp.ones(plan.shape[0], bool) if clear_ahead is None
                else clear_ahead)
    target_speed = jnp.where((states.step <= 100) & floor_ok,
                             jnp.maximum(target_speed, warmup_floor * slow),
                             target_speed)

  # Mid-episode stall recovery: once the car stops, the predicted
  # displacements collapse (imitation inertia) and speed_gain alone
  # cannot restart it -- the warmup floor only covers the first 100
  # steps, so an OOD hesitation (e.g. a hairpin the Town01 training set
  # never showed) becomes a permanent standstill (measured: RIP-WCM
  # Hills 92.5% TIMEOUT with only 7.5% collisions).  Cyclic kick via
  # the SceneState hero_wait counter (unused by learned policies):
  # 1 s stopped arms a 4 s floor at 2.5 m/s steered along the ROUTE
  # (goal-fallback waypoint -- see ``kick_target`` above), then 1 s
  # of model control before re-arming -- if the model stopped for real
  # traffic, its own plan re-brakes during the pause, and the corridor
  # gate below disarms the kick entirely while anything occupies the
  # path toward the kick ray.  Three measured iterations on RIP-WCM
  # Hills (75 s horizon, routes ~300 m, expert needs ~60 s):
  #   - 2.5s kick @ 2.0*slow / 2.5s pause: ~0.6 m/s while stalled;
  #     timeouts died at 60% mean route progress, and 73% of the
  #     "collisions" were NPCs ramming a parked hero.
  #   - 4s kick @ 2.5*slow / 1.5s pause: the plan-curvature factor is
  #     the trap -- a standstill plan curls, slow pins at 0.3, and the
  #     kick crawls at 0.75 m/s through its whole window (trace:
  #     12.5 s stuck at <1 m/s with kick active).  Progress at horizon
  #     rose to 70-90% but still timed out.
  #   - This version: UNSCALED 2.5 m/s floor (the kick ray is the
  #     route, already curvature-sane at that speed), 1 s arming,
  #     1 s pause (duty 67% while wedged), and a >12 s-armed creep
  #     escalation under a 4 m probe.
  # Never kicks while red-held at a light.
  new_wait = states.hero_wait
  if stall_recovery:
    slow_now = states.hero_speed < 1.0
    blocked_red = red_held if red_held is not None else jnp.zeros(
        plan.shape[0], bool)
    # Keep counting through an active kick window (the kick itself
    # raises speed above the slow gate; resetting there would abort
    # the window after one step).
    new_wait = jnp.where(
        (slow_now | phase_kick) & ~blocked_red & (states.step > 100),
        states.hero_wait + 1, jnp.int32(0))
    phase = jnp.mod(new_wait, 120)
    kick = (phase > 20) & (phase <= 100)
    # Never kick into an occupied corridor: with benchmark-density
    # traffic the model stops BEHIND QUEUES routinely, and a blind floor
    # after 1 s parked rams the leader.  ``clear_ahead`` comes from
    # the agent's OWN BEV observation (non-privileged — see
    # `bev_clear_toward`), so a kick only fires toward visibly free
    # space.  ESCALATION: after two full cycles without recovery
    # (hero_wait > 280 means 14 s armed — a queue would have moved) the
    # hero is wedged where the 8 m ray clips static geometry (traced:
    # Hills hairpin, kick active, corridor blocked, throttle 0 for
    # 10 s+).  It then creeps at 1.5 m/s under the 4 m probe instead.
    kick_speed = jnp.full(plan.shape[0], 2.5, plan.dtype)
    if clear_ahead is not None:
      wedged = new_wait > 240
      short = clear_short if clear_short is not None else clear_ahead
      gate = jnp.where(wedged, short, clear_ahead)
      kick_speed = jnp.where(wedged, 1.5, kick_speed)
      kick = kick & gate
    # (An angle-scaled kick floor — creep when the route ray demands a
    # hard turn, to cut the off-road share of BusyTown collisions — was
    # A/B-tested and REVERTED: bicycle-model path curvature is
    # speed-independent, so it fixed nothing in BusyTown (45% vs 44%
    # collision) and cost Hills 15 pp of success by slowing hairpin
    # recovery.)
    target_speed = jnp.where(kick, jnp.maximum(target_speed, kick_speed),
                             target_speed)
    setpoint_local = jnp.where(kick[:, None], kick_target, setpoint_local)

  # Ego -> world.
  cos_y = jnp.cos(states.hero_yaw)
  sin_y = jnp.sin(states.hero_yaw)
  target_xy = jnp.stack([
      states.hero_xy[:, 0] + cos_y * setpoint_local[:, 0] -
      sin_y * setpoint_local[:, 1],
      states.hero_xy[:, 1] + sin_y * setpoint_local[:, 0] +
      cos_y * setpoint_local[:, 1],
  ], axis=-1)

  steer, pid_lat = jax.vmap(
      lambda p, xy, yaw, t: dynamics.lateral_control(
          p, xy, yaw, t, world_params.dt))(states.pid_lat,
                                           states.hero_xy,
                                           states.hero_yaw, target_xy)
  # Standstill steering clamp: a queued hero (kick disarmed by the
  # occupied corridor) saturates the lateral PID on a setpoint it cannot
  # reach, and the model's residual throttle pulses then CRAB it
  # sideways — traced on Town01_Straight4: 6 s at v<0.5 with steer
  # pinned +1.00, yaw drifting +0.11 -> +0.55 until a corner clipped
  # the queue neighbour 5.9 m away.  Below 0.5 m/s (and outside a kick
  # window, which needs full steering authority to restart along the
  # route) steering is clamped to +-0.25: enough to hold a lane arc,
  # not enough to walk the car sideways at a standstill.  (A full
  # linear fade-to-zero below 0.7 m/s was A/B-tested and REVERTED: it
  # also killed legitimate creeping junction turns — Town01_Straight
  # 52% -> 41%.)
  if stall_recovery:
    clamped = jnp.clip(steer, -0.25, 0.25)
    steer = jnp.where(kick | (states.hero_speed >= 0.5), steer, clamped)
  if use_brake:
    throttle, brake, pid_lon = jax.vmap(
        lambda p, v, t: dynamics.longitudinal_control_with_brake(
            p, v, t, world_params.dt, brake_deadband=1.0,
            brake_slope=0.25))(states.pid_lon, states.hero_speed,
                               target_speed)
  else:
    throttle, pid_lon = jax.vmap(
        lambda p, v, t: dynamics.longitudinal_control(
            p, v, t, world_params.dt))(states.pid_lon, states.hero_speed,
                                       target_speed)
    brake = jnp.zeros_like(throttle)

  actions = jnp.stack([throttle, steer, brake], axis=-1)
  return actions, states.replace(pid_lat=pid_lat, pid_lon=pid_lon,
                                 hero_wait=new_wait)
