"""Traffic: signal phases, background-vehicle policy, pedestrians.

Replaces CARLA's server-side traffic manager (``actor.set_autopilot(True)``
at /root/reference/oatomobile/utils/carla.py:293) and walker AI with fully
vectorised in-graph policies: every NPC follows the lane-waypoint graph with
pure-pursuit steering, proportional speed control, car-following and
red-light compliance — all as gathers + elementwise math over the fixed
capacity ``[K]`` axis.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.sim.types import SceneState, WorldParams
from oatomobile_tpu.sim import dynamics

# CARLA TrafficLightState integer codes (observable via the reference's
# `traffic_light_state` sensor, simulator.py:925-971):
TL_RED, TL_YELLOW_STATE, TL_GREEN, TL_OFF, TL_UNKNOWN = 0, 1, 2, 3, 4

# Upcoming lane waypoints (~2 m apart) each NPC checks for path blockers.
PATH_LOOKAHEAD = 6


def traffic_light_states(params: WorldParams,
                         time: jnp.ndarray) -> jnp.ndarray:
  """Returns the CARLA-coded state of every light at ``time``: [L] i32.

  Two phase groups alternate: group 0 runs green->yellow while group 1 is
  red, then they swap.  Per-junction offsets stagger the cycles.
  """
  g, y = params.tl_green, params.tl_yellow
  half = g + y
  cycle = 2.0 * half
  tl_offset = params.map["tl_offset"]
  tl_group = params.map["tl_group"]
  phase = jnp.mod(time + tl_offset + tl_group.astype(jnp.float32) * half,
                  cycle)
  return jnp.where(phase < g, TL_GREEN,
                   jnp.where(phase < half, TL_YELLOW_STATE, TL_RED))


def light_for_waypoint(params: WorldParams, wp: jnp.ndarray,
                       tl_states: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
  """(is_governed, state) for the light governing waypoint ``wp``.

  State is TL_UNKNOWN where no light governs the waypoint.
  """
  tl_id = params.map["wp_tl"][wp]
  governed = tl_id >= 0
  num_lights = tl_states.shape[0]
  if num_lights == 0:
    return jnp.zeros_like(governed), jnp.full_like(tl_id, TL_UNKNOWN)
  state = tl_states[jnp.clip(tl_id, 0, num_lights - 1)]
  return governed, jnp.where(governed, state, TL_UNKNOWN)


def _advance_waypoint(params: WorldParams, xy: jnp.ndarray, wp: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
  """Advances an NPC's target waypoint once it is reached; ``u`` in [0,1)
  picks among junction successors (random turn choice)."""
  wp_xy = params.map["wp_xy"][wp]
  reached = jnp.linalg.norm(wp_xy - xy, axis=-1) < 3.0
  num_next = params.map["wp_num_next"][wp]
  pick = jnp.minimum((u * num_next.astype(jnp.float32)).astype(jnp.int32),
                     num_next - 1)
  successors = params.map["wp_next"][wp]
  nxt = jnp.take_along_axis(successors, pick[..., None], axis=-1)[..., 0]
  # NPC-restricted roads (narrow hairpin passes): re-pick the next branch
  # up to twice; if every branch is restricted, proceed anyway (never
  # strand a vehicle).
  for bump in (1, 2):
    alt = jnp.take_along_axis(
        successors, ((pick + bump) % jnp.maximum(num_next, 1))[..., None],
        axis=-1)[..., 0]
    nxt = jnp.where(params.map["wp_npc_ok"][nxt], nxt, alt)
  return jnp.where(reached, nxt, wp)


def npc_step(params: WorldParams, state: SceneState,
             tl_states: jnp.ndarray, rng: jnp.ndarray) -> SceneState:
  """Advances all background vehicles one tick."""
  K = state.num_npcs
  if K == 0:
    return state
  xy, yaw, speed = state.npc_xy, state.npc_yaw, state.npc_speed
  alive = state.npc_alive

  # 1. Waypoint target management (random turns at junctions).
  u = jax.random.uniform(rng, (K,))
  wp = _advance_waypoint(params, xy, state.npc_wp, u)
  target = params.map["wp_xy"][wp]

  # 2. Pure-pursuit steering towards the target waypoint.
  to_t = target - xy
  desired = jnp.arctan2(to_t[..., 1], to_t[..., 0])
  err = jnp.arctan2(jnp.sin(desired - yaw), jnp.cos(desired - yaw))
  steer = jnp.clip(1.5 * err, -1.0, 1.0)

  # 3. Speed: limit, curvature slowdown, car-following, red lights, hero.
  # Heterogeneous drivers: each NPC slot gets a fixed speed factor in
  # [0.75, 1.25] (deterministic golden-ratio stride — no extra state), so
  # traffic is a mix of slow and pushy vehicles instead of a uniform
  # platoon (the reference's CARLA traffic manager randomises per-vehicle
  # target speeds server-side).
  factor = 0.75 + 0.5 * jnp.mod(jnp.arange(K, dtype=jnp.float32) * 0.618034,
                                1.0)
  target_speed = jnp.minimum(params.npc_target_speed * factor,
                             params.map["wp_speed_limit"][wp])
  # Curvature slow-down with LOOKAHEAD: the max of the current heading
  # error and the upcoming bend (heading change over the next ~3
  # waypoints, first-successor chain).  Without the lookahead an NPC
  # enters a hairpin at cruise, cannot shed speed mid-bend (proportional
  # decel), understeers wide into the oncoming lane, and sideswipes
  # whoever is rounding the bend the other way — measured as the cause of
  # every remaining autopilot collision on the Hills switchback.  Mirrors
  # the hero autopilot's upcoming-route-curvature brake (sim/autopilot.py).
  # The chain is static per map, so it is precomputed per waypoint
  # (maps/assets.py wp_bend): one gather replaces seven.
  bend = params.map["wp_bend"][wp]
  target_speed = target_speed * jnp.clip(
      1.0 - jnp.maximum(jnp.abs(err), 0.7 * bend), 0.3, 1.0)

  # Car-following + intercept prediction: stop for any alive vehicle (or
  # the hero) that is in a lane-wide forward corridor NOW or will be in
  # ~1 s under constant velocity (catches crossing traffic at junctions,
  # which a position-only check sees too late).  All-pairs, NPC frame.
  other_xy = jnp.concatenate([xy, state.hero_xy[None]], axis=0)  # [K+1, 2]
  heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
  other_vel = jnp.concatenate([
      speed[:, None] * heading,
      state.hero_vel[None, :] if state.hero_vel.ndim == 1 else
      state.hero_vel[None],
  ], axis=0)
  self_vel = speed[:, None] * heading
  rel = other_xy[None, :, :] - xy[:, None, :]                    # [K, K+1, 2]
  rel_vel = other_vel[None, :, :] - self_vel[:, None, :]
  cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
  other_alive = jnp.concatenate([alive, jnp.ones((1,), bool)], axis=0)
  not_self = ~jnp.eye(K, K + 1, dtype=bool)

  def fwd_lat(r):
    fwd = cos_y[:, None] * r[..., 0] + sin_y[:, None] * r[..., 1]
    lat = -sin_y[:, None] * r[..., 0] + cos_y[:, None] * r[..., 1]
    return fwd, lat

  # Heading / speed relations [K, K+1].
  other_yaw = jnp.concatenate([yaw, state.hero_yaw[None]], axis=0)
  other_speed = jnp.concatenate([speed, state.hero_speed[None]], axis=0)
  moving_j = (other_speed > 0.5)[None, :]
  cos_rel = jnp.cos(other_yaw[None, :] - yaw[:, None])
  rel_fut = rel + rel_vel * 1.0
  fwd_now, lat_now = fwd_lat(rel)
  fwd_fut, lat_fut = fwd_lat(rel_fut)

  # PATH-AWARE blocking: unlike box-corridor heuristics (which freeze
  # serpentines on false oncoming positives and miss curved-lane leaders),
  # each NPC checks other vehicles against its actual upcoming LANE
  # waypoints (~12 m ahead along wp_next).  A vehicle within 2.2 m of any
  # of those centerline points is physically on the path.
  # The chain of upcoming lane points is static per map and precomputed
  # (maps/assets.py wp_path_xy): ONE [K, L, 2] gather replaces
  # PATH_LOOKAHEAD dependent wp_next/wp_xy walks per vehicle per step.
  dist_all = jnp.linalg.norm(rel, axis=-1)  # [K, K+1]
  p_xy = params.map["wp_path_xy"][wp]                    # [K, L, 2]
  d = jnp.linalg.norm(other_xy[None, None, :, :] - p_xy[:, :, None, :],
                      axis=-1)                           # [K, L, K+1]
  on_my_path = jnp.any(d < 2.2, axis=1)                  # [K, K+1]
  # Hero column, exact: distance from my path centerline to the hero's
  # RECTANGLE, not its center.  A hero stopped perpendicular-ish at a
  # junction mouth extends ~2.4 m from its center; the 2.2 m center test
  # leaves its corners invisible, measured as the dominant CoRL2017
  # collision (turning NPC sweeps into the stationary hero's front corner).
  # Point-to-OBB over [K, L] only — the NPC-NPC columns keep the cheap
  # center test.
  rel_h = p_xy - state.hero_xy[None, None, :]            # [K, L, 2]
  ch, sh = jnp.cos(state.hero_yaw), jnp.sin(state.hero_yaw)
  hx = ch * rel_h[..., 0] + sh * rel_h[..., 1]
  hy = -sh * rel_h[..., 0] + ch * rel_h[..., 1]
  dxh = jnp.maximum(jnp.abs(hx) - params.vehicle.length / 2.0, 0.0)
  dyh = jnp.maximum(jnp.abs(hy) - params.vehicle.width / 2.0, 0.0)
  hero_on_path = jnp.any(jnp.hypot(dxh, dyh) < 1.6, axis=1)  # [K]
  on_my_path = on_my_path.at[:, K].max(hero_on_path)
  on_my_path = on_my_path & (fwd_now > -1.0)             # not behind me

  # Right of way: the hero first, then lower slot index.  A MOVING or
  # very-close vehicle on my path always blocks; a STOPPED one further out
  # blocks only if it has priority — that asymmetry breaks the symmetric
  # stop-and-wait deadlocks at junctions (exactly one party proceeds).
  j_idx = jnp.arange(K + 1)[None, :]
  k_idx = jnp.arange(K)[:, None]
  has_priority = (j_idx == K) | (j_idx < k_idx)
  blocked_now = on_my_path & (moving_j | has_priority | (dist_all < 6.0))
  # Imminent head-on (apex cutters at hairpins): CREEP AND EVADE rather
  # than stop — a full stop leaves two vehicles nose-to-nose forever (the
  # measured Hills* stand-off), while steering away at walking pace lets
  # them squeeze past.
  head_on_close = ((cos_rel < -0.5) & (fwd_now > 0.0) & (fwd_now < 7.0) &
                   (jnp.abs(lat_now) < 2.6) & other_alive[None, :] &
                   not_self)

  # Predictive intercept for fast crossing traffic (position-only path
  # checks see a 5 m/s crosser ~1 s out; this doubles the margin).  Only
  # toward priority vehicles or same-direction leaders — symmetric
  # pre-yielding deadlocks junctions.  Oncoming passers (opposite heading,
  # laterally offset now and at the prediction) are excluded: on tight
  # curves they dip into the prediction cone and froze whole serpentines.
  same_dir = cos_rel > 0.5
  oncoming_passer = ((cos_rel < -0.5) & moving_j &
                     (jnp.abs(lat_now) > 1.2) & (jnp.abs(lat_fut) > 1.0))
  # Gap acceptance (mirrors sim/autopilot.py): the crosser's ~1 s
  # predicted position is compared against MY predicted position (fwd
  # advances by speed*1s) — a stopped NPC is not held by crossers that
  # will pass well ahead of it, and a moving one is warned about the
  # conflict its future self will actually meet.
  fwd_gap = fwd_fut - speed[:, None] * 1.0
  intercept = ((fwd_gap > -2.0) & (fwd_gap < 5.5) &
               (jnp.abs(lat_fut) < 2.0 + 0.15 * jnp.maximum(fwd_fut, 0.0)) &
               moving_j)
  blocked_fut = intercept & ~oncoming_passer & (same_dir | has_priority)
  # Graded car-following: a MOVING or predicted-crossing body on my path
  # is a hard stop, but a STOPPED one is a queue to close up on under a
  # brake-when-needed rule: full brake exactly while current speed
  # exceeds the braking envelope v^2 > 2 a (d - 6) toward a stop point
  # 6 m center-to-center (~1 m bumper gap) behind the blocker, and
  # always inside 6 m.  Speed-CAP variants (linear taper, envelope as
  # target) were measured to rear-end hazard-braking heroes — the
  # proportional controller rides ~2 m/s above any cap it tracks, so the
  # brake decision must compare against CURRENT speed, with target 0 and
  # therefore full P authority.  Binary path-stops (the previous rule)
  # left every queue slot ~12 m long and cost hero episodes ~450 of 1500
  # steps parked behind sparse stop-and-go queues.
  valid = other_alive[None, :] & not_self
  # Same-direction MOVERS on my path are a platoon to follow under the
  # envelope, exactly like stopped queues — a binary stop behind a
  # crawling leader turns every slow platoon into stop-and-go (the
  # Town02@100 census: 261 of 528 stalled NPCs were hard-stopped behind
  # a mover, most of them same-direction).  Crossing/oncoming movers and
  # predicted intercepts remain hard stops: they clear on their own.
  cross_mover = on_my_path & moving_j & ~same_dir & valid
  follow_target = (blocked_now & ~moving_j & valid) | \
      (on_my_path & moving_j & same_dir & valid)
  d_masked = jnp.where(follow_target, dist_all, 1e9)        # [K, K+1]
  d_q = jnp.min(d_masked, axis=-1)
  # Inside the 6 m floor the brake holds only while actually CLOSING on
  # the leader (mirrors sim/autopilot.py — zero leader-speed credit in
  # the approach envelope; the half-credit variant was measured and
  # rejected, Town02 collisions 4.0% -> 29.3%).
  other_speed = jnp.concatenate([speed, state.hero_speed[None]], axis=0)
  v_leader = jnp.where(d_q < 1e8,
                       other_speed[jnp.argmin(d_masked, axis=-1)],
                       jnp.float32(0.0))
  closing = speed > v_leader - 0.3
  queue_stop = (speed * speed > 2.0 * 2.0 * jnp.maximum(d_q - 6.0, 0.0)) | \
      ((d_q < 6.0) & closing)
  # MOVER stops (assertable after a patient wait, mirrors
  # sim/autopilot.py): crossing movers on the path + predicted
  # intercepts, immediate full brake.  The asserting form yields just
  # short of the first conflicted path point under a graded envelope at
  # creep speed; distance-graded braking WITHOUT the creep cap was
  # measured twice and rejected (T-bones / junction-mouth knots).
  mover_hard = jnp.any(cross_mover | (blocked_fut & valid), axis=-1)
  first_l = jnp.argmax(d < 2.2, axis=1)                  # [K, K+1]
  d_conf = jnp.where(jnp.any(d < 2.2, axis=1),
                     2.0 * (first_l.astype(jnp.float32) + 1.0), 1e9)
  d_cross = jnp.where(cross_mover, jnp.minimum(d_conf, dist_all), 1e9)
  d_hazard = jnp.min(d_cross, axis=-1)                   # [K]
  graded_hard = (speed * speed >
                 2.0 * 2.5 * jnp.maximum(d_hazard - 4.5, 0.0)) | \
      (d_hazard < 4.5)
  # Don't block the box: while still OUTSIDE a junction whose interior is
  # on my path, hold at the entry whenever a STOPPED body sits anywhere
  # on that path — stopping 6 m short of it (the queue rule) would park
  # me INSIDE the box across crossing lanes.  Traced on Town02@100
  # vehicles: 434 of 542 stalled NPCs sat in mutual blocking CYCLES
  # seeded by box-parked vehicles; gating entry prevents the knots from
  # forming.
  at_junction = params.map["wp_is_junction"][wp]
  box_ahead = jnp.any(params.map["wp_path_junction"][wp], axis=-1)
  stopped_on_path = jnp.any(on_my_path & ~moving_j & valid, axis=-1)
  box_hold = ~at_junction & box_ahead & stopped_on_path

  governed, tl_state = light_for_waypoint(params, wp, tl_states)
  red = governed & (tl_state != TL_GREEN)

  # Patience-based yield assertion (mirrors sim/autopilot.py): after
  # ~3-4.5 s held at a yield by moving cross traffic, creep in at
  # <= 1.5 m/s under the graded envelope — the crossers' own hazard
  # rules yield to the now-moving body.  Thresholds are staggered per
  # slot (golden-ratio stride) so whole queues don't assert in lockstep.
  # Red lights and queue/box rules are never asserted through.
  # NPC patience at 3-4.5 s (halved, matching the hero's A/B) was
  # measured and REJECTED: Town02x3 collisions 4.9% -> 8.0% with
  # timeouts flat (41.8% -> 41.3%) — lockstep-asserting NPCs trade
  # junction waits for junction conflicts.  6-9 s stands.
  static_stop = queue_stop | box_hold
  patience = (120.0 + 60.0 * jnp.mod(
      jnp.arange(K, dtype=jnp.float32) * 0.618034, 1.0)).astype(jnp.int32)
  asserting = state.npc_wait > patience
  effective_hard = jnp.where(asserting, graded_hard, mover_hard)
  blocked = effective_hard | static_stop
  # Leaky patience (mirrors sim/autopilot.py): accumulate while
  # mover-held below creep speed, pause at reds/queues, decay 5x when
  # moving — a reset-to-zero counter never fires in breathing
  # stop-and-go traffic.
  held = mover_hard & (speed < 1.5) & ~static_stop & ~red
  pause = (static_stop | red) & (speed < 1.5)
  npc_wait = jnp.where(
      (asserting & mover_hard) | held,
      jnp.minimum(state.npc_wait + 1, jnp.int32(100000)),
      jnp.where(pause, state.npc_wait,
                jnp.maximum(state.npc_wait - 5, jnp.int32(0))))

  conflict = jnp.any(head_on_close, axis=-1)
  evade = -jnp.sign(jnp.sum(jnp.where(head_on_close, jnp.sign(lat_now), 0.0),
                            axis=-1))
  steer = jnp.clip(steer + jnp.where(conflict, 0.6 * evade, 0.0), -1.0, 1.0)
  target_speed = jnp.where(
      blocked | red, 0.0,
      jnp.where(conflict | (asserting & mover_hard),
                jnp.minimum(target_speed, 1.5), target_speed))

  # 4. Proportional accel -> pseudo throttle/brake -> bicycle step.
  accel_cmd = jnp.clip(1.2 * (target_speed - speed), -params.vehicle.max_brake,
                       params.vehicle.max_accel)
  throttle = jnp.clip(accel_cmd / params.vehicle.max_accel, 0.0, 1.0)
  brake = jnp.clip(-accel_cmd / params.vehicle.max_brake, 0.0, 1.0)
  new_xy, new_yaw, new_speed = dynamics.bicycle_step(
      xy, yaw, speed, throttle, steer, brake, params.vehicle, params.dt)

  # Tow-away: a vehicle fully stalled for > ~45 s (not at a red) while
  # INSIDE a junction is despawned.  Circular static waits (each member
  # stopped for the next one's body) are deadlocks by design -- stopped
  # blockers are never asserted through -- and one knot at a junction
  # mouth otherwise plugs the network for the rest of the episode
  # (measured: BusyTown7/9 timed out 90% of episodes with the whole
  # 5-way junction gridlocked, scripts/diag_busytown_viz.py).  Dead
  # NPCs are excluded from collisions, hazards and sensors everywhere
  # (events.py:88, synth.py, ops/bev.py), so this removes the body.
  # Thresholds staggered per slot so a knot dissolves one tow at a
  # time; red-held queues (including queues backed up through a box)
  # are exempt via the ~red gate.
  # Leaky stall integrator: breathing knots inch forward every few
  # seconds, so a consecutive-steps counter never reaches any sane
  # threshold (measured max 313 over a fully gridlocked episode).
  # Accumulate while crawling, decay 5x while flowing.
  # Signal-queue exemption (ADVICE r4): the per-waypoint governed zone
  # covers only the last ~5 m of each approach, so `red` alone exempts
  # just the front 1-2 vehicles — followers 3+ cars back at a saturated
  # light netted positive stall over slow-discharge cycles and were
  # towed while legitimately queued.  wp_tl_ahead (maps/assets.py) names
  # the light governing any waypoint in the next ~40 m of lane; while it
  # is non-green the wait is a signal queue, not a jam, and the
  # integrator pauses.  While it is GREEN but the queue still cannot
  # move (spillback through the junction), stall accumulates at
  # half-cycle rate, so genuine standing jams near lights still dissolve
  # — at ~2x the time constant.
  num_lights = tl_states.shape[0]
  tl_ahead = params.map["wp_tl_ahead"][wp]
  if num_lights:
    red_ahead = (tl_ahead >= 0) & (
        tl_states[jnp.clip(tl_ahead, 0, num_lights - 1)] != TL_GREEN)
  else:
    red_ahead = jnp.zeros((K,), bool)
  stalled = alive & (speed < 0.5) & ~red & ~red_ahead
  npc_stall = jnp.where(
      stalled, state.npc_stall + 1,
      jnp.maximum(state.npc_stall - 5, jnp.int32(0)))
  tow_after = (300.0 + 100.0 * jnp.mod(
      jnp.arange(K, dtype=jnp.float32) * 0.618034, 1.0)).astype(jnp.int32)
  # Second tier: standing jams ANYWHERE dissolve after ~2x the junction
  # threshold.  Town02@100 diagnostic (scripts/diag_town02.py at r4 HEAD):
  # 20.9% of the network stalled at t=1500 and 78/99 hero timeouts were
  # slow-moving queues at 75% route progress — the knots that seed them
  # are not always inside a junction polygon (mid-block box-parked chains,
  # junction-mouth spillback one car short of the box).
  # Hero-blocked exemption (ADVICE r4): a vehicle held directly by the
  # HERO's body on its path keeps its queue semantics — benchmarks must
  # see traffic pile up behind a stopped hero (CARLA never despawns
  # stalled actors), so direct hero blockers are never second-tier
  # towed.  Deeper followers (blocked by a blocked NPC) remain towable
  # after ~60-80 s net stall; that residual divergence from CARLA is
  # accepted and documented here.
  hero_blocking = on_my_path[:, K]
  towed = (at_junction & (npc_stall > tow_after)) | \
      (~hero_blocking & (npc_stall > 2 * tow_after))
  alive = alive & ~towed

  # Dead NPCs stay frozen.
  new_xy = jnp.where(alive[:, None], new_xy, xy)
  new_yaw = jnp.where(alive, new_yaw, yaw)
  new_speed = jnp.where(alive, new_speed, 0.0)
  return state.replace(npc_xy=new_xy, npc_yaw=new_yaw, npc_speed=new_speed,
                       npc_wp=wp, npc_wait=npc_wait, npc_stall=npc_stall,
                       npc_alive=alive)


def pedestrian_step(params: WorldParams, state: SceneState,
                    rng: jnp.ndarray) -> SceneState:
  """Random-walk pedestrians constrained near the sidewalk band."""
  P = state.num_pedestrians
  if P == 0:
    return state
  speed = 1.4  # m/s walking speed
  turn = jax.random.normal(rng, (P,)) * 0.3
  new_yaw = state.ped_yaw + turn
  heading = jnp.stack([jnp.cos(new_yaw), jnp.sin(new_yaw)], axis=-1)
  cand = state.ped_xy + params.dt * speed * heading
  # Reject moves into buildings: sample the obstacle raster and bounce.
  origin = params.map["raster_origin"]
  ppm = params.map["raster_ppm"]
  H, W = params.map["obstacle_mask"].shape
  idx = jnp.round((cand - origin) * ppm).astype(jnp.int32)
  ix = jnp.clip(idx[..., 0], 0, H - 1)
  iy = jnp.clip(idx[..., 1], 0, W - 1)
  hit = params.map["obstacle_mask"][ix, iy]
  new_xy = jnp.where(hit[:, None], state.ped_xy, cand)
  new_yaw = jnp.where(hit, new_yaw + jnp.pi, new_yaw)
  alive = state.ped_alive
  new_xy = jnp.where(alive[:, None], new_xy, state.ped_xy)
  return state.replace(ped_xy=new_xy, ped_yaw=new_yaw)
