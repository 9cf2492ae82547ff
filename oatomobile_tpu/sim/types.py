"""World-model pytrees: static parameters and per-scene state.

Architectural inversion of the reference: where CARLA keeps world state in a
C++ server behind RPC (/root/reference/oatomobile/utils/carla.py:103-116),
here the world *is* a pytree (`SceneState`) and the step is a pure function
over it — compiled once, `vmap`-ed over scenes and sharded over chips.

All shapes are static: fixed NPC/pedestrian capacities with alive-masks,
fixed route capacity with saturation padding.
"""

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VehicleSpec:
  """Kinematic-bicycle parameters calibrated to CARLA-like behaviour
  (mustang hero, generic traffic): full-throttle 0-50 km/h in ~5 s, top
  speed ~90 km/h, brake decel ~8 m/s^2."""
  length: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(4.7))
  width: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
  wheelbase: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(2.85))
  max_steer_rad: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.785398))  # 45 deg at |steer|=1
  max_accel: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(3.5))   # m/s^2 at full throttle
  max_brake: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(8.0))   # m/s^2 at full brake
  drag: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.0054))  # v^2 drag coefficient
  roll: jnp.ndarray = struct.field(
      default_factory=lambda: jnp.float32(0.1))   # rolling resistance m/s^2


@struct.dataclass
class WorldParams:
  """Static world configuration: map arrays + scalar knobs.

  ``map`` is the dict produced by ``TownMap.device_arrays()``.  Capacities
  (NPC count, pedestrian count, route length) are implied by array shapes in
  ``SceneState`` — they are compile-time constants.
  """
  map: Dict[str, Any]
  vehicle: VehicleSpec
  dt: jnp.ndarray                       # simulation delta seconds (1/fps)
  npc_target_speed: jnp.ndarray         # m/s for background traffic
  tl_green: jnp.ndarray                 # traffic light phase durations (s)
  tl_yellow: jnp.ndarray
  # Hazard thresholds (reference autopilot/agent.py:50-52).
  proximity_vehicle_threshold: jnp.ndarray  # 10 m
  proximity_tlight_threshold: jnp.ndarray   # 5 m
  # STATIC per-town rect budgets (pytree_node=False -> compile-time
  # constants): how many wall / road-corridor rects the BEV splat must
  # select to cover its range.  Measured per town at build time — grid
  # towns need ~14/8, roundabout towns ~26/18; paying the worst case
  # everywhere costs ~40% of step throughput.
  wall_budget: int = struct.field(pytree_node=False, default=24)
  road_budget: int = struct.field(pytree_node=False, default=16)


PID_WINDOW = 30  # CARLA's controller keeps a 30-sample error deque.


@struct.dataclass
class PIDState:
  """Sliding error window + previous error for one PID controller.

  CARLA's PIDLateral/LongitudinalController integrate a bounded
  ``deque(maxlen=30)`` of recent errors — NOT an unbounded accumulator.
  That distinction is load-bearing: with a true integrator, a vehicle
  parked at a red light with a slightly off-axis setpoint winds the
  lateral term to saturation and restarts at full steering lock
  (measured: the dominant learned-agent crash mode before this change).
  With the window, the integral term flushes within 30 ticks (1.5 s)
  of the error dropping.
  """
  err_buf: jnp.ndarray    # [..., PID_WINDOW] f32, ring of recent errors
  prev_error: jnp.ndarray

  @classmethod
  def zero(cls) -> "PIDState":
    return cls(err_buf=jnp.zeros((PID_WINDOW,), jnp.float32),
               prev_error=jnp.float32(0.0))

  @classmethod
  def zero_batch(cls, batch_size: int) -> "PIDState":
    return cls(err_buf=jnp.zeros((batch_size, PID_WINDOW), jnp.float32),
               prev_error=jnp.zeros((batch_size,), jnp.float32))


@struct.dataclass
class SceneState:
  """Complete dynamic state of one scene (one hero + traffic)."""

  # --- Hero -------------------------------------------------------------
  hero_xy: jnp.ndarray        # [2] f32
  hero_yaw: jnp.ndarray       # []  f32 radians
  hero_speed: jnp.ndarray     # []  f32 m/s (forward, >= 0)
  hero_vel: jnp.ndarray       # [2] f32 world-frame velocity (derived)
  hero_accel: jnp.ndarray     # [2] f32 world-frame acceleration (derived)
  hero_yaw_rate: jnp.ndarray  # []  f32 rad/s (derived)
  hero_control: jnp.ndarray   # [3] f32 last applied (throttle, steer, brake)
  hero_wp: jnp.ndarray        # []  i32 nearest waypoint id

  # --- Route ------------------------------------------------------------
  route: jnp.ndarray          # [R] i32 waypoint ids (padded w/ destination)
  route_len: jnp.ndarray      # []  i32
  route_pos: jnp.ndarray      # []  i32 current progress index
  destination_xy: jnp.ndarray  # [2] f32

  # --- Background vehicles (fixed capacity K, alive-masked) -------------
  npc_xy: jnp.ndarray         # [K, 2] f32
  npc_yaw: jnp.ndarray        # [K]    f32
  npc_speed: jnp.ndarray      # [K]    f32
  npc_wp: jnp.ndarray         # [K]    i32 target waypoint
  npc_alive: jnp.ndarray      # [K]    bool

  # --- Pedestrians (fixed capacity P) ------------------------------------
  ped_xy: jnp.ndarray         # [P, 2] f32
  ped_yaw: jnp.ndarray        # [P]    f32
  ped_alive: jnp.ndarray      # [P]    bool

  # --- Clock / events -----------------------------------------------------
  time: jnp.ndarray           # [] f32 seconds since episode start
  step: jnp.ndarray           # [] i32
  collision: jnp.ndarray      # [] f32 impulse intensity this step (0 = none)
  lane_invasion: jnp.ndarray  # [] i32 lane invasions fired this step
  off_lane_prev: jnp.ndarray  # [] bool hero was outside its lane last step
  red_light_invasion: jnp.ndarray  # [] i32 ran-a-red events this step
  at_red_prev: jnp.ndarray    # [] bool hero was held at a red last step

  # --- Driver patience (yield-assertion counters) -------------------------
  # Consecutive steps a driver has been held at a yield by MOVING cross
  # traffic; past a threshold the driver asserts priority and creeps in
  # (sim/autopilot.py / sim/traffic.py).  Saturated unsignalised junctions
  # otherwise never gap and correct yielding degenerates to a timeout.
  hero_wait: jnp.ndarray      # [] i32
  npc_wait: jnp.ndarray       # [K] i32
  # Consecutive steps an NPC has been fully stalled (speed < 0.3) while
  # not held at a red light.  Past ~45 s inside a junction the vehicle
  # is towed away (despawned): circular static waits -- A stopped for
  # B's body, B for C's, C for A's -- are deadlocks BY DESIGN (stopped
  # blockers are never asserted through), and a knot at a junction
  # mouth otherwise plugs the network for the rest of the episode
  # (scripts/diag_busytown_viz.py).  CARLA's traffic manager handles
  # stuck vehicles the same way (teleport/destroy).
  npc_stall: jnp.ndarray      # [K] i32

  # --- Agent-side controller state (autopilot / setpoint PID) -----------
  pid_lat: PIDState
  pid_lon: PIDState

  # --- RNG ---------------------------------------------------------------
  rng: jnp.ndarray            # jax PRNG key

  @property
  def num_npcs(self) -> int:
    return self.npc_xy.shape[-2]

  @property
  def num_pedestrians(self) -> int:
    return self.ped_xy.shape[-2]

  @property
  def route_capacity(self) -> int:
    return self.route.shape[-1]
