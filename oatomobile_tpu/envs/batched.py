"""The native batched environment — the rebuild's core value proposition.

Where the reference runs ONE env against ONE CARLA server over RPC
(SURVEY.md §2.3: no parallelism of any kind), `BatchedEnv` runs N scenes as
a single compiled computation: `vmap` over the scene axis, `lax.scan` over
time for on-device rollouts, auto-reset inside the graph, and optional
`jax.sharding.Mesh` placement so the scene batch rides ICI across chips.

The single-scene `CARLAEnv` (envs/carla.py) is the API-parity adapter; this
class is what training/evaluation at scale should use.
"""

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.maps import load_town
from oatomobile_tpu.parallel import mesh as mesh_lib
from oatomobile_tpu.sensors import synth
from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                make_params, world_step)
from oatomobile_tpu.sim.types import SceneState
from oatomobile_tpu.simulators.tpu import defaults


class BatchedEnv:
  """N-way vectorised driving environment on a device mesh."""

  def __init__(
      self,
      town: str,
      batch_size: int,
      sensors: Sequence[str] = synth.STATE_SENSORS,
      num_vehicles: int = 0,
      num_pedestrians: int = 0,
      fps: int = defaults.SIMULATOR_FPS,
      max_episode_steps: int = 1500,
      route_capacity: int = 512,
      route_pool: Optional[int] = None,
      seed: int = 0,
      mesh=None,
      auto_reset: bool = True,
  ) -> None:
    """Args:
      route_pool: unused, kept for backwards compatibility — the native
        batched BFS planner makes per-scene unique routes free.
      mesh: optional `jax.sharding.Mesh`; scene state is sharded over its
        data axis, map parameters replicated.
    """
    del route_pool
    self._town = load_town(town)
    self._params = make_params(self._town, fps=fps)
    self._batch_size = int(batch_size)
    self._sensors = tuple(sorted(set(sensors)))
    self._max_episode_steps = int(max_episode_steps)
    self._auto_reset = auto_reset
    self._mesh = mesh

    batched = init_scene_batch(
        self._town,
        batch_size,
        num_vehicles=num_vehicles,
        num_pedestrians=num_pedestrians,
        route_capacity=route_capacity,
        seed=seed,
    )

    if mesh is not None:
      batched = mesh_lib.shard_batch(mesh, batched)
      self._params = mesh_lib.replicate(mesh, self._params)
    self._initial = batched
    # Live state is a copy: step/rollout donate their input buffers, and the
    # pristine initial state must survive for on-device auto-resets.
    self._state = jax.tree.map(jnp.copy, batched)

    self._step_fn = None
    self._rollout_cache: Dict = {}

  # -- properties ---------------------------------------------------------

  @property
  def batch_size(self) -> int:
    return self._batch_size

  @property
  def params(self):
    return self._params

  @property
  def state(self) -> SceneState:
    return self._state

  # -- core semantics -------------------------------------------------------

  def _done(self, state: SceneState) -> jnp.ndarray:
    """Per-scene done: collision, horizon, or destination reached."""
    reached = jnp.linalg.norm(state.hero_xy - state.destination_xy,
                              axis=-1) < 7.5
    return ((state.collision > 0.0) |
            (state.step >= self._max_episode_steps) | reached)

  def _reset_where_done(self, initial: SceneState, state: SceneState,
                        done: jnp.ndarray) -> SceneState:
    """On-device auto-reset: scenes flagged done restart from their initial
    state with a fresh RNG stream.

    ``initial`` MUST be a traced argument of the enclosing jit — closure
    capture would bake megabytes of initial state into the HLO as
    constants, which blows up compile times superlinearly in batch size.
    """
    # Fold from the LIVE rng so reset streams chain: folding from
    # initial.rng would hand any scene whose episodes always end at the
    # same step count (fixed horizon, deterministic collision) the same key
    # every time, replaying one episode forever.
    fresh = jax.vmap(jax.random.fold_in)(state.rng, state.step)

    def pick(init_leaf, live_leaf):
      d = done.reshape(done.shape + (1,) * (live_leaf.ndim - 1))
      return jnp.where(d, init_leaf, live_leaf)

    reset_state = jax.tree.map(pick, initial, state)
    new_rng = jnp.where(done[:, None], fresh, state.rng)
    return reset_state.replace(rng=new_rng)

  def _compile_step(self):
    sensors = self._sensors
    auto_reset = self._auto_reset

    def fused(params, initial, state, actions):
      new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(params, state,
                                                             actions)
      done = self._done(new_state)
      obs = jax.vmap(synth.synthesize,
                     in_axes=(None, 0, None))(params, new_state, sensors)
      if auto_reset:
        new_state = self._reset_where_done(initial, new_state, done)
      return new_state, obs, done

    self._step_fn = jax.jit(fused, static_argnums=(), donate_argnums=(2,))

  # -- public API ------------------------------------------------------------

  def reset(self) -> Dict[str, jnp.ndarray]:
    self._state = jax.tree.map(jnp.copy, self._initial)
    obs = jax.jit(jax.vmap(synth.synthesize, in_axes=(None, 0, None)),
                  static_argnums=(2,))(self._params, self._state,
                                       self._sensors)
    return obs

  def step(self, actions) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Steps all scenes; returns (obs dict of [N, ...], done [N])."""
    if self._step_fn is None:
      self._compile_step()
    actions = jnp.asarray(actions)
    self._state, obs, done = self._step_fn(self._params, self._initial,
                                           self._state, actions)
    return obs, done

  def rollout(
      self,
      num_steps: int,
      policy: Optional[Callable] = None,
      collect: Sequence[str] = (),
      compute: Sequence[str] = (),
      collect_transform: Optional[Callable] = None,
  ):
    """On-device closed-loop rollout: `lax.scan` over time of the full
    (policy -> step -> auto-reset) loop; nothing touches the host.

    Args:
      num_steps: scan length (static).
      policy: `(params, state) -> (action [N,3], state)`; defaults to the
        in-graph autopilot expert.
      collect: observation keys stacked over time and returned
        ([T, N, ...] each) — leave empty for pure throughput.
      compute: observation keys synthesised every step but NOT stored —
        their checksum feeds `stats["obs_checksum"]` so XLA cannot
        dead-code-eliminate them.  Use for honest sensor-in-the-loop
        throughput benchmarks (storing 1024 BEV images x T steps would
        blow HBM).
      collect_transform: optional fn applied to the per-step obs dict
        BEFORE stacking over time — e.g. resize + uint8-quantise image
        modalities so the [T, N, ...] stack fits HBM (a 128-scene x
        500-step float32 200x200 BEV stack alone is ~20 GB; at 100x100
        uint8 it is 1.3 GB).

    Returns:
      (final_state, collected dict, episode_stats dict).
    """
    # The cache holds a strong reference to `policy` (stored in the value),
    # so an id() can never be recycled by a new policy while its compiled
    # rollout is alive.
    key = (num_steps, tuple(collect), tuple(compute),
           None if policy is None else id(policy),
           None if collect_transform is None else id(collect_transform))
    if key not in self._rollout_cache:
      sensors = tuple(collect)
      computed = tuple(compute)
      auto_reset = self._auto_reset

      if policy is None:
        def policy_fn(params, state):
          return jax.vmap(
              lambda s: autopilot_policy(params, s, noise=0.0))(state)
      else:
        policy_fn = policy

      # NOTE: params/initial are traced arguments of `run`, never closure
      # constants — capturing them would bake ~20 MB of map rasters into
      # the HLO and make compile times superlinear in batch size.
      def run(params, initial, state):

        def body(carry, _):
          state, stats = carry
          actions, state = policy_fn(params, state)
          new_state = jax.vmap(world_step,
                               in_axes=(None, 0, 0))(params, state, actions)
          done = self._done(new_state)
          checksum = stats["obs_checksum"]
          if computed:
            obs_c = jax.vmap(synth.synthesize,
                             in_axes=(None, 0, None))(params, new_state,
                                                      computed)
            for v in obs_c.values():
              checksum = checksum + jnp.sum(
                  v.astype(jnp.float32).reshape(v.shape[0], -1), axis=-1)
          stats = {
              "episodes": stats["episodes"] + done.astype(jnp.int32),
              "collisions": stats["collisions"] +
                            (new_state.collision > 0).astype(jnp.int32),
              "distance": stats["distance"] +
                          jnp.linalg.norm(new_state.hero_xy - state.hero_xy,
                                          axis=-1),
              "obs_checksum": checksum,
          }
          out = ()
          if sensors:
            obs = jax.vmap(synth.synthesize,
                           in_axes=(None, 0, None))(params, new_state,
                                                    sensors)
            if collect_transform is not None:
              obs = collect_transform(obs)
            out = obs
          if auto_reset:
            new_state = self._reset_where_done(initial, new_state, done)
          return (new_state, stats), out

        stats0 = {
            "episodes": jnp.zeros(self._batch_size, jnp.int32),
            "collisions": jnp.zeros(self._batch_size, jnp.int32),
            "distance": jnp.zeros(self._batch_size, jnp.float32),
            "obs_checksum": jnp.zeros(self._batch_size, jnp.float32),
        }
        (final, stats), collected = jax.lax.scan(body, (state, stats0), None,
                                                 length=num_steps)
        return final, collected, stats

      self._rollout_cache[key] = (policy, collect_transform,
                                  jax.jit(run, donate_argnums=(2,)))

    _, _, run_fn = self._rollout_cache[key]
    final, collected, stats = run_fn(self._params, self._initial,
                                     self._state)
    self._state = final
    return final, collected, stats
