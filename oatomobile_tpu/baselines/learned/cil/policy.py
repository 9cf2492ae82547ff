"""Fully in-graph CIL driving policy for batched rollouts.

The conditional-imitation counterpart of dim/policy.py: BEV synthesis ->
command (mode) from goal geometry -> BehaviouralModel plan -> setpoint
PID, all inside the compiled step.  Parity with the reference CILAgent
closed loop (baselines/torch/cil/agent.py:28-97) at batched scale.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.baselines.learned import bridge
from oatomobile_tpu.models.cil import BehaviouralModel
from oatomobile_tpu.sensors import synth
from oatomobile_tpu.sim.types import SceneState, WorldParams

_OBS_KEYS = ("lidar", "velocity", "is_at_traffic_light",
             "traffic_light_state", "goal")


def mode_from_goal_jnp(goal: jnp.ndarray) -> jnp.ndarray:
  """[B] command labels from goal endpoints [B, K, 2] (signed-angle
  variant of the reference rule — see common.mode_from_goal for the
  reference's conflicting definitions)."""
  end = goal[:, -1]
  norm = jnp.linalg.norm(end, axis=-1)
  theta = jnp.degrees(jnp.arctan2(end[:, 1], end[:, 0]))
  mode = jnp.where(theta > 15.0, 3.0, jnp.where(theta < -15.0, 2.0, 0.0))
  return jnp.where(norm < 3.0, 1.0, mode)


def make_cil_policy(model: BehaviouralModel,
                    model_params,
                    *,
                    setpoint_frac: float = 0.5,
                    use_brake: bool = True,
                    curvature_slowdown: bool = True,
                    warmup_floor: float = 20.0 / 3.6,
                    speed_gain: float = 1.0):
  """Returns `policy(world_params, states) -> (actions [B,3], states)`."""

  def policy(world_params: WorldParams,
             states: SceneState) -> Tuple[jnp.ndarray, SceneState]:
    obs = jax.vmap(
        lambda s: synth.synthesize(world_params, s, _OBS_KEYS))(states)
    sample = model.transform({"lidar": obs["lidar"]})
    goal = obs["goal"][..., :2]
    mode = mode_from_goal_jnp(goal)
    context = dict(
        visual_features=sample["visual_features"],
        velocity=obs["velocity"],
        is_at_traffic_light=obs["is_at_traffic_light"][:, None].astype(
            jnp.float32),
        traffic_light_state=obs["traffic_light_state"][:, None].astype(
            jnp.float32),
        mode=mode[:, None],
    )
    plan40 = model.apply(model_params, **context)  # [B, 40, 2] @ 0.1 s
    # Downsample to the bridge's 1 s spacing (points at 1, 2, 3, 4 s) so
    # plan_to_action's setpoint/target-speed geometry matches DIM's.
    plan = plan40[:, 9::10]

    red_held = ((obs["is_at_traffic_light"] > 0.5) &
                (obs["traffic_light_state"] < 1.5))  # red/yellow held
    return bridge.plan_to_action(
        world_params, states, plan, setpoint_frac=setpoint_frac,
        use_brake=use_brake, curvature_slowdown=curvature_slowdown,
        warmup_floor=warmup_floor, goal=goal, speed_gain=speed_gain,
        red_held=red_held, bev=obs["lidar"])

  return policy
