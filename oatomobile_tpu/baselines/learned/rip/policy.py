"""Fully in-graph RIP driving policy for batched rollouts.

The ensemble counterpart of dim/policy.py: BEV synthesis -> K-model
imitation posteriors (stacked-params vmap) -> WCM/MA/BCM-aggregated
inner-loop planning -> setpoint PID, all inside the compiled step.
Thousands of RIP agents drive closed-loop in one `lax.scan` — the
reference evaluated ONE RIP agent at wall-clock seconds per step
(rip/agent.py:109-137: K sequential model passes per optimisation step,
per frame).

Control bridge semantics: baselines/learned/bridge.py.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.baselines.learned import bridge
from oatomobile_tpu.baselines.learned.rip.agent import rip_plan
from oatomobile_tpu.models.dim import ImitativeModel
from oatomobile_tpu.sensors import synth
from oatomobile_tpu.sim.types import SceneState, WorldParams

_OBS_KEYS = ("lidar", "velocity", "is_at_traffic_light",
             "traffic_light_state", "goal")


def make_rip_policy(model: ImitativeModel,
                    stacked_params,
                    *,
                    algorithm: str = "WCM",
                    num_plan_steps: int = 10,
                    lr: float = 1e-1,
                    epsilon: float = 1.0,
                    setpoint_frac: float = 0.5,
                    use_brake: bool = True,
                    curvature_slowdown: bool = True,
                    warmup_floor: float = 20.0 / 3.6,
                    speed_gain: float = 1.0,
                    encoder_dtype: str = "float32"):
  """Returns `policy(world_params, states) -> (actions [B,3], states)`."""

  def policy(world_params: WorldParams,
             states: SceneState) -> Tuple[jnp.ndarray, SceneState]:
    obs = jax.vmap(
        lambda s: synth.synthesize(world_params, s, _OBS_KEYS))(states)
    sample = model.transform({"lidar": obs["lidar"]})
    context = dict(
        visual_features=sample["visual_features"],
        velocity=obs["velocity"],
        is_at_traffic_light=obs["is_at_traffic_light"][:, None].astype(
            jnp.float32),
        traffic_light_state=obs["traffic_light_state"][:, None].astype(
            jnp.float32),
    )
    goal = obs["goal"][..., :2]

    plan = rip_plan(model, stacked_params, goal, context,
                    algorithm=algorithm, num_steps=num_plan_steps, lr=lr,
                    epsilon=epsilon, encoder_dtype=encoder_dtype)

    red_held = ((obs["is_at_traffic_light"] > 0.5) &
                (obs["traffic_light_state"] < 1.5))  # red/yellow held
    return bridge.plan_to_action(
        world_params, states, plan, setpoint_frac=setpoint_frac,
        use_brake=use_brake, curvature_slowdown=curvature_slowdown,
        warmup_floor=warmup_floor, goal=goal, speed_gain=speed_gain,
        red_held=red_held, bev=obs["lidar"])

  return policy
