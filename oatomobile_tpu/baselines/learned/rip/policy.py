"""Fully in-graph RIP driving policy for batched rollouts.

The ensemble counterpart of dim/policy.py: BEV synthesis -> K-model
imitation posteriors (stacked-params vmap) -> WCM/MA/BCM-aggregated
inner-loop planning -> setpoint PID, all inside the compiled step.
Thousands of RIP agents drive closed-loop in one `lax.scan` — the
reference evaluated ONE RIP agent at wall-clock seconds per step
(rip/agent.py:109-137: K sequential model passes per optimisation step,
per frame).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from oatomobile_tpu.baselines.learned.rip.agent import rip_plan
from oatomobile_tpu.models.dim import ImitativeModel
from oatomobile_tpu.sensors import synth
from oatomobile_tpu.sim import dynamics
from oatomobile_tpu.sim.types import SceneState, WorldParams

_OBS_KEYS = ("lidar", "velocity", "is_at_traffic_light",
             "traffic_light_state", "goal")
_SETPOINT_FRAC = 0.5
_PLAN_DT = 1.0  # seconds between downsampled plan points


def make_rip_policy(model: ImitativeModel,
                    stacked_params,
                    *,
                    algorithm: str = "WCM",
                    num_plan_steps: int = 10,
                    lr: float = 1e-1,
                    epsilon: float = 1.0,
                    setpoint_frac: float = 0.5):
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
                    epsilon=epsilon)

    # Tracked setpoint: interpolated between plan[0] (~1 s ahead) and
    # plan[1].  Shorter lookaheads destabilise the lateral PID (measured:
    # 64/64 crashes at 0.4x plan[0]); this matches the reference's
    # interpolated index-5 setpoint.
    setpoint_local = ((1.0 - setpoint_frac) * plan[:, 0] +
                      setpoint_frac * plan[:, 1])
    # Physically-correct target speed: consecutive plan points are
    # _PLAN_DT apart (future 80 steps @20 Hz downsampled to 4).  The
    # reference's interpolated-buffer formula commands 2x this and closed
    # loop runs away to 3x (out-of-distribution velocities beget larger
    # predicted displacements) — measured 17.7 m/s vs the 5.56 m/s
    # expert.  Deviation documented in PARITY.md.
    target_speed = jnp.linalg.norm(plan[:, 1] - plan[:, 0],
                                   axis=-1) / _PLAN_DT
    limit = world_params.map["wp_speed_limit"][states.hero_wp]
    target_speed = jnp.minimum(target_speed, limit)
    target_speed = jnp.where(states.step <= 100,
                             jnp.maximum(target_speed, 20.0 / 3.6),
                             target_speed)

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
    throttle, pid_lon = jax.vmap(
        lambda p, v, t: dynamics.longitudinal_control(
            p, v, t, world_params.dt))(states.pid_lon, states.hero_speed,
                                       target_speed)
    actions = jnp.stack([throttle, steer, jnp.zeros_like(throttle)],
                        axis=-1)
    return actions, states.replace(pid_lat=pid_lat, pid_lon=pid_lon)

  return policy
