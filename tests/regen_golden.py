"""Regenerates the golden replay file after an INTENTIONAL behaviour
change in the world model.  Run from the repo root:

  python tests/regen_golden.py
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from oatomobile_tpu.maps import load_town  # noqa: E402
from oatomobile_tpu.sim import init_scene, make_params, rollout  # noqa: E402


def main() -> None:
  town = load_town("Town02")
  params = make_params(town)
  state = init_scene(town, spawn_point=3, destination=40, num_vehicles=4,
                     jax_seed=123)
  T = 120
  t = np.arange(T)
  actions = np.stack([
      0.6 * np.ones(T),
      0.3 * np.sin(t / 15.0),
      np.where((t > 60) & (t < 70), 1.0, 0.0),
  ], axis=-1).astype(np.float32)
  final, traj = jax.jit(lambda p, s, a: rollout(p, s, a))(
      params, state, jnp.asarray(actions))
  out = os.path.join(os.path.dirname(__file__), "data",
                     "golden_replay_town02.npz")
  np.savez_compressed(
      out,
      actions=actions,
      hero_xy=np.asarray(traj.hero_xy),
      hero_yaw=np.asarray(traj.hero_yaw),
      hero_speed=np.asarray(traj.hero_speed),
      collision=np.asarray(traj.collision),
      lane_invasion=np.asarray(traj.lane_invasion),
      npc_xy_final=np.asarray(final.npc_xy),
  )
  print("regenerated", out)


if __name__ == "__main__":
  main()
