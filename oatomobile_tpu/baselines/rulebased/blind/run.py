"""Runs the blind agent closed-loop in a CARLAEnv.

Parity: /root/reference/oatomobile/baselines/rulebased/blind/run.py:74-123.

Run:  python -m oatomobile_tpu.baselines.rulebased.blind.run --town Town01
"""

import argparse

import oatomobile_tpu  # noqa: F401  (enables the compilation cache)
from oatomobile_tpu.baselines.rulebased.blind.agent import BlindAgent
from oatomobile_tpu.core.loop import EnvironmentLoop
from oatomobile_tpu.core.rl import (FiniteHorizonWrapper, LiveViewWrapper,
                                    ReturnsMetric, StepsMetric)
from oatomobile_tpu.envs.carla import (CARLAEnv, CollisionsMetric,
                                       DistanceMetric, LaneInvasionsMetric)


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--town", default="Town01")
  parser.add_argument("--num_steps", type=int, default=200)
  parser.add_argument("--num_vehicles", type=int, default=0)
  parser.add_argument("--num_pedestrians", type=int, default=0)
  parser.add_argument("--live", action="store_true",
                      help="show the multi-sensor dashboard live (~5 Hz) "
                           "while the episode runs")
  parser.add_argument("--cpu", action="store_true",
                      help="force the CPU backend (fast compiles)")
  args = parser.parse_args()

  if args.cpu:
    from oatomobile_tpu.utils.platform import force_cpu
    force_cpu()

  env = CARLAEnv(
      town=args.town,
      num_vehicles=args.num_vehicles,
      num_pedestrians=args.num_pedestrians,
      sensors=("goal", "velocity"),
  )
  env = FiniteHorizonWrapper(env, max_episode_steps=args.num_steps)
  if args.live:
    env = LiveViewWrapper(env)
  metrics = [
      StepsMetric(),
      ReturnsMetric(),
      CollisionsMetric(),
      LaneInvasionsMetric(),
      DistanceMetric(),
  ]
  results = EnvironmentLoop(
      agent_fn=BlindAgent,
      environment=env,
      metrics=metrics,
  ).run()
  print(results)


if __name__ == "__main__":
  main()
