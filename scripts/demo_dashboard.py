"""Records a dashboard GIF of a CARNOVEL episode.

The human-facing rendering demo (role of the reference's pygame
dashboard, utils/graphics.py:204-382): front camera + bird view + LIDAR
splat + state HUD per frame, written by MonitorWrapper.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/demo_dashboard.py \
          [--task Roundabouts0-v0] [--steps 300] [--out /tmp/dashboard.gif]
"""

import argparse
import os


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--task", default="Roundabouts0-v0")
  parser.add_argument("--steps", type=int, default=300)
  parser.add_argument("--out", default="/tmp/dashboard.gif")
  parser.add_argument("--every", type=int, default=4,
                      help="record every Nth frame (20 Hz sim -> 5 Hz gif)")
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()
  if args.cpu:
    from oatomobile_tpu.utils.platform import force_cpu
    force_cpu()

  from oatomobile_tpu.baselines.rulebased.autopilot.agent import (
      AutopilotAgent)
  from oatomobile_tpu.benchmarks.carnovel.benchmark import CARNOVEL
  from oatomobile_tpu.core.loop import EnvironmentLoop
  from oatomobile_tpu.core.rl import MonitorWrapper

  benchmark = CARNOVEL()
  env = benchmark.load(args.task, max_episode_steps=args.steps)
  env = MonitorWrapper(env, output_fname=args.out, render_mode="human",
                       record_every=args.every)
  loop = EnvironmentLoop(agent_fn=AutopilotAgent, environment=env)
  loop.run()
  print("wrote", args.out, os.path.getsize(args.out), "bytes")


if __name__ == "__main__":
  main()
