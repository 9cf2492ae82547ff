"""Benchmark evaluation CLI.

Evaluates an agent on CARNOVEL or CoRL2017, writing per-task metrics.csv
(the reference exposed this only programmatically via Benchmark.evaluate).

Run:  python -m oatomobile_tpu.benchmarks.run \
          --benchmark carnovel --agent autopilot --log_dir /tmp/eval \
          [--subtasks AbnormalTurns] [--ckpt ... | --ckpts a b c d]
"""

import argparse
import functools


def _load_dim(ckpt_path):
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.checkpoint import Checkpointer
  import os

  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(
      visual_features=jnp.zeros((1, 100, 100, 2)),
      velocity=jnp.zeros((1, 3)),
      is_at_traffic_light=jnp.zeros((1, 1)),
      traffic_light_state=jnp.zeros((1, 1)),
  )
  template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                        method=model.log_prob, **ctx)
  ckpt_dir, fname = os.path.split(ckpt_path)
  prefix, epoch = fname.rsplit("-", 1)
  epoch = int(epoch.split(".")[0])
  params = Checkpointer(ckpt_dir, prefix=prefix).load(epoch, template)
  return model, params


def make_agent_fn(args):
  if args.agent == "autopilot":
    from oatomobile_tpu.baselines.rulebased import AutopilotAgent
    return functools.partial(AutopilotAgent, noise=args.noise)
  if args.agent == "blind":
    from oatomobile_tpu.baselines.rulebased import BlindAgent
    return BlindAgent
  if args.agent == "dim":
    from oatomobile_tpu.baselines.learned.dim import DIMAgent
    model, params = _load_dim(args.ckpt)
    return functools.partial(DIMAgent, model=model, params=params)
  if args.agent == "cil":
    import jax
    import jax.numpy as jnp
    from oatomobile_tpu.baselines.learned.cil import (BehaviouralModel,
                                                      CILAgent)
    from oatomobile_tpu.utils.checkpoint import Checkpointer
    import os
    model = BehaviouralModel(output_shape=(40, 2))
    ctx = dict(
        visual_features=jnp.zeros((1, 100, 100, 2)),
        velocity=jnp.zeros((1, 3)),
        is_at_traffic_light=jnp.zeros((1, 1)),
        traffic_light_state=jnp.zeros((1, 1)),
        mode=jnp.zeros((1, 1)),
    )
    template = model.init(jax.random.PRNGKey(0), **ctx)
    ckpt_dir, fname = os.path.split(args.ckpt)
    prefix, epoch = fname.rsplit("-", 1)
    params = Checkpointer(ckpt_dir, prefix=prefix).load(
        int(epoch.split(".")[0]), template)
    return functools.partial(CILAgent, model=model, params=params)
  if args.agent == "rip":
    from oatomobile_tpu.baselines.learned.rip import RIPAgent
    models_params = [_load_dim(c) for c in args.ckpts]
    model = models_params[0][0]
    params_list = [p for _, p in models_params]
    return functools.partial(RIPAgent, algorithm=args.algorithm,
                             model=model, params_list=params_list)
  raise ValueError("unknown agent {}".format(args.agent))


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--benchmark", choices=("carnovel", "corl2017"),
                      default="carnovel")
  parser.add_argument("--agent",
                      choices=("autopilot", "blind", "dim", "cil", "rip"),
                      default="autopilot")
  parser.add_argument("--log_dir", required=True)
  parser.add_argument("--subtasks", default=None)
  parser.add_argument("--noise", type=float, default=0.0)
  parser.add_argument("--ckpt", default=None)
  parser.add_argument("--ckpts", nargs="*", default=None)
  parser.add_argument("--algorithm", default="WCM",
                      choices=("WCM", "MA", "BCM"))
  parser.add_argument("--monitor", action="store_true")
  parser.add_argument("--cpu", action="store_true",
                      help="force the CPU backend (fast compiles)")
  args = parser.parse_args()

  if args.cpu:
    from oatomobile_tpu.utils.platform import force_cpu
    force_cpu()

  if args.benchmark == "carnovel":
    from oatomobile_tpu.benchmarks import carnovel as bench
  else:
    from oatomobile_tpu.benchmarks import corl2017 as bench

  bench.evaluate(
      make_agent_fn(args),
      log_dir=args.log_dir,
      monitor=args.monitor,
      subtasks_id=args.subtasks,
  )


if __name__ == "__main__":
  main()
