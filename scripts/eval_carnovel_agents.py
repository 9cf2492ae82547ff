"""CARNOVEL agent comparison: autopilot vs DIM vs RIP (WCM/MA).

Reproduces the reference paper's core experiment (arXiv:2006.14911) on the
TPU-native stack: Town01-trained imitative models evaluated under the
CARNOVEL distribution shift, with RIP's ensemble aggregation on top.
Writes OUT/agents_summary.json.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_run")
ENSEMBLE_CKPT_DIR = os.path.join(OUT, "rip", "ckpts")

T0 = time.time()


def log(msg):
  print("[eval {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def main():
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.baselines.learned.rip.policy import make_rip_policy
  from oatomobile_tpu.baselines.learned.rip.train import unstack_params
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  template_one = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                            method=model.log_prob, **ctx)

  ckpt = Checkpointer(ENSEMBLE_CKPT_DIR, prefix="ensemble")
  epoch = ckpt.latest_epoch()
  template_stacked = jax.tree.map(
      lambda x: jnp.stack([x] * 4, 0), template_one)
  stacked = ckpt.load(epoch, jax.device_get(template_stacked))
  log("loaded ensemble epoch {}".format(epoch))

  policies = {
      "autopilot": None,
      "dim": make_dim_policy(model, unstack_params(stacked, 0),
                             num_plan_steps=20),
      "rip_wcm": make_rip_policy(model, stacked, algorithm="WCM"),
      "rip_ma": make_rip_policy(model, stacked, algorithm="MA"),
  }

  table = {}
  for name, policy in policies.items():
    log("evaluating {}".format(name))
    evaluate_batched(_TASKS, policy_fn=policy,
                     log_dir=os.path.join(OUT, "carnovel_" + name))
    summary = json.load(open(
        os.path.join(OUT, "carnovel_" + name, "summary.json")))["summary"]
    table[name] = summary
    log("{}: {}".format(name, summary))

  with open(os.path.join(OUT, "agents_summary.json"), "w") as fp:
    json.dump(table, fp, indent=2)
  log("done")


if __name__ == "__main__":
  main()
