"""CARNOVEL sweep over RIP aggregations and planning-step budgets.

The round-2 experiment evaluated DIM with 20 inner planning steps but RIP
with the library default 10, confounding the DIM-vs-RIP comparison.  This
sweep holds the bridge fixed and varies (algorithm, num_plan_steps) on
the SAME trained ensemble (RUN_OUT/rip/ckpts ensemble-best), including
BCM — which under the reference's swapped WCM/BCM naming (see PARITY.md)
is the paper's actual worst-case-model aggregation.

Writes RUN_OUT/rip_sweep.json.
"""

import json
import os
import time

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_r2")
BRIDGE = json.loads(os.environ.get(
    "RUN_BRIDGE",
    '{"use_brake": true, "curvature_slowdown": true, "speed_gain": 1.2}'))
VARIANTS = json.loads(os.environ.get("RUN_VARIANTS", json.dumps([
    ["dim", 10], ["rip_wcm", 20], ["rip_bcm", 20], ["rip_ma", 20],
])))
NUM_MODELS = int(os.environ.get("RUN_NUM_MODELS", 4))

T0 = time.time()


def log(msg):
  print("[sweep {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def main():
  import jax
  import jax.numpy as jnp
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
  template = jax.tree.map(lambda x: jnp.stack([x] * NUM_MODELS, 0),
                          template_one)
  ckpt = Checkpointer(os.path.join(OUT, "rip", "ckpts"), prefix="ensemble")
  stacked = ckpt.load_named("best", jax.device_get(template))
  log("loaded ensemble-best (K={})".format(NUM_MODELS))

  path = os.path.join(OUT, "rip_sweep.json")
  table = json.load(open(path)) if os.path.exists(path) else {}
  # Cached entries are keyed by (algorithm, steps) only; a changed
  # RUN_BRIDGE does NOT invalidate them — warn instead of silently reusing.
  for name, steps in VARIANTS:
    key = "{}_{}steps".format(name, steps)
    if key in table:
      log("SKIP {} (cached result; rerun with a fresh RUN_OUT or delete "
          "rip_sweep.json if RUN_BRIDGE changed)".format(key))
      continue
    if name == "dim":
      policy = make_dim_policy(model, unstack_params(stacked, 0),
                               num_plan_steps=steps, **BRIDGE)
    else:
      policy = make_rip_policy(model, stacked,
                               algorithm=name.split("_")[1].upper(),
                               num_plan_steps=steps, **BRIDGE)
    log("evaluating {}".format(key))
    evaluate_batched(_TASKS, policy_fn=policy,
                     log_dir=os.path.join(OUT, "carnovel_" + key))
    summary = json.load(open(os.path.join(
        OUT, "carnovel_" + key, "summary.json")))["summary"]
    table[key] = summary
    log("{}: {}".format(key, summary))
    with open(path, "w") as fp:
      json.dump(table, fp, indent=2)
  log("done: {}".format(path))


if __name__ == "__main__":
  main()
