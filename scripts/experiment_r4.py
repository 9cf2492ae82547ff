"""Round-4 learned-agent experiment: retrain on HEAD-expert data whose
traffic-density mix matches the benchmarks, then regenerate the complete
agent tables (CARNOVEL + CoRL2017, multi-episode CIs, per-family).

Addresses VERDICT round-3 items 1-3: the round-3 tables predate five
driving-quality commits (edd4f29..9455971) AND the round-4 traffic
changes, so every number is re-measured at HEAD; the training data is
re-collected with the FINAL expert; and the collection mix now includes
56- and 100-vehicle Town01 episodes because every benchmark task runs
100-vehicle traffic (round 3 trained on <= 24 vehicles — the students
had never seen a queue at benchmark density).

Phases are resumable: each writes its artifact and is skipped when the
artifact exists.  Knobs via env vars.  Writes OUT/tables.json.
"""

import json
import os
import time

import numpy as np

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/root/r4/exp")
EP_STEPS = int(os.environ.get("RUN_EP_STEPS", 500))
NOISE = float(os.environ.get("RUN_NOISE", 0.2))
EPOCHS = int(os.environ.get("RUN_EPOCHS", 40))
BATCH = int(os.environ.get("RUN_BATCH", 512))
NUM_MODELS = int(os.environ.get("RUN_NUM_MODELS", 4))
# Microbatching: the ~5 GB device-resident dataset + K=4 backward at
# batch 512 exceeds 16 GB HBM; 2x256 is the identical Adam step at half
# the activation memory.
ACCUM = int(os.environ.get("RUN_ACCUM", 2))
EPISODES = int(os.environ.get("RUN_EPISODES", 10))       # CARNOVEL
CORL_EPISODES = int(os.environ.get("RUN_CORL_EPISODES", 3))
# (num_vehicles, num_episodes) collection mix.  Benchmarks run 100-vehicle
# traffic; half the data now comes from dense scenes so car-following,
# queueing and junction yields are IN distribution for the students.
MIX = json.loads(os.environ.get(
    "RUN_MIX", "[[0, 384], [8, 512], [24, 512], [56, 640], [100, 768]]"))
CHUNK = int(os.environ.get("RUN_CHUNK", 128))
BRIDGE = json.loads(os.environ.get(
    "RUN_BRIDGE",
    '{"use_brake": true, "curvature_slowdown": true, "speed_gain": 1.2}'))
CARNOVEL_POLICIES = [p for p in os.environ.get(
    "RUN_POLICIES",
    "autopilot,cil,dim,rip_wcm,rip_ma,rip_bcm").split(",") if p]
CORL_POLICIES = [p for p in os.environ.get(
    "RUN_CORL_POLICIES", "autopilot,cil,dim,rip_wcm").split(",") if p]
TABLES = os.environ.get("RUN_TABLES", "tables.json")

T0 = time.time()


def log(msg):
  print("[r4 {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def collect(packed):
  from oatomobile_tpu.datasets.carla import CARLADataset

  if CARLADataset.is_packed(packed):
    log("dataset exists: {}".format(packed))
    return
  parts = []
  for mix_i, (nv, eps) in enumerate(MIX):
    part = os.path.join(OUT, "pack_v{}".format(nv))
    parts.append(part)
    if CARLADataset.is_packed(part):
      continue
    log("collect {} eps x {} steps, {} vehicles, noise={}".format(
        eps, EP_STEPS, nv, NOISE))
    n = CARLADataset.collect_packed(
        town="Town01", output_dir=part, num_episodes=eps,
        num_steps=EP_STEPS, num_vehicles=nv, noise=NOISE,
        seed=1000 * (mix_i + 1), chunk_episodes=CHUNK,
        image_size=(100, 100))
    log("  -> {} samples".format(n))
  total = CARLADataset.merge_packed(parts, packed)
  log("merged dataset: {} samples".format(total))


def train(packed):
  from oatomobile_tpu.baselines.learned.cil.train import train as cil_train
  from oatomobile_tpu.baselines.learned.rip.train import train as rip_train
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  rip_ckpt = Checkpointer(os.path.join(OUT, "rip", "ckpts"),
                          prefix="ensemble")
  if not rip_ckpt.has_named("best"):
    log("train RIP K={}, {} epochs, batch {}".format(NUM_MODELS, EPOCHS,
                                                     BATCH))
    rip_train(packed, os.path.join(OUT, "rip"), num_models=NUM_MODELS,
              batch_size=BATCH, num_epochs=EPOCHS, grad_accum=ACCUM)
  else:
    log("ensemble-best exists")

  cil_ckpt = Checkpointer(os.path.join(OUT, "cil", "ckpts"))
  if not cil_ckpt.has_named("best"):
    log("train CIL, {} epochs, batch {}".format(EPOCHS, BATCH))
    cil_train(packed, os.path.join(OUT, "cil"), batch_size=BATCH,
              num_epochs=EPOCHS)
  else:
    log("cil-best exists")


def _policies():
  """name -> lazily constructed batched policy (None = autopilot)."""
  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.baselines.learned.cil.policy import make_cil_policy
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.baselines.learned.rip.policy import make_rip_policy
  from oatomobile_tpu.baselines.learned.rip.train import unstack_params
  from oatomobile_tpu.models.cil import BehaviouralModel
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  dim_model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  one = dim_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                       method=dim_model.log_prob, **ctx)
  template = jax.tree.map(lambda x: jnp.stack([x] * NUM_MODELS, 0), one)
  stacked = Checkpointer(os.path.join(OUT, "rip", "ckpts"),
                         prefix="ensemble").load_named(
                             "best", jax.device_get(template))

  cil_model = BehaviouralModel(output_shape=(40, 2))
  cil_ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
                 velocity=jnp.zeros((1, 3)),
                 is_at_traffic_light=jnp.zeros((1, 1)),
                 traffic_light_state=jnp.zeros((1, 1)),
                 mode=jnp.zeros((1, 1)))
  cil_template = cil_model.init(jax.random.PRNGKey(0), **cil_ctx)
  cil_params = Checkpointer(os.path.join(OUT, "cil", "ckpts")).load_named(
      "best", jax.device_get(cil_template))

  return {
      "autopilot": lambda: None,
      "cil": lambda: make_cil_policy(cil_model, cil_params, **BRIDGE),
      "dim": lambda: make_dim_policy(dim_model, unstack_params(stacked, 0),
                                     num_plan_steps=20, **BRIDGE),
      "rip_wcm": lambda: make_rip_policy(dim_model, stacked,
                                         algorithm="WCM",
                                         num_plan_steps=20, **BRIDGE),
      "rip_ma": lambda: make_rip_policy(dim_model, stacked, algorithm="MA",
                                        num_plan_steps=20, **BRIDGE),
      "rip_bcm": lambda: make_rip_policy(dim_model, stacked,
                                         algorithm="BCM",
                                         num_plan_steps=20, **BRIDGE),
  }


def evaluate():
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  from oatomobile_tpu.benchmarks.carnovel.benchmark import (
      _TASKS as CARNOVEL_TASKS)
  from oatomobile_tpu.benchmarks.corl2017.benchmark import (
      _TASKS as CORL_TASKS)

  factories = _policies()
  table = {}
  path = os.path.join(OUT, TABLES)
  if os.path.exists(path):
    table = json.load(open(path))

  suites = (
      [("carnovel", CARNOVEL_TASKS, EPISODES, n) for n in CARNOVEL_POLICIES]
      + [("corl2017", CORL_TASKS, CORL_EPISODES, n) for n in CORL_POLICIES])
  for suite, tasks, episodes, name in suites:
    key = "{}_{}".format(suite, name)
    log_dir = os.path.join(OUT, key)
    if os.path.exists(os.path.join(log_dir, "summary.json")):
      summary = json.load(open(os.path.join(log_dir,
                                            "summary.json")))["summary"]
      table.setdefault(suite, {})[name] = summary
      continue
    log("evaluating {} ({} episodes/task)".format(key, episodes))
    evaluate_batched(tasks, policy_fn=factories[name](), log_dir=log_dir,
                     num_episodes=episodes, seed=7)
    summary = json.load(open(os.path.join(log_dir,
                                          "summary.json")))["summary"]
    table.setdefault(suite, {})[name] = summary
    log("{}: success {:.1%} +- {:.1%} | collision {:.1%} | timeout {:.1%}"
        .format(key, summary["success_rate"], summary["success_ci95"],
                summary["collision_rate"], summary["timeout_rate"]))
    with open(path, "w") as fp:
      json.dump(table, fp, indent=2)
  log("done: {}".format(path))


def main():
  os.makedirs(OUT, exist_ok=True)
  packed = os.path.join(OUT, "packed")
  collect(packed)
  train(packed)
  evaluate()


if __name__ == "__main__":
  main()
