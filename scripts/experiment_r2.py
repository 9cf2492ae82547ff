"""Round-2 learned-agent experiment: scaled mixed-traffic expert data ->
RIP ensemble (val-selected best checkpoint) -> CARNOVEL agent comparison.

Phases are resumable: each writes its artifact and is skipped when the
artifact exists.  Knobs via env vars.  Writes OUT/agents_summary.json.
"""

import json
import os
import time

import numpy as np

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_r2")
EP_STEPS = int(os.environ.get("RUN_EP_STEPS", 500))
NOISE = float(os.environ.get("RUN_NOISE", 0.2))
EPOCHS = int(os.environ.get("RUN_EPOCHS", 80))
BATCH = int(os.environ.get("RUN_BATCH", 512))
# (num_vehicles, num_episodes) collection mix: hazard-free cruising,
# moderate traffic, dense traffic.
MIX = json.loads(os.environ.get("RUN_MIX", "[[0, 64], [8, 128], [24, 64]]"))
BRIDGE = json.loads(os.environ.get(
    "RUN_BRIDGE",
    '{"use_brake": true, "curvature_slowdown": true, "speed_gain": 1.2}'))
POLICIES = os.environ.get(
    "RUN_POLICIES", "autopilot,dim,rip_wcm,rip_ma").split(",")

T0 = time.time()


def log(msg):
  print("[r2 {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def collect(packed):
  from oatomobile_tpu.baselines.learned.dim.train import MODALITIES
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
        seed=1000 * (mix_i + 1), chunk_episodes=16)
    log("  -> {} samples".format(n))
  total = CARLADataset.merge_packed(parts, packed)
  log("merged dataset: {} samples".format(total))


def train(packed):
  from oatomobile_tpu.baselines.learned.rip.train import train as rip_train
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  ckpt_dir = os.path.join(OUT, "rip", "ckpts")
  ckpt = Checkpointer(ckpt_dir, prefix="ensemble")
  if ckpt.has_named("best"):
    log("ensemble-best exists")
    return
  log("train RIP K=4, {} epochs, batch {}".format(EPOCHS, BATCH))
  rip_train(packed, os.path.join(OUT, "rip"), num_models=4,
            batch_size=BATCH, num_epochs=EPOCHS)
  records = [json.loads(l) for l in open(
      os.path.join(OUT, "rip", "logs", "rip_train.jsonl"))]
  log("train loss: {} -> {}; best val {}".format(
      round(records[0]["loss"], 2), round(records[-1]["loss"], 2),
      round(min(r.get("val_loss", np.inf) for r in records), 2)))


def evaluate():
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
  template_stacked = jax.tree.map(
      lambda x: jnp.stack([x] * 4, 0), template_one)
  ckpt = Checkpointer(os.path.join(OUT, "rip", "ckpts"), prefix="ensemble")
  if ckpt.has_named("best"):
    stacked = ckpt.load_named("best", jax.device_get(template_stacked))
    log("loaded ensemble-best")
  else:
    stacked = ckpt.load(ckpt.latest_epoch(), jax.device_get(template_stacked))
    log("loaded ensemble epoch {}".format(ckpt.latest_epoch()))

  factories = {
      "autopilot": lambda: None,
      "dim": lambda: make_dim_policy(model, unstack_params(stacked, 0),
                                     num_plan_steps=20, **BRIDGE),
      "rip_wcm": lambda: make_rip_policy(model, stacked, algorithm="WCM",
                                         **BRIDGE),
      "rip_ma": lambda: make_rip_policy(model, stacked, algorithm="MA",
                                        **BRIDGE),
      "rip_bcm": lambda: make_rip_policy(model, stacked, algorithm="BCM",
                                         **BRIDGE),
  }

  table = {}
  summary_path = os.path.join(OUT, "agents_summary.json")
  if os.path.exists(summary_path):
    table = json.load(open(summary_path))
  for name in POLICIES:
    log("evaluating {}".format(name))
    evaluate_batched(_TASKS, policy_fn=factories[name](),
                     log_dir=os.path.join(OUT, "carnovel_" + name))
    summary = json.load(open(
        os.path.join(OUT, "carnovel_" + name, "summary.json")))["summary"]
    table[name] = summary
    log("{}: {}".format(name, summary))
    with open(summary_path, "w") as fp:
      json.dump(table, fp, indent=2)
  log("done: {}".format(summary_path))


def main():
  os.makedirs(OUT, exist_ok=True)
  packed = os.path.join(OUT, "packed")
  collect(packed)
  train(packed)
  evaluate()


if __name__ == "__main__":
  main()
