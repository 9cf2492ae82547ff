"""Scaled DIM training run: large collected dataset -> packed -> trained
model -> CARNOVEL evaluation with the learned policy.

Writes OUT/summary.json.
"""

import json
import os
import time

import numpy as np

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_run")
EPISODES = int(os.environ.get("RUN_EPISODES", 96))
EP_STEPS = int(os.environ.get("RUN_EP_STEPS", 400))
NOISE = float(os.environ.get("RUN_NOISE", 0.1))
EPOCHS = int(os.environ.get("RUN_EPOCHS", 40))
BATCH = int(os.environ.get("RUN_BATCH", 256))

T0 = time.time()


def log(msg):
  print("[run {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def main():
  os.makedirs(OUT, exist_ok=True)
  raw = os.path.join(OUT, "raw")
  processed = os.path.join(OUT, "processed")
  packed = os.path.join(OUT, "packed")
  summary = {}

  from oatomobile_tpu.baselines.learned.dim.train import MODALITIES
  from oatomobile_tpu.datasets.carla import CARLADataset

  if not CARLADataset.is_packed(packed):
    # Collect in chunks to bound device/host memory.
    chunk = 24
    done = 0
    while done < EPISODES:
      n = min(chunk, EPISODES - done)
      log("collect chunk {} ({} eps x {} steps, noise={})".format(
          done // chunk, n, EP_STEPS, NOISE))
      CARLADataset.collect_batched(
          town="Town01", output_dir=raw, num_episodes=n,
          num_steps=EP_STEPS, num_vehicles=8, seed=100 + done, noise=NOISE)
      done += n
    log("process")
    CARLADataset.process(raw, processed, num_frame_skips=5)
    log("pack")
    n = CARLADataset.pack(processed, packed, MODALITIES)
    summary["num_samples"] = n
    log("dataset: {} samples".format(n))

  from oatomobile_tpu.baselines.learned.dim.train import train
  log("train {} epochs batch {}".format(EPOCHS, BATCH))
  state = train(packed, os.path.join(OUT, "dim"), batch_size=BATCH,
                num_epochs=EPOCHS, use_mesh=False, plot_every=10,
                resume=True)
  records = [json.loads(l) for l in open(
      os.path.join(OUT, "dim", "logs", "dim_train.jsonl"))]
  summary["train_losses"] = [round(r["loss"], 2) for r in records]
  log("losses: {}".format(summary["train_losses"][-8:]))

  # CARNOVEL with the trained DIM (batched eval).
  import jax
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.models.dim import ImitativeModel

  model = ImitativeModel(output_shape=(4, 2))
  params = jax.device_get(state.params)
  policy = make_dim_policy(model, params, num_plan_steps=20)

  log("CARNOVEL eval with trained DIM")
  evaluate_batched(_TASKS, policy_fn=policy,
                   log_dir=os.path.join(OUT, "carnovel_dim"))
  dim_summary = json.load(
      open(os.path.join(OUT, "carnovel_dim", "summary.json")))["summary"]
  summary["carnovel_dim"] = dim_summary
  log("DIM CARNOVEL: {}".format(dim_summary))

  with open(os.path.join(OUT, "summary.json"), "w") as fp:
    json.dump(summary, fp, indent=2)
  log("done")


if __name__ == "__main__":
  main()
