"""On-device train-in-the-loop imitation learning (DAgger-style).

Alternates entirely on one chip, no external simulator:

  1. COLLECT: vmapped expert rollouts -> packed training data
     (fresh scenes each round; the expert is the in-graph autopilot);
  2. TRAIN: DIM NLL epochs on the aggregate dataset (resume=True keeps
     optimiser state across rounds);
  3. EVALUATE: closed-loop batched rollout of the *learned* policy.

This is the workflow the BASELINE north star names ("fully on-device
train-in-the-loop imitation learning") — the reference needs a CARLA
server per env and host round-trips for every step of it.

Run: PYTHONPATH=. python scripts/train_in_the_loop.py
Env: LOOP_ROUNDS, LOOP_EPISODES, LOOP_EPOCHS, LOOP_OUT.
"""

import json
import os
import time

import numpy as np

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("LOOP_OUT", "/tmp/oatpu_loop")
ROUNDS = int(os.environ.get("LOOP_ROUNDS", 3))
EPISODES = int(os.environ.get("LOOP_EPISODES", 24))
EPOCHS = int(os.environ.get("LOOP_EPOCHS", 10))

T0 = time.time()


def log(msg):
  print("[loop {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def merge_packed(chunks, out_dir):
  import glob
  os.makedirs(out_dir, exist_ok=True)
  manifests = [json.load(open(os.path.join(c, "manifest.json")))
               for c in chunks]
  keys = manifests[0]["modalities"]
  total = sum(m["num_samples"] for m in manifests)
  for key in keys:
    arrs = [np.load(os.path.join(c, key + ".npy")) for c in chunks]
    np.save(os.path.join(out_dir, key + ".npy"), np.concatenate(arrs, 0))
  json.dump({"num_samples": total, "modalities": keys,
             "quantized": manifests[0].get("quantized", [])},
            open(os.path.join(out_dir, "manifest.json"), "w"))
  return total


def evaluate(model, params, seed):
  import jax
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.envs.batched import BatchedEnv
  env = BatchedEnv("Town01", batch_size=128, num_vehicles=0, seed=seed)
  policy = make_dim_policy(model, params, num_plan_steps=20, epsilon=0.3)
  _, _, stats = env.rollout(300, policy=policy)
  return {
      "mean_distance_m": float(np.asarray(stats["distance"]).mean()),
      "collision_free_frac": float(
          (np.asarray(stats["collisions"]) == 0).mean()),
  }


def main():
  import jax
  from oatomobile_tpu.baselines.learned.dim.train import train
  from oatomobile_tpu.datasets.carla import CARLADataset
  from oatomobile_tpu.models.dim import ImitativeModel

  os.makedirs(OUT, exist_ok=True)
  model = ImitativeModel(output_shape=(4, 2))
  chunks = []
  history = []

  for round_i in range(ROUNDS):
    chunk_dir = os.path.join(OUT, "data_r{}".format(round_i))
    if not CARLADataset.is_packed(chunk_dir):
      log("round {}: collect {} episodes".format(round_i, EPISODES))
      CARLADataset.collect_packed(
          "Town01", chunk_dir, num_episodes=EPISODES, num_steps=300,
          num_vehicles=4, noise=0.1, seed=1000 * round_i + 7)
    chunks.append(chunk_dir)
    dataset_dir = os.path.join(OUT, "dataset")
    n = merge_packed(chunks, dataset_dir)
    log("round {}: dataset {} samples".format(round_i, n))

    state = train(dataset_dir, os.path.join(OUT, "dim"), batch_size=128,
                  num_epochs=EPOCHS * (round_i + 1), use_mesh=False,
                  resume=True)
    result = evaluate(model, jax.device_get(state.params),
                      seed=31 + round_i)
    result["round"] = round_i
    result["samples"] = n
    history.append(result)
    log("round {}: eval {}".format(round_i, result))

  json.dump(history, open(os.path.join(OUT, "history.json"), "w"),
            indent=2)
  log("done")


if __name__ == "__main__":
  main()
