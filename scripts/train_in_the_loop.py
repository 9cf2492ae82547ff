"""On-device train-in-the-loop imitation learning (DAgger-style).

The flagship TPU-native workflow — alternates entirely on one chip, no
external simulator, no disk hops between phases beyond the packed cache:

  1. COLLECT: vmapped expert rollouts -> device-windowed packed data
     (fresh scenes + traffic each round; the expert is the in-graph
     autopilot; images resized+quantised inside the rollout scan);
  2. TRAIN: DIM NLL epochs on the aggregate dataset, device-resident
     batches (resume=True keeps optimiser state across rounds);
  3. EVALUATE: the full CARNOVEL distribution-shift suite, multi-episode
     with CIs, driven by the *learned* in-graph policy — plus an
     in-distribution Town01 rollout.

The reference cannot express this loop at all: its pipeline is offline
disk hops around a CARLA server (datasets/carla.py:166-325), one env per
GPU at 20 Hz.  Produces OUT/history.json and OUT/curve.png.

Run: PYTHONPATH=. python scripts/train_in_the_loop.py
Env: LOOP_ROUNDS, LOOP_EPISODES, LOOP_EPOCHS, LOOP_CARNOVEL_EPISODES,
     LOOP_OUT.
"""

import json
import os
import time

import numpy as np

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("LOOP_OUT", "/tmp/oatpu_loop")
ROUNDS = int(os.environ.get("LOOP_ROUNDS", 4))
EPISODES = int(os.environ.get("LOOP_EPISODES", 128))
EPOCHS = int(os.environ.get("LOOP_EPOCHS", 8))
CARNOVEL_EPISODES = int(os.environ.get("LOOP_CARNOVEL_EPISODES", 3))

T0 = time.time()


def log(msg):
  print("[loop {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def evaluate(model, params, seed):
  """In-distribution Town01 rollout + the CARNOVEL shift suite."""
  import jax
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.benchmarks.batched_eval import (evaluate_batched,
                                                      summarize)
  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.envs.batched import BatchedEnv

  policy = make_dim_policy(model, params, num_plan_steps=20, epsilon=0.3,
                           speed_gain=1.2)
  env = BatchedEnv("Town01", batch_size=128, num_vehicles=0, seed=seed)
  _, _, stats = env.rollout(300, policy=policy)
  result = {
      "town01_mean_distance_m": float(np.asarray(stats["distance"]).mean()),
      "town01_collision_free": float(
          (np.asarray(stats["collisions"]) == 0).mean()),
  }
  carnovel = summarize(evaluate_batched(
      _TASKS, policy_fn=policy, num_episodes=CARNOVEL_EPISODES, seed=seed))
  result["carnovel_success"] = carnovel["success_rate"]
  result["carnovel_success_ci95"] = carnovel["success_ci95"]
  result["carnovel_collision"] = carnovel["collision_rate"]
  return result


def plot_curve(history, fname):
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  rounds = [h["round"] for h in history]
  succ = np.array([h["carnovel_success"] for h in history])
  ci = np.array([h["carnovel_success_ci95"] for h in history])
  cf = [h["town01_collision_free"] for h in history]
  fig, ax = plt.subplots(figsize=(6, 4))
  ax.errorbar(rounds, succ, yerr=ci, marker="o",
              label="CARNOVEL success (shift)")
  ax.plot(rounds, cf, marker="s", label="Town01 collision-free (in-dist)")
  ax.set_xlabel("train-in-the-loop round")
  ax.set_ylabel("rate")
  ax.set_ylim(0, 1)
  ax.legend()
  ax.set_title("On-device collect->train->evaluate rounds (DIM)")
  fig.tight_layout()
  fig.savefig(fname, dpi=120)
  plt.close(fig)


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
          "Town01", chunk_dir, num_episodes=EPISODES, num_steps=500,
          # Density ramps to the benchmarks' 100-vehicle traffic so later
          # rounds add car-following/queueing coverage, not more of the
          # same free-flow driving.
          num_vehicles=min(25 * round_i, 100), noise=0.2,
          chunk_episodes=64, image_size=(100, 100), seed=1000 * round_i + 7)
    chunks.append(chunk_dir)
    dataset_dir = os.path.join(OUT, "dataset_r{}".format(round_i))
    n = CARLADataset.merge_packed(chunks, dataset_dir)
    log("round {}: dataset {} samples".format(round_i, n))

    state = train(dataset_dir, os.path.join(OUT, "dim"), batch_size=256,
                  num_epochs=EPOCHS * (round_i + 1), use_mesh=False,
                  plot_every=0, resume=True)
    result = evaluate(model, jax.device_get(state.params),
                      seed=31 + round_i)
    result["round"] = round_i
    result["samples"] = n
    history.append(result)
    log("round {}: eval {}".format(round_i, result))
    json.dump(history, open(os.path.join(OUT, "history.json"), "w"),
              indent=2)

  plot_curve(history, os.path.join(OUT, "curve.png"))
  log("done: {}/history.json, curve.png".format(OUT))


if __name__ == "__main__":
  main()
