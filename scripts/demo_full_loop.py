"""End-to-end demonstration: collect -> process -> train -> closed-loop eval.

Produces /tmp/oatpu_demo/summary.json with training losses and the
closed-loop comparison (trained vs untrained DIM) on Town01.
"""

import json
import os
import time

import jax
import numpy as np

import oatomobile_tpu  # noqa: F401  (compilation cache)

OUT = os.environ.get("DEMO_OUT", "/tmp/oatpu_demo")
NUM_EPISODES = int(os.environ.get("DEMO_EPISODES", 24))
EP_STEPS = int(os.environ.get("DEMO_EP_STEPS", 300))
EPOCHS = int(os.environ.get("DEMO_EPOCHS", 12))
BATCH = int(os.environ.get("DEMO_BATCH", 128))
EVAL_SCENES = int(os.environ.get("DEMO_EVAL_SCENES", 256))
EVAL_STEPS = int(os.environ.get("DEMO_EVAL_STEPS", 300))


def log(msg):
  print("[demo {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


T0 = time.time()


def main():
  os.makedirs(OUT, exist_ok=True)
  raw = os.path.join(OUT, "raw")
  processed = os.path.join(OUT, "processed")
  summary = {}

  from oatomobile_tpu.datasets.carla import CARLADataset

  if not os.path.isdir(processed) or not os.listdir(processed):
    log("collecting {} episodes x {} steps".format(NUM_EPISODES, EP_STEPS))
    CARLADataset.collect_batched(
        town="Town01", output_dir=raw, num_episodes=NUM_EPISODES,
        num_steps=EP_STEPS, num_vehicles=0, seed=11)
    log("processing")
    CARLADataset.process(raw, processed, num_frame_skips=5)
  n_samples = len(os.listdir(processed))
  log("dataset: {} samples".format(n_samples))
  summary["num_samples"] = n_samples

  from oatomobile_tpu.baselines.learned.dim.train import train
  log("training DIM: {} epochs batch {}".format(EPOCHS, BATCH))
  state = train(processed, os.path.join(OUT, "dim"), batch_size=BATCH,
                num_epochs=EPOCHS, use_mesh=False)
  records = [json.loads(l) for l in open(
      os.path.join(OUT, "dim", "logs", "dim_train.jsonl"))]
  losses = [r["loss"] for r in records][-EPOCHS:]
  summary["train_losses"] = losses
  log("losses: {}".format([round(l, 1) for l in losses]))

  # Closed-loop eval: trained vs untrained params.
  import jax.numpy as jnp
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.envs.batched import BatchedEnv
  from oatomobile_tpu.models.dim import ImitativeModel

  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((1, 100, 100, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  untrained = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                         method=model.log_prob, **ctx)
  trained = jax.device_get(state.params)

  results = {}
  for name, params in (("trained", trained), ("untrained", untrained)):
    env = BatchedEnv("Town01", batch_size=EVAL_SCENES, num_vehicles=0,
                     seed=77)
    policy = make_dim_policy(model, params, num_plan_steps=20)
    log("closed-loop eval: {}".format(name))
    _, _, stats = env.rollout(EVAL_STEPS, policy=policy)
    results[name] = {
        "mean_distance_m": float(np.asarray(stats["distance"]).mean()),
        "collision_scenes": int(
            (np.asarray(stats["collisions"]) > 0).sum()),
        "episodes_completed": int(np.asarray(stats["episodes"]).sum()),
    }
    log("{}: {}".format(name, results[name]))
  summary["closed_loop"] = results

  with open(os.path.join(OUT, "summary.json"), "w") as fp:
    json.dump(summary, fp, indent=2)
  log("done -> {}/summary.json".format(OUT))


if __name__ == "__main__":
  main()
