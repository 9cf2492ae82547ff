"""Input-resolution study: DIM at 50x50 vs the reference's 100x100.

Round-2 measurement put the context encoder at 58.3 ms of the closed
loop @B=1024 — more than the entire 20-step planner.  The reference
already downsamples 200->100 (dim/model.py:248-251); this study trains
an otherwise-identical DIM at 50x50 (quarter the encoder pixels) on the
SAME round-3 dataset and measures (a) val NLL, (b) CARNOVEL success,
so the throughput win of a smaller encoder carries a quantified quality
cost either way.

Run after scripts/experiment_r3.py (reuses its packed dataset).
Env: RUN_OUT (default /tmp/oatpu_r3), STUDY_EPOCHS.
"""

import json
import os
import time

import oatomobile_tpu  # noqa: F401

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_r3")
EPOCHS = int(os.environ.get("STUDY_EPOCHS", 40))
EPISODES = int(os.environ.get("STUDY_EPISODES", 10))
BRIDGE = json.loads(os.environ.get(
    "RUN_BRIDGE",
    '{"use_brake": true, "curvature_slowdown": true, "speed_gain": 1.2}'))

T0 = time.time()


def log(msg):
  print("[dim50 {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def main():
  import jax
  from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
  from oatomobile_tpu.baselines.learned.dim.train import train
  from oatomobile_tpu.benchmarks.batched_eval import (evaluate_batched,
                                                      summarize)
  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.checkpoint import Checkpointer

  packed = os.path.join(OUT, "packed")
  out_dir = os.path.join(OUT, "dim50")
  ckpt = Checkpointer(os.path.join(out_dir, "ckpts"))
  if not ckpt.has_named("best"):
    log("train DIM @50x50, {} epochs".format(EPOCHS))
    train(packed, out_dir, batch_size=512, num_epochs=EPOCHS,
          input_size=(50, 50), plot_every=0)

  model = ImitativeModel(output_shape=(4, 2), input_size=(50, 50))
  import jax.numpy as jnp
  ctx = dict(visual_features=jnp.zeros((1, 50, 50, 2)),
             velocity=jnp.zeros((1, 3)),
             is_at_traffic_light=jnp.zeros((1, 1)),
             traffic_light_state=jnp.zeros((1, 1)))
  template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                        method=model.log_prob, **ctx)
  params = ckpt.load_named("best", jax.device_get(template))

  policy = make_dim_policy(model, params, num_plan_steps=20, **BRIDGE)
  log("evaluating CARNOVEL ({} episodes/task)".format(EPISODES))
  results = evaluate_batched(_TASKS, policy_fn=policy,
                             num_episodes=EPISODES, seed=7,
                             log_dir=os.path.join(OUT, "carnovel_dim50"))
  summary = summarize(results)
  records = [json.loads(l) for l in
             open(os.path.join(out_dir, "logs", "dim_train.jsonl"))]
  best_val = min(r.get("val_loss", float("inf")) for r in records)
  out = {"carnovel": {k: summary[k] for k in
                      ("success_rate", "success_ci95", "collision_rate",
                       "timeout_rate", "episodes")},
         "best_val_nll": best_val}
  with open(os.path.join(OUT, "dim50_study.json"), "w") as fp:
    json.dump(out, fp, indent=2)
  log("done: {}".format(out))


if __name__ == "__main__":
  main()
