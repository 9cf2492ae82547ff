"""RIP-WCM vs DIM CARNOVEL head-to-head at 20 episodes/task (seed 11),
pooled with the 10-episode table run (seed 7) for the CI-separation
claim of VERDICT r4 item 2 (statistically separated RIP > DIM)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
OUT = os.environ.get("RUN_OUT", "/root/r5/exp")

from experiment_r4 import _policies  # noqa: E402  (reads RUN_* env)
from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched  # noqa: E402
from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS  # noqa: E402

factories = _policies()
for name in ("rip_wcm", "dim"):
  log_dir = os.path.join(OUT, "carnovel20_{}".format(name))
  if os.path.exists(os.path.join(log_dir, "summary.json")):
    continue
  evaluate_batched(_TASKS, policy_fn=factories[name](), log_dir=log_dir,
                   num_episodes=20, seed=11)
  s = json.load(open(os.path.join(log_dir, "summary.json")))["summary"]
  print(name, s["success_rate"], s["success_ci95"], flush=True)
print("HEADTOHEAD DONE")
