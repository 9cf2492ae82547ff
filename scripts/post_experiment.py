"""Post-experiment TPU batch: BCM eval (the paper's actual worst-case
aggregation — the reference's WCM/BCM labels are sign-swapped, see
PARITY.md), CoRL2017 autopilot refresh, flow profiling, bench.

Run after scripts/experiment_r2.py completes (same RUN_OUT)."""

import json
import os
import subprocess
import sys
import time

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_r2")
T0 = time.time()


def log(msg):
  print("[post {:.0f}s] {}".format(time.time() - T0, msg), flush=True)


def main():
  env = dict(os.environ)
  env["RUN_OUT"] = OUT

  # 1. RIP-BCM on CARNOVEL (resumes the experiment's phases).
  env_b = dict(env, RUN_POLICIES="rip_bcm")
  log("rip_bcm CARNOVEL eval")
  subprocess.run([sys.executable, "scripts/experiment_r2.py"], env=env_b,
                 check=True)

  # 2. CoRL2017 autopilot (hazard-overhauled) refresh.
  log("CoRL2017 autopilot eval")
  from oatomobile_tpu.benchmarks.batched_eval import evaluate_batched
  from oatomobile_tpu.benchmarks.corl2017.benchmark import _TASKS as CORL
  evaluate_batched(CORL, policy_fn=None,
                   log_dir=os.path.join(OUT, "corl2017_autopilot"))
  summary = json.load(open(
      os.path.join(OUT, "corl2017_autopilot", "summary.json")))["summary"]
  log("corl2017 autopilot: {}".format(summary))

  # 3. Flow profiling at 1024 scenes (Pallas build-or-justify input).
  log("flow profile")
  subprocess.run([sys.executable, "scripts/profile_flow.py"], env=env,
                 check=True)

  # 4. Throughput bench (MAX_BEV_VEHICLES 16 -> 24 cost check).
  log("bench")
  subprocess.run([sys.executable, "bench.py"], env=env, check=True)
  log("done")


if __name__ == "__main__":
  main()
