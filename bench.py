"""Headline benchmark: env steps/sec/chip at 1024 parallel BEV-sensor envs.

North star (BASELINE.json / BASELINE.md): >= 100k env steps/sec/chip at
1024 parallel Town01 envs with the BEV LIDAR sensor synthesised every step
and the autopilot policy in the loop.  The reference has no published
numbers (BASELINE.md); its hard architectural ceiling is the CARLA server
tick rate — 20 steps/sec/env, one env per GPU — so `vs_baseline` reports
the ratio against the 100k north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# Persistent compilation cache: the axon remote-compile path is slow and
# high-variance; cached executables make reruns start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main() -> None:
  batch = int(os.environ.get("BENCH_BATCH", 1024))
  town = os.environ.get("BENCH_TOWN", "Town01")
  num_vehicles = int(os.environ.get("BENCH_VEHICLES", 16))
  steps = int(os.environ.get("BENCH_STEPS", 256))
  # BENCH_MODE=dim runs the full learned DIM agent (BEV -> MobileNetV2 ->
  # flow -> inner-loop Adam planning -> PID) in the loop instead of the
  # rule-based autopilot (BASELINE.json config 2/5).
  mode = os.environ.get("BENCH_MODE", "autopilot")

  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.environ["JAX_COMPILATION_CACHE_DIR"])
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
  import numpy as np
  from oatomobile_tpu.envs.batched import BatchedEnv

  env = BatchedEnv(
      town=town,
      batch_size=batch,
      num_vehicles=num_vehicles,
      route_capacity=1024,
      seed=0,
  )

  policy = None
  rollout_kwargs = {"compute": ("lidar",)}
  metric_name = "env_steps_per_sec_per_chip_1024bev"
  if mode == "dim":
    import jax.numpy as jnp
    from oatomobile_tpu.baselines.learned.dim.policy import make_dim_policy
    from oatomobile_tpu.models.dim import ImitativeModel
    # Encoder study knobs: BENCH_DIM_INPUT (visual resolution, default
    # the reference's 100) and BENCH_DIM_ENCODER_DTYPE (bfloat16 runs
    # the MobileNetV2 on the MXU at half precision; the flow planner
    # stays f32 — see baselines/learned/dim/policy.py).
    size = int(os.environ.get("BENCH_DIM_INPUT", 100))
    enc_dtype = os.environ.get("BENCH_DIM_ENCODER_DTYPE", "float32")
    model = ImitativeModel(output_shape=(4, 2), input_size=(size, size))
    ctx = dict(
        visual_features=jnp.zeros((1, size, size, 2)),
        velocity=jnp.zeros((1, 3)),
        is_at_traffic_light=jnp.zeros((1, 1)),
        traffic_light_state=jnp.zeros((1, 1)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                        method=model.log_prob, **ctx)
    policy = make_dim_policy(model, params, num_plan_steps=20,
                             encoder_dtype=enc_dtype)
    rollout_kwargs = {}
    metric_name = "dim_closed_loop_steps_per_sec_per_chip"

  # Warm-up: compile + one full run.  NOTE: timing must fetch a (small)
  # result to the host — under the tunneled axon runtime
  # `block_until_ready` returns before execution completes.
  final, _, stats = env.rollout(steps, policy=policy, **rollout_kwargs)
  float(np.asarray(stats["distance"]).sum())

  t0 = time.perf_counter()
  final, _, stats = env.rollout(steps, policy=policy, **rollout_kwargs)
  probe = float(np.asarray(stats["distance"]).sum())
  elapsed = time.perf_counter() - t0
  del probe

  steps_per_sec = batch * steps / elapsed
  result = {
      "metric": metric_name,
      "value": round(steps_per_sec, 1),
      "unit": "steps/s",
      "vs_baseline": round(steps_per_sec / 100_000.0, 3),
  }
  print(json.dumps(result))
  # Secondary diagnostics on stderr (not part of the contract line).
  print(
      "diag: elapsed={:.2f}s batch={} steps={} dist/scene={:.1f}m "
      "collisions={} platform={}".format(
          elapsed, batch, steps,
          float(np.asarray(stats["distance"]).mean()),
          int(np.asarray(stats["collisions"]).sum()),
          jax.devices()[0].platform),
      file=sys.stderr)


if __name__ == "__main__":
  main()
