"""Profiles the flow under the DIM planner at 1024 scenes (north-star
decision input: "Pallas kernels for flow log_prob/sample ... if
profiling justifies", SURVEY.md §7 step 7 / BASELINE north star).

Decomposes one DIM policy step into:
  - encoder (MobileNetV2 -> z),
  - plan loop (20 Adam steps of flow fwd+inv+vjp),
  - a single flow _inverse (the training hot op),
  - full in-graph policy step (incl. BEV synthesis + PID).

Prints one JSON line with milliseconds per component.  The Pallas
build-or-justify decision and the measured numbers are recorded in
PARITY.md.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_flow.py [--cpu] [-B 1024]
"""

import argparse
import json


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("-B", type=int, default=1024)
  parser.add_argument("--iters", type=int, default=20)
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()
  if args.cpu:
    from oatomobile_tpu.utils.platform import force_cpu
    force_cpu()

  import jax
  import jax.numpy as jnp
  from oatomobile_tpu.models.dim import ImitativeModel
  from oatomobile_tpu.utils.profiling import timed

  B = args.B
  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(visual_features=jnp.zeros((B, 100, 100, 2)),
             velocity=jnp.zeros((B, 3)),
             is_at_traffic_light=jnp.zeros((B, 1)),
             traffic_light_state=jnp.zeros((B, 1)))
  goal = jnp.zeros((B, 10, 2))
  y = jnp.zeros((B, 4, 2))
  small_ctx = {k: v[:1] for k, v in ctx.items()}
  params = model.init(jax.random.PRNGKey(0), y[:1], method=model.log_prob,
                      **small_ctx)

  encoder = jax.jit(lambda p, c: model.apply(p, method=model.params_z, **c))
  z = encoder(params, ctx)

  flow_inv = jax.jit(lambda p, y, z: model.apply(
      p, y, z, method=lambda m, y, z: m._decoder._inverse(y, z)))
  plan20 = jax.jit(lambda p, c, g: model.apply(
      p, num_steps=20, goal=g, lr=5e-2, method=model.plan, **c))
  log_prob = jax.jit(lambda p, y, c: model.apply(
      p, y, method=model.log_prob, **c))

  def bench(name, fn, *fargs):
    fn(*fargs)  # compile
    times = []
    for _ in range(args.iters):
      _, dt = timed(fn, *fargs)
      times.append(dt)
    return min(times) * 1e3  # ms, best-of (steady state)

  results = {
      "B": B,
      "backend": jax.devices()[0].platform,
      "encoder_ms": bench("encoder", encoder, params, ctx),
      "flow_inverse_ms": bench("flow_inv", flow_inv, params, y, z),
      "log_prob_ms": bench("log_prob", log_prob, params, y, ctx),
      "plan20_ms": bench("plan20", plan20, params, ctx, goal),
  }
  results["plan_share_pct"] = round(
      100 * (results["plan20_ms"] - results["encoder_ms"]) /
      max(results["plan20_ms"], 1e-9), 1)
  print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                    for k, v in results.items()}))


if __name__ == "__main__":
  main()
