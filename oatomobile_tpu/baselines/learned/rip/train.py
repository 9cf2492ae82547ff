"""Trains the RIP ensemble: K deep imitative models in one computation.

The reference trains its K=4 DIMs as separate jobs and loads K checkpoints
(README.md:55-58).  TPU-native: the ensemble is a stacked-parameter vmap
axis — K models train *simultaneously* from different seeds on the same
batches, one fused update per step.  With more than one device (and
``use_mesh=True``) the trainer builds a (dp, mp) mesh via
``parallel.mesh.ensemble_mesh`` and shards the ensemble axis over ``mp``
and the batch over ``dp`` — the layout ``__graft_entry__.dryrun_multichip``
dry-runs, now live in the production trainer
(tests/test_pipeline.py::test_rip_mp_sharded_matches_unsharded).

Run:  python -m oatomobile_tpu.baselines.learned.rip.train \
          --dataset_dir ... --output_dir ... --num_models 4
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oatomobile_tpu.baselines.learned.dim.train import (MODALITIES,
                                                        NOISE_STD,
                                                        VELOCITY_DROPOUT,
                                                        _load_resident,
                                                        dropout_velocity,
                                                        make_context)
from oatomobile_tpu.datasets.carla import CARLADataset
from oatomobile_tpu.models.dim import ImitativeModel
from oatomobile_tpu.parallel import mesh as mesh_lib
from oatomobile_tpu.utils.checkpoint import Checkpointer
from oatomobile_tpu.utils.loggers import JSONLLogger, TerminalLogger


def unstack_params(stacked, k: int):
  """Extracts member k's parameters from a stacked ensemble pytree."""
  return jax.tree.map(lambda x: x[k], stacked)


def train(
    dataset_dir: str,
    output_dir: str,
    *,
    num_models: int = 4,
    batch_size: int = 512,
    num_epochs: int = 20,
    learning_rate: float = 1e-3,
    save_model_frequency: int = 4,
    num_timesteps_to_keep: int = 4,
    seed: int = 42,
    max_steps_per_epoch: int = 10**9,
    val_fraction: float = 0.05,
    velocity_dropout: float = VELOCITY_DROPOUT,
    device_data: bool = True,
    grad_accum: int = 1,
    use_mesh: bool = True,
    oversample_restarts: int = 3,
):
  """Trains the stacked ensemble; per-epoch held-out val NLL (mean over
  members) selects the ``ensemble-best`` checkpoint.  ``device_data``
  keeps the packed dataset resident on device (see dim/train.py).

  ``grad_accum``: gradient-accumulation microbatching — each optimiser
  step averages ``grad_accum`` microbatches of ``batch_size /
  grad_accum`` samples, numerically the reference's batch-512 Adam step
  at 1/grad_accum the activation memory.  Needed when a multi-GB
  device-resident dataset shares HBM with the K-model ensemble's
  backward pass (measured OOM at K=4, batch 512, 204k resident
  samples)."""
  os.makedirs(output_dir, exist_ok=True)
  loggers = [TerminalLogger(label="rip"),
             JSONLLogger(os.path.join(output_dir, "logs"), "rip_train")]

  model = ImitativeModel(output_shape=(num_timesteps_to_keep, 2))
  peek = next(CARLADataset.make_loader(dataset_dir, MODALITIES,
                                       batch_size=2, seed=seed))
  _, context = make_context(model, peek)
  y0 = jnp.zeros((2, num_timesteps_to_keep, 2))

  def init_one(k):
    return model.init(jax.random.PRNGKey(seed + k), y0,
                      method=model.log_prob, **context)

  stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0),
                         *[init_one(k) for k in range(num_models)])
  tx = optax.adam(learning_rate)
  if grad_accum > 1:
    assert batch_size % grad_accum == 0
    tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
  micro_batch = batch_size // max(grad_accum, 1)
  opt_state = tx.init(stacked)

  # Multi-chip layout (the one __graft_entry__.dryrun_multichip proves):
  # ensemble axis over ``mp``, batch over ``dp``.  XLA emits the psum over
  # dp for each member's gradient and keeps member params chip-local.
  mesh = (mesh_lib.ensemble_mesh(num_models)
          if use_mesh and jax.device_count() > 1 else None)
  if mesh is not None:
    stacked = mesh_lib.shard_ensemble(mesh, stacked, num_models)
    opt_state = mesh_lib.shard_ensemble(mesh, opt_state, num_models)

  def loss_fn(stacked_params, batch, rng):
    sample, context = make_context(model, batch)
    y = sample["player_future"][..., :2]

    def member(params_k, rng_k):
      rng_noise, rng_drop = jax.random.split(rng_k)
      ctx_k = dropout_velocity(context, rng_drop, velocity_dropout)
      noisy = y + NOISE_STD * jax.random.normal(rng_noise, y.shape)
      lp = model.apply(params_k, noisy, method=model.log_prob, **ctx_k)
      return -jnp.mean(lp)

    rngs = jax.random.split(rng, num_models)
    return jnp.mean(jax.vmap(member)(stacked_params, rngs))

  @jax.jit
  def _update(stacked_params, opt_state, batch, rng):
    loss, grads = jax.value_and_grad(loss_fn)(stacked_params, batch, rng)
    updates, opt_state = tx.update(grads, opt_state, stacked_params)
    return optax.apply_updates(stacked_params, updates), opt_state, loss

  def update(stacked_params, opt_state, batch, rng):
    if mesh is not None:
      batch = mesh_lib.shard_batch(mesh, batch)
    return _update(stacked_params, opt_state, batch, rng)

  checkpointer = Checkpointer(os.path.join(output_dir, "ckpts"),
                              prefix="ensemble")
  eval_loss = jax.jit(
      lambda params, batch: loss_fn(params, batch, jax.random.PRNGKey(0)))
  have_val = CARLADataset.is_packed(dataset_dir) and val_fraction > 0
  # Resident arrays are single-device; under a mesh, batches must stream
  # from host and be placed with dp sharding (same rule as dim/train.py).
  resident, resident_n = _load_resident(dataset_dir,
                                        device_data and mesh is None)

  # Stopped->restart oversampling (see dim/train.py + datasets/carla.py
  # restart_transition_indices): anti-inertia at the data level.
  restart_idx = np.zeros((0,), np.int64)
  if oversample_restarts > 0 and resident is not None:
    _split = "train" if have_val else None
    _train_idx = CARLADataset.packed_split_indices(
        resident_n, _split, val_fraction=val_fraction)
    restart_idx = np.intersect1d(
        CARLADataset.restart_transition_indices(dataset_dir), _train_idx)

  def epoch_loader(epoch):
    split = "train" if have_val else None
    if resident is not None:
      idx = CARLADataset.packed_split_indices(resident_n, split,
                                              val_fraction=val_fraction)
      if len(restart_idx):
        idx = np.concatenate(
            [idx] + [restart_idx] * oversample_restarts)
      return CARLADataset.iter_device_batches(resident, idx, micro_batch,
                                              seed=seed + epoch)
    return CARLADataset.make_loader(
        dataset_dir, MODALITIES, batch_size=micro_batch, seed=seed + epoch,
        split=split, val_fraction=val_fraction)

  def val_loader():
    if resident is not None:
      idx = CARLADataset.packed_split_indices(resident_n, "val",
                                              val_fraction=val_fraction)
      return CARLADataset.iter_device_batches(resident, idx, micro_batch,
                                              shuffle=False,
                                              drop_remainder=False)
    return CARLADataset.make_loader(dataset_dir, MODALITIES,
                                    batch_size=micro_batch, split="val",
                                    val_fraction=val_fraction)

  # Resume from the newest periodic checkpoint if one exists (tunneled
  # TPU links can stall mid-run; losing 35 of 40 ensemble epochs to a
  # dead connection is not acceptable).  The Adam state restarts fresh
  # -- a brief transient -- and best_val is recovered from the JSONL
  # training log so a post-resume epoch cannot demote the saved
  # ``ensemble-best``.
  best_val = float("inf")
  start_epoch = 0
  last = checkpointer.latest_epoch()
  if last is not None:
    restored = checkpointer.load(last, jax.device_get(stacked))
    stacked = (mesh_lib.shard_ensemble(mesh, restored, num_models)
               if mesh is not None else jax.device_put(restored))
    start_epoch = last + 1
    import glob as _glob
    import json as _json
    for log_path in _glob.glob(os.path.join(output_dir, "logs", "*.jsonl")):
      with open(log_path) as fp:
        for line in fp:
          try:
            rec = _json.loads(line)
          except ValueError:
            continue
          if "val_loss" in rec and rec["val_loss"] < best_val:
            best_val = rec["val_loss"]
    loggers[0].write({"resumed_from_epoch": last, "best_val": best_val})
  rng = jax.random.PRNGKey(seed + 999)
  step = 0
  for epoch in range(start_epoch, num_epochs):
    losses = []
    t0 = time.time()
    loader = epoch_loader(epoch)
    for i, batch in enumerate(loader):
      if i >= max_steps_per_epoch:
        break
      rng, step_rng = jax.random.split(rng)
      stacked, opt_state, loss = update(stacked, opt_state, batch, step_rng)
      losses.append(loss)
      step += 1
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
    record = {"epoch": epoch, "loss": mean_loss, "models": num_models,
              "sec": round(time.time() - t0, 2), "steps": step}
    if have_val:
      val_losses = [
          eval_loss(stacked,
                    mesh_lib.shard_batch(mesh, batch) if mesh is not None
                    else batch) for batch in val_loader()
      ]
      if val_losses:
        val = float(jnp.mean(jnp.stack(val_losses)))
        record["val_loss"] = val
        if val < best_val:
          best_val = val
          checkpointer.save_named("best", jax.device_get(stacked))
          record["val_best"] = True
    for logger in loggers:
      logger.write(record)
    if (epoch + 1) % save_model_frequency == 0 or epoch == num_epochs - 1:
      checkpointer.save(epoch, jax.device_get(stacked))

  return stacked


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--dataset_dir", required=True)
  parser.add_argument("--output_dir", required=True)
  parser.add_argument("--num_models", type=int, default=4)
  parser.add_argument("--batch_size", type=int, default=512)
  parser.add_argument("--num_epochs", type=int, default=20)
  parser.add_argument("--learning_rate", type=float, default=1e-3)
  parser.add_argument("--seed", type=int, default=42)
  args = parser.parse_args()
  train(args.dataset_dir, args.output_dir, num_models=args.num_models,
        batch_size=args.batch_size, num_epochs=args.num_epochs,
        learning_rate=args.learning_rate, seed=args.seed)


if __name__ == "__main__":
  main()
