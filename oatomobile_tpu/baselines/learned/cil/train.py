"""Trains the behavioural cloning model on expert demonstrations.

Parity: /root/reference/oatomobile/baselines/torch/cil/train.py:100-288 —
L1 loss on the downsampled player_future (train_step:168-190), Adam lr
1e-3, batch 512, mode labels, checkpoints every 4 epochs.

Run:  python -m oatomobile_tpu.baselines.learned.cil.train \
          --dataset_dir ... --output_dir ... --num_epochs 20
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oatomobile_tpu.baselines.learned.dim.train import (VELOCITY_DROPOUT,
                                                        _load_resident,
                                                        dropout_velocity)
from oatomobile_tpu.datasets.carla import CARLADataset
from oatomobile_tpu.models.cil import BehaviouralModel
from oatomobile_tpu.parallel import dp, mesh as mesh_lib
from oatomobile_tpu.utils.checkpoint import Checkpointer
from oatomobile_tpu.utils.loggers import JSONLLogger, TerminalLogger

MODALITIES = (
    "lidar",
    "is_at_traffic_light",
    "traffic_light_state",
    "player_future",
    "velocity",
)


def mode_labels_jnp(player_future: jnp.ndarray) -> jnp.ndarray:
  """In-graph signed command labels [B, 1] from raw future trajectories
  [B, T, >=2] — the jnp twin of `CARLADataset.derive_mode_labels`
  (signed rule), identical to the eval policy's `mode_from_goal_jnp`
  geometry so train- and eval-time conditioning agree."""
  end = player_future[:, -1, :2]
  norm = jnp.linalg.norm(end, axis=-1)
  theta = jnp.degrees(jnp.arctan2(end[:, 1], end[:, 0]))
  m = jnp.where(theta > 15.0, 3.0, jnp.where(theta < -15.0, 2.0, 0.0))
  return jnp.where(norm < 3.0, 1.0, m)[:, None]


def make_context(model: BehaviouralModel, batch):
  arrays = {k: jnp.asarray(v) for k, v in batch.items()}
  arrays = {
      k: v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v
      for k, v in arrays.items()
  }
  if "mode" not in arrays and "player_future" in arrays:
    # Device-resident batches carry no host-derived labels; compute them
    # in-graph (before transform, so its STOP-removal still applies).
    arrays["mode"] = mode_labels_jnp(arrays["player_future"])
  sample = model.transform(arrays)
  context = {
      "visual_features": sample["visual_features"],
      "velocity": sample["velocity"],
      "is_at_traffic_light": sample["is_at_traffic_light"],
      "traffic_light_state": sample["traffic_light_state"],
      "mode": sample["mode"],
  }
  for key in ("is_at_traffic_light", "traffic_light_state", "mode"):
    if context[key].ndim == 1:
      context[key] = context[key][:, None]
  return sample, context


def train(
    dataset_dir: str,
    output_dir: str,
    *,
    batch_size: int = 512,
    num_epochs: int = 20,
    learning_rate: float = 1e-3,
    save_model_frequency: int = 4,
    output_length: int = 40,
    seed: int = 42,
    use_mesh: bool = True,
    max_steps_per_epoch: int = 10**9,
    val_fraction: float = 0.05,
    velocity_dropout: float = VELOCITY_DROPOUT,
    device_data: bool = True,
    oversample_restarts: int = 3,
) -> dp.TrainState:
  """Runs L1 behavioural-cloning training.

  A held-out validation L1 is evaluated every epoch (packed datasets)
  and the best-val params are saved as ``model-best`` — the role of the
  reference's val DataLoader (cil/train.py 146-165 analogue)."""
  os.makedirs(output_dir, exist_ok=True)
  loggers = [TerminalLogger(label="cil"),
             JSONLLogger(os.path.join(output_dir, "logs"), "cil_train")]

  model = BehaviouralModel(output_shape=(output_length, 2))
  mesh = mesh_lib.make_mesh() if use_mesh and jax.device_count() > 1 \
      else None

  peek = next(CARLADataset.make_loader(dataset_dir, MODALITIES,
                                       batch_size=2, mode=True, seed=seed))
  _, context = make_context(model, peek)
  rng = jax.random.PRNGKey(seed)
  params = model.init(rng, **context)

  tx = optax.adam(learning_rate)

  def loss_fn(params, batch, step_rng):
    sample, context = make_context(model, batch)
    context = dropout_velocity(context, step_rng, velocity_dropout)
    target = sample["player_future"][..., :2]
    plan = model.apply(params, **context)
    return jnp.mean(jnp.abs(plan - target))

  update = dp.make_update_fn(loss_fn, tx, mesh)
  eval_loss = jax.jit(
      lambda params, batch: loss_fn(params, batch, jax.random.PRNGKey(0)))
  state = dp.TrainState.create(params, tx, jax.random.fold_in(rng, 1))
  if mesh is not None:
    state = dp.replicate_state(mesh, state)

  checkpointer = Checkpointer(os.path.join(output_dir, "ckpts"))
  have_val = CARLADataset.is_packed(dataset_dir) and val_fraction > 0
  best_val = float("inf")
  # Resume from the newest periodic checkpoint (mirrors rip/train.py:
  # tunneled TPU links can stall mid-run).  Optimiser state restarts;
  # best_val is recovered from the JSONL log so a post-resume epoch
  # cannot demote the saved ``best``.
  start_epoch = 0
  _last = checkpointer.latest_epoch()
  if _last is not None:
    restored = checkpointer.load(_last, jax.device_get(state.params))
    state = state.replace(params=jax.device_put(restored))
    if mesh is not None:
      state = dp.replicate_state(mesh, state)
    start_epoch = _last + 1
    import glob as _glob
    import json as _json
    for _log in _glob.glob(os.path.join(output_dir, "logs", "*.jsonl")):
      with open(_log) as fp:
        for line in fp:
          try:
            rec = _json.loads(line)
          except ValueError:
            continue
          if "val_loss" in rec and rec["val_loss"] < best_val:
            best_val = rec["val_loss"]
  # Device-resident pack: batches become pure device gathers (mode labels
  # derive in-graph in make_context), mirroring dim/train.py.
  resident, resident_n = _load_resident(dataset_dir,
                                        device_data and mesh is None)

  # Stopped->restart oversampling (see dim/train.py + datasets/carla.py
  # restart_transition_indices): anti-inertia at the data level.
  restart_idx = np.zeros((0,), np.int64)
  if oversample_restarts > 0 and resident is not None:
    _split2 = "train" if have_val else None
    _train_idx = CARLADataset.packed_split_indices(
        resident_n, _split2, val_fraction=val_fraction)
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
      return CARLADataset.iter_device_batches(resident, idx, batch_size,
                                              seed=seed + epoch)
    return CARLADataset.make_loader(
        dataset_dir, MODALITIES, batch_size=batch_size, mode=True,
        seed=seed + epoch, split=split, val_fraction=val_fraction)

  def val_loader():
    if resident is not None:
      idx = CARLADataset.packed_split_indices(resident_n, "val",
                                              val_fraction=val_fraction)
      return CARLADataset.iter_device_batches(resident, idx, batch_size,
                                              shuffle=False,
                                              drop_remainder=False)
    return CARLADataset.make_loader(dataset_dir, MODALITIES,
                                    batch_size=batch_size, mode=True,
                                    split="val", val_fraction=val_fraction)

  for epoch in range(start_epoch, num_epochs):
    losses = []
    t0 = time.time()
    loader = epoch_loader(epoch)
    for i, batch in enumerate(loader):
      if i >= max_steps_per_epoch:
        break
      state, loss = update(state, batch)
      losses.append(loss)
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
    record = {
        "epoch": epoch,
        "loss": mean_loss,
        "sec": round(time.time() - t0, 2),
        "steps": int(state.step),
    }
    if have_val:
      val_losses = [eval_loss(state.params, batch)
                    for batch in val_loader()]
      if val_losses:
        val = float(jnp.mean(jnp.stack(val_losses)))
        record["val_loss"] = val
        if val < best_val:
          best_val = val
          checkpointer.save_named("best", jax.device_get(state.params))
          record["val_best"] = True
    for logger in loggers:
      logger.write(record)
    if (epoch + 1) % save_model_frequency == 0 or epoch == num_epochs - 1:
      checkpointer.save(epoch, jax.device_get(state.params))

  return state


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--dataset_dir", required=True)
  parser.add_argument("--output_dir", required=True)
  parser.add_argument("--batch_size", type=int, default=512)
  parser.add_argument("--num_epochs", type=int, default=20)
  parser.add_argument("--learning_rate", type=float, default=1e-3)
  parser.add_argument("--save_model_frequency", type=int, default=4)
  parser.add_argument("--seed", type=int, default=42)
  args = parser.parse_args()
  train(args.dataset_dir, args.output_dir, batch_size=args.batch_size,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        save_model_frequency=args.save_model_frequency, seed=args.seed)


if __name__ == "__main__":
  main()
