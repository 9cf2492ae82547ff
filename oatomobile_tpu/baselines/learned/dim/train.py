"""Trains the deep imitative model on expert demonstrations.

Parity: /root/reference/oatomobile/baselines/torch/dim/train.py:85-327 —
NLL objective -(log_prob - logabsdet) on noised targets (sigma = 1e-2,
train.py:186-189), Adam lr 1e-3, batch 512, checkpoints every 4 epochs,
theoretical NLL floor logged (train.py:168-173).

Run:  python -m oatomobile_tpu.baselines.learned.dim.train \
          --dataset_dir ... --output_dir ... --num_epochs 20
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oatomobile_tpu.datasets.carla import CARLADataset
from oatomobile_tpu.models.dim import ImitativeModel
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

NOISE_STD = 1e-2  # target perturbation (train.py:57, 186-189)
VELOCITY_DROPOUT = 0.25  # per-sample velocity-context dropout (see below)

# Device-resident datasets larger than this stream from host instead
# (leave HBM headroom for model/optimizer/activations).
_DEVICE_DATA_BYTES_CAP = 6 * 1024**3


def _load_resident(dataset_dir: str, enabled: bool):
  """Returns (data, num_samples) if the packed dataset should live on
  device (un-meshed run, under the size cap), else (None, 0).  Callers
  must disable this under a dp mesh (resident arrays are single-device;
  sharded batches must stream)."""
  if not (enabled and CARLADataset.is_packed(dataset_dir)):
    return None, 0
  # Size check via memory-mapped headers (no load) before any upload.
  import json
  with open(os.path.join(dataset_dir, "manifest.json")) as fp:
    manifest = json.load(fp)
  nbytes = 0
  for key in manifest["modalities"]:
    if key in MODALITIES:
      arr = np.load(os.path.join(dataset_dir, "{}.npy".format(key)),
                    mmap_mode="r")
      nbytes += int(arr.size) * arr.dtype.itemsize
  if nbytes > _DEVICE_DATA_BYTES_CAP:
    return None, 0
  return CARLADataset.load_packed_to_device(dataset_dir, MODALITIES)


def dropout_velocity(context, rng, rate: float):
  """Zeroes the velocity context for a random ``rate`` fraction of samples.

  Counter-measure for the imitation "inertia problem": a model whose
  predicted future speed tracks its input speed is only marginally stable
  in closed loop — any disturbance that slows the vehicle lowers the next
  prediction and spirals to a mid-block standstill (measured on Town01;
  the failure class is documented in Codevilla et al., "Exploring the
  Limitations of Behavior Cloning for Autonomous Driving").  Dropping the
  speed input for a fraction of training samples forces the model to also
  infer motion from visual context.
  """
  if rate <= 0.0:
    return context
  keep = jax.random.bernoulli(
      rng, 1.0 - rate, (context["velocity"].shape[0], 1)).astype(jnp.float32)
  return dict(context, velocity=context["velocity"] * keep)


def nll_limit(output_shape, noise_std: float = NOISE_STD) -> float:
  """Theoretical NLL lower bound for noise-perturbed targets
  (train.py:168-173): the differential entropy of the added Gaussian,
  0.5 * D * (log(2*pi*sigma^2) + 1) — negative for sigma = 1e-2."""
  D = int(np.prod(output_shape))
  return float(0.5 * D * (np.log(2 * np.pi * noise_std**2) + 1.0))


def make_context(model: ImitativeModel, batch):
  """Applies model.transform and extracts context kwargs."""
  arrays = {k: jnp.asarray(v) for k, v in batch.items()}
  # Quantised image modalities arrive as uint8 (4x cheaper host->device
  # transfer); dequantise on device, inside the jitted step.
  arrays = {
      k: v.astype(jnp.float32) / 255.0 if v.dtype == jnp.uint8 else v
      for k, v in arrays.items()
  }
  sample = model.transform(arrays)
  context = {
      "visual_features": sample["visual_features"],
      "velocity": sample["velocity"],
      "is_at_traffic_light": sample["is_at_traffic_light"],
      "traffic_light_state": sample["traffic_light_state"],
  }
  for key in ("is_at_traffic_light", "traffic_light_state"):
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
    num_timesteps_to_keep: int = 4,
    clip_gradients: bool = False,
    seed: int = 42,
    use_mesh: bool = True,
    max_steps_per_epoch: int = 10**9,
    resume: bool = False,
    plot_every: int = 4,
    val_fraction: float = 0.05,
    tensorboard: bool = False,
    velocity_dropout: float = VELOCITY_DROPOUT,
    device_data: bool = True,
    input_size=(100, 100),
    oversample_restarts: int = 3,
) -> dp.TrainState:
  """Runs training; returns the final TrainState.

  Args:
    resume: restore the latest full train state (params + optimiser +
      step + rng) from output_dir/state — exact resume, which the
      reference could not do (it saved weights only, SURVEY.md §5).
    plot_every: if > 0, dump sampled-plan-over-BEV panels every N epochs
      (parity with the reference's TensorBoard `write`, train.py:269-298).
    val_fraction: held-out validation fraction (packed datasets only).
      Val NLL is evaluated every epoch and the best-val params are saved
      as ``model-best`` (reference dim/train.py:146-165,215-242 keeps a
      separate val DataLoader; best-checkpoint selection is new).
    device_data: keep the whole packed dataset resident on device and
      assemble batches with an in-graph gather — removes the per-step
      host->device batch upload (the wall-clock bottleneck on remote
      accelerators).  Applies on single-device packed runs under the
      `_DEVICE_DATA_BYTES_CAP` size cap; otherwise streams as before.
  """
  os.makedirs(output_dir, exist_ok=True)
  log_dir = os.path.join(output_dir, "logs")
  ckpt_dir = os.path.join(output_dir, "ckpts")
  loggers = [TerminalLogger(label="dim"), JSONLLogger(log_dir, "dim_train")]
  if tensorboard:
    from oatomobile_tpu.utils.loggers import TensorBoardLogger
    loggers.append(TensorBoardLogger(os.path.join(log_dir, "tb"),
                                     label="dim"))

  model = ImitativeModel(output_shape=(num_timesteps_to_keep, 2),
                         input_size=tuple(input_size))
  mesh = mesh_lib.make_mesh() if use_mesh and jax.device_count() > 1 \
      else None

  # Initialise from one peek batch.
  peek = next(
      CARLADataset.make_loader(dataset_dir, MODALITIES, batch_size=2,
                               seed=seed))
  _, context = make_context(model, peek)
  rng = jax.random.PRNGKey(seed)
  y0 = jnp.zeros((2, num_timesteps_to_keep, 2))
  params = model.init(rng, y0, method=model.log_prob, **context)

  tx = optax.adam(learning_rate)
  if clip_gradients:
    tx = optax.chain(optax.clip_by_global_norm(1.0), tx)

  def loss_fn(params, batch, step_rng):
    sample, context = make_context(model, batch)
    rng_noise, rng_drop = jax.random.split(step_rng)
    context = dropout_velocity(context, rng_drop, velocity_dropout)
    y = sample["player_future"][..., :2]
    y = y + NOISE_STD * jax.random.normal(rng_noise, y.shape)
    log_prob = model.apply(params, y, method=model.log_prob, **context)
    return -jnp.mean(log_prob)

  update = dp.make_update_fn(loss_fn, tx, mesh)
  eval_loss = jax.jit(
      lambda params, batch: loss_fn(params, batch, jax.random.PRNGKey(0)))
  state = dp.TrainState.create(params, tx, jax.random.fold_in(rng, 1))

  have_val = CARLADataset.is_packed(dataset_dir) and val_fraction > 0
  resident, resident_n = _load_resident(dataset_dir,
                                        device_data and mesh is None)

  # Stopped->restart oversampling (imitation-inertia counter-measure,
  # datasets/carla.py restart_transition_indices): tile the rare
  # "standing but the expert pulls away" samples into every epoch so the
  # restart behaviour is trained, not just the cruise behaviour.
  restart_idx = np.zeros((0,), np.int64)
  if oversample_restarts > 0 and resident is not None:
    split = "train" if have_val else None
    train_idx = CARLADataset.packed_split_indices(
        resident_n, split, val_fraction=val_fraction)
    restart_idx = np.intersect1d(
        CARLADataset.restart_transition_indices(dataset_dir), train_idx)

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
        dataset_dir, MODALITIES, batch_size=batch_size, seed=seed + epoch,
        split=split, val_fraction=val_fraction)

  def val_loader():
    if resident is not None:
      idx = CARLADataset.packed_split_indices(resident_n, "val",
                                              val_fraction=val_fraction)
      return CARLADataset.iter_device_batches(resident, idx, batch_size,
                                              shuffle=False,
                                              drop_remainder=False)
    return CARLADataset.make_loader(dataset_dir, MODALITIES,
                                    batch_size=batch_size, split="val",
                                    val_fraction=val_fraction)

  def val_nll(params):
    if not have_val:
      return None
    losses = [eval_loss(params, batch) for batch in val_loader()]
    return float(jnp.mean(jnp.stack(losses))) if losses else None

  state_ckpt = Checkpointer(os.path.join(output_dir, "state"),
                            prefix="train_state")
  start_epoch = 0
  if resume:
    latest = state_ckpt.latest_epoch()
    if latest is not None:
      state = state_ckpt.load(latest, jax.device_get(state))
      start_epoch = latest + 1

  if mesh is not None:
    state = dp.replicate_state(mesh, state)

  checkpointer = Checkpointer(ckpt_dir)
  limit = nll_limit((num_timesteps_to_keep, 2))
  best_val = float("inf")

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
        "nll_limit": limit,
        "sec": round(time.time() - t0, 2),
        "steps": int(state.step),
    }
    val = val_nll(state.params)
    if val is not None:
      record["val_loss"] = val
      if val < best_val:
        best_val = val
        checkpointer.save_named("best", jax.device_get(state.params))
        record["val_best"] = True
    for logger in loggers:
      logger.write(record)
    if (epoch + 1) % save_model_frequency == 0 or epoch == num_epochs - 1:
      checkpointer.save(epoch, jax.device_get(state.params))
      state_ckpt.save(epoch, jax.device_get(state))
    if plot_every and (epoch + 1) % plot_every == 0:
      _plot_samples(model, state.params, peek, output_dir, epoch)

  return state


def _plot_samples(model, params, batch, output_dir: str,
                  epoch: int) -> None:
  """Sampled plans over the BEV input (reference train.py:269-298)."""
  from oatomobile_tpu.utils import graphics
  sample, context = make_context(model, batch)
  plans = model.apply(params, jax.random.PRNGKey(epoch),
                      method=model.sample, **context)
  target = sample["player_future"][..., :2]
  plot_dir = os.path.join(output_dir, "plots")
  os.makedirs(plot_dir, exist_ok=True)
  bev = jax.device_get(sample["visual_features"][0])
  graphics.plot_trajectory_overlay(
      bev,
      {"sample": jax.device_get(plans[0]),
       "ground_truth": jax.device_get(target[0])},
      output_fname=os.path.join(plot_dir, "epoch_{}.png".format(epoch)))


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--dataset_dir", required=True)
  parser.add_argument("--output_dir", required=True)
  parser.add_argument("--batch_size", type=int, default=512)
  parser.add_argument("--num_epochs", type=int, default=20)
  parser.add_argument("--learning_rate", type=float, default=1e-3)
  parser.add_argument("--save_model_frequency", type=int, default=4)
  parser.add_argument("--num_timesteps_to_keep", type=int, default=4)
  parser.add_argument("--clip_gradients", action="store_true")
  parser.add_argument("--seed", type=int, default=42)
  parser.add_argument("--resume", action="store_true")
  parser.add_argument("--plot_every", type=int, default=4)
  parser.add_argument("--val_fraction", type=float, default=0.05)
  parser.add_argument("--tensorboard", action="store_true")
  parser.add_argument("--cpu", action="store_true")
  args = parser.parse_args()
  if args.cpu:
    from oatomobile_tpu.utils.platform import force_cpu
    force_cpu()
  train(args.dataset_dir, args.output_dir, batch_size=args.batch_size,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        save_model_frequency=args.save_model_frequency,
        num_timesteps_to_keep=args.num_timesteps_to_keep,
        clip_gradients=args.clip_gradients, seed=args.seed,
        resume=args.resume, plot_every=args.plot_every,
        val_fraction=args.val_fraction, tensorboard=args.tensorboard)


if __name__ == "__main__":
  main()
