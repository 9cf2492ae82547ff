"""Tests for the packed dataset format and dataset visualisation."""

import glob
import os

import numpy as np
import pytest

from oatomobile_tpu.datasets.carla import CARLADataset


@pytest.fixture(scope="module")
def packed_dataset(tmp_path_factory):
  out = str(tmp_path_factory.mktemp("packed"))
  n = CARLADataset.collect_packed(
      "Town02", out, num_episodes=2, num_steps=120, num_frame_skips=10,
      seed=21)
  assert n > 0
  return out


def test_quantization_error_is_bounded(packed_dataset):
  # uint8 storage bounds the dequantisation error by 1/(2*255) ~ 0.2%;
  # the below channel's 6 discrete levels (k/5) are exactly representable.
  raw = np.load(os.path.join(packed_dataset, "lidar.npy"))
  assert raw.dtype == np.uint8
  batch = next(CARLADataset.as_jax_packed(packed_dataset, batch_size=2,
                                          dequantize=True))
  lidar = batch["lidar"]
  assert lidar.min() >= 0.0 and lidar.max() <= 1.0
  below = lidar[..., 0]
  err = np.min(np.abs(below[..., None] - np.arange(6) / 5.0), axis=-1)
  assert err.max() < 1.0 / 255.0


def test_packed_loader_uint8_by_default(packed_dataset):
  batch = next(CARLADataset.as_jax_packed(packed_dataset, batch_size=2))
  assert batch["lidar"].dtype == np.uint8
  assert batch["player_future"].dtype == np.float32


def test_packed_windows_are_ego_frame(packed_dataset):
  batch = next(CARLADataset.as_jax_packed(packed_dataset, batch_size=4,
                                          shuffle=False))
  future = batch["player_future"]
  # Ego-frame future starts near the origin and moves mostly forward.
  assert np.abs(future[:, 0]).max() < 2.0
  assert future[:, -1, 0].mean() > -1.0


def test_train_val_split_is_disjoint_and_deterministic(packed_dataset):
  import json
  with open(os.path.join(packed_dataset, "manifest.json")) as fp:
    n = json.load(fp)["num_samples"]

  def gather(split):
    idx = []
    for batch in CARLADataset.as_jax_packed(
        packed_dataset, batch_size=2, shuffle=False, drop_remainder=False,
        split=split, val_fraction=0.25):
      # player_future rows are unique per sample; use them as identity.
      idx.extend(batch["player_future"].reshape(len(batch["player_future"]),
                                                -1).sum(-1).tolist())
    return idx

  train_a, train_b = gather("train"), gather("train")
  val = gather("val")
  assert train_a == train_b  # deterministic
  assert len(train_a) + len(val) == n
  assert abs(len(val) - round(0.25 * n)) <= 1
  # Disjoint: no identity appears in both (sums are continuous floats —
  # collisions across distinct windows are measure-zero).
  assert not set(np.round(train_a, 6)) & set(np.round(val, 6))


def test_dim_train_logs_val_and_saves_best(packed_dataset, tmp_path):
  import json
  from oatomobile_tpu.baselines.learned.dim.train import train

  out = str(tmp_path / "dim")
  train(packed_dataset, out, batch_size=4, num_epochs=2, use_mesh=False,
        max_steps_per_epoch=2, plot_every=0, val_fraction=0.25)
  records = [json.loads(l) for l in
             open(os.path.join(out, "logs", "dim_train.jsonl"))]
  assert all("val_loss" in r for r in records)
  assert os.path.exists(os.path.join(out, "ckpts", "model-best.flax"))


def test_device_pack_matches_host_pack(tmp_path):
  # The on-device window/ego-frame/quantise path must reproduce the
  # host-numpy path bit-for-bit on images and to float tolerance on
  # trajectories (host transforms run in float64, device in float32).
  kwargs = dict(num_episodes=2, num_steps=120, num_frame_skips=10,
                seed=21)
  dev = str(tmp_path / "dev")
  host = str(tmp_path / "host")
  n_dev = CARLADataset.collect_packed("Town02", dev, device_pack=True,
                                      **kwargs)
  n_host = CARLADataset.collect_packed("Town02", host, device_pack=False,
                                       **kwargs)
  assert n_dev == n_host > 0
  for key in ("lidar", "player_past", "player_future", "location",
              "velocity", "goal", "is_at_traffic_light",
              "traffic_light_state"):
    a = np.load(os.path.join(dev, "{}.npy".format(key)))
    b = np.load(os.path.join(host, "{}.npy".format(key)))
    assert a.shape == b.shape, key
    assert a.dtype == b.dtype, key
    if a.dtype == np.uint8:
      # Quantisation grids may differ by 1 count where x*255 lands on
      # a rounding boundary in f32 vs f64.
      assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, key
    else:
      np.testing.assert_allclose(a, b, atol=1e-3, err_msg=key)


def test_device_resident_training_matches_streaming(packed_dataset,
                                                    tmp_path):
  # Resident and streaming loaders draw identical batch orders from
  # `packed_split_indices`, so one epoch must produce the same losses.
  import json
  from oatomobile_tpu.baselines.learned.dim.train import train

  records = {}
  for name, flag in (("dev", True), ("host", False)):
    out = str(tmp_path / name)
    train(packed_dataset, out, batch_size=2, num_epochs=1, plot_every=0,
          use_mesh=False, device_data=flag)
    lines = open(os.path.join(out, "logs", "dim_train.jsonl")).readlines()
    records[name] = json.loads(lines[0])
  assert abs(records["dev"]["loss"] - records["host"]["loss"]) < 1e-4
  assert abs(records["dev"]["val_loss"] - records["host"]["val_loss"]) < 1e-4


def test_plot_datum_and_coverage(tmp_path):
  # Build a tiny per-sample dataset, then exercise the plotting utils.
  raw = str(tmp_path / "raw")
  processed = str(tmp_path / "processed")
  CARLADataset.collect_batched("Town02", raw, num_episodes=1,
                               num_steps=115, seed=3)
  CARLADataset.process(raw, processed, num_frame_skips=20)
  fnames = glob.glob(os.path.join(processed, "*.npz"))
  assert fnames
  out = str(tmp_path / "viz")
  CARLADataset.plot_datum(fnames[0], out)
  assert os.path.exists(os.path.join(out, "lidar.png"))
  CARLADataset.plot_coverage(processed, str(tmp_path / "coverage.png"))
  assert os.path.exists(str(tmp_path / "coverage.png"))


def test_mode_labels_signed_rule_matches_policy():
  # Training labels (derive_mode_labels signed) and the eval policy's
  # goal-geometry rule (cil/policy.mode_from_goal_jnp) must agree: the
  # round-2 CIL collapse traced to RIGHT being unreachable in training
  # (reference arccos quirk) while eval emitted it.
  import jax.numpy as jnp
  from oatomobile_tpu.baselines.learned.cil.policy import mode_from_goal_jnp
  from oatomobile_tpu.datasets.carla import derive_mode_labels

  ends = np.array([
      [20.0, 0.0],    # straight ahead -> FORWARD
      [1.0, 1.0],     # near -> STOP
      [15.0, 10.0],   # +y -> RIGHT
      [15.0, -10.0],  # -y -> LEFT
      [0.5, 20.0],    # hard right
  ])
  future = np.zeros((len(ends), 80, 3), np.float32)
  future[:, -1, :2] = ends
  labels = derive_mode_labels(future, signed=True)[:, 0]
  np.testing.assert_array_equal(labels, [0.0, 1.0, 3.0, 2.0, 3.0])

  goal = jnp.asarray(future[:, -1:, :2])
  np.testing.assert_array_equal(np.asarray(mode_from_goal_jnp(goal)),
                                labels)

  # Reference quirk variant: RIGHT unreachable, both turns label LEFT.
  quirk = derive_mode_labels(future, signed=False)[:, 0]
  np.testing.assert_array_equal(quirk, [0.0, 1.0, 2.0, 2.0, 2.0])
  assert 3.0 not in quirk


def test_packed_loader_modes_are_signed_by_default(packed_dataset):
  from oatomobile_tpu.datasets.carla import derive_mode_labels
  batch = next(CARLADataset.as_jax_packed(packed_dataset, batch_size=4,
                                          mode=True))
  np.testing.assert_array_equal(
      batch["mode"], derive_mode_labels(batch["player_future"]))


def test_trainer_in_graph_modes_match_host_labels(packed_dataset):
  # The CIL trainer derives labels in-graph for device-resident batches;
  # they must equal the host loader's.
  import jax.numpy as jnp
  from oatomobile_tpu.baselines.learned.cil.train import mode_labels_jnp
  from oatomobile_tpu.datasets.carla import derive_mode_labels

  batch = next(CARLADataset.as_jax_packed(packed_dataset, batch_size=4))
  host = derive_mode_labels(batch["player_future"])
  dev = np.asarray(mode_labels_jnp(jnp.asarray(batch["player_future"])))
  np.testing.assert_allclose(dev, host)


def test_pack_image_size_matches_trainer_transform(tmp_path):
  # Packing at (100, 100) must equal packing full-res then applying the
  # trainer's bilinear downsample (to within uint8 rounding).
  import jax.numpy as jnp
  from oatomobile_tpu.models import transforms

  kwargs = dict(num_episodes=2, num_steps=120, num_frame_skips=10,
                seed=21)
  full = str(tmp_path / "full")
  small = str(tmp_path / "small")
  n_full = CARLADataset.collect_packed("Town02", full, **kwargs)
  n_small = CARLADataset.collect_packed("Town02", small,
                                        image_size=(100, 100), **kwargs)
  assert n_full == n_small > 0
  a = np.load(os.path.join(small, "lidar.npy"))
  assert a.shape[1:3] == (100, 100) and a.dtype == np.uint8
  b = np.load(os.path.join(full, "lidar.npy")).astype(np.float32) / 255.0
  b = np.asarray(transforms.downsample_visual_features(
      jnp.asarray(b), (100, 100)))
  b = np.clip(np.round(b * 255.0), 0, 255).astype(np.uint8)
  assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
