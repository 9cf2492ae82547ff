"""Expert demonstration dataset pipeline.

Parity: /root/reference/oatomobile/datasets/carla.py:39-695
(`CARLADataset`): hosted download, autopilot collection, raw->processed
windowing (past 20 / future 80 / skip 5, ego frame), modality loading with
mode labels, and framework adapters.

TPU-native additions: `collect_batched` gathers episodes from a vmapped
`BatchedEnv` rollout (thousands of scenes per device call instead of one
env at 20 Hz), and `as_jax` yields stacked numpy batches for jit training.
"""

import glob
import os
import sys
import zipfile
from typing import Any, Callable, Generator, Mapping, Optional, Sequence

import numpy as np

from oatomobile_tpu.core.dataset import Dataset, Episode
from oatomobile_tpu.ops import transforms as tf_ops


# Image modalities eligible for uint8 packing.  An explicit allowlist, not
# a value-range heuristic: a [N,T,2] trajectory of a mostly-stationary run
# can land in [0,1] by accident and must never be rounded to a 1/255 grid
# (and per-shard min/max decisions could make shards disagree on dtype).
_QUANTIZABLE_MODALITIES = frozenset({
    "lidar", "bird_view_camera_rgb", "bird_view_camera_cityscapes",
    "front_camera_rgb", "rear_camera_rgb", "left_camera_rgb",
    "right_camera_rgb", "game_state",
})


def derive_mode_labels(player_future: np.ndarray,
                       signed: bool = True) -> np.ndarray:
  """Vectorised {0 FORWARD, 1 STOP, 2 LEFT, 3 RIGHT} command labels from
  future-trajectory endpoints ``[N, T, >=2]``.

  ``signed`` (default) resolves the reference's label bug: its dataset
  rule (reference datasets/carla.py:150-157) takes
  ``theta = degrees(arccos(x/r)) >= 0`` so the RIGHT branch
  (``theta <= -15``) is unreachable and BOTH turn directions collapse
  into LEFT — while its eval-time CILAgent (cil/agent.py:67-74) labels
  with a different, also-buggy rule.  Trained on the quirky labels and
  evaluated with signed ones, the model receives command values it never
  saw (measured round 2: CIL collided at the first bend of every CARNOVEL
  task).  The signed rule used here matches
  ``baselines.learned.cil.policy.mode_from_goal_jnp`` exactly, making
  train-time and eval-time conditioning consistent (+y is the right-hand
  side).  Pass ``signed=False`` for the byte-exact reference quirk.
  """
  end = np.asarray(player_future)[:, -1, :2]
  norm = np.linalg.norm(end, axis=-1)
  if signed:
    theta = np.degrees(np.arctan2(end[:, 1], end[:, 0]))
    m = np.where(theta > 15, 3, np.where(theta < -15, 2, 0))
  else:
    theta = np.degrees(np.arccos(end[:, 0] / (norm + 1e-3)))
    m = np.where(theta > 15, 2, np.where(theta <= -15, 3, 0))
  return np.where(norm < 3, 1, m)[:, None].astype(np.float32)


def _save_packed_arrays(output_dir: str, stacked) -> list:
  """Saves stacked arrays; allowlisted image modalities in [0, 1] are
  stored as uint8 — 4x less IO and host->device transfer.  Error bound
  1/510 (~0.2%); the BEV below-channel's six discrete levels are exact.
  Returns the list of quantised keys."""
  quantized = []
  for key, arr in stacked.items():
    if (key in _QUANTIZABLE_MODALITIES and arr.dtype == np.float32 and
        float(arr.min()) >= 0.0 and float(arr.max()) <= 1.0):
      arr = np.round(arr * 255.0).astype(np.uint8)
      quantized.append(key)
    elif key in _QUANTIZABLE_MODALITIES and arr.dtype == np.uint8:
      # Already quantised on device (`_device_pack_windows`).
      quantized.append(key)
    np.save(os.path.join(output_dir, "{}.npy".format(key)), arr)
  return quantized


def _device_pack_windows(collected, modalities, past_length, future_length,
                         num_frame_skips, image_size=None):
  """Windows + ego-frames + quantises a rollout ON DEVICE (one jit).

  The naive pipeline fetches the raw ``[T, B, ...]`` sensor stacks to the
  host and windows there — for a 16-episode x 500-step chunk that is
  ~2.6 GB of float32 BEV alone over the host link, 26x more than the
  training set actually keeps (window centers every ``num_frame_skips``
  steps, images uint8).  Here the gather, the world->ego transform of
  past/future trajectories, and the uint8 quantisation all run as one jit
  on device, so only the final training-ready arrays cross the link.

  Args:
    collected: dict of device arrays ``[T, B, ...]`` from
      ``BatchedEnv.rollout`` — must contain ``location``, ``rotation``
      and ``collision`` plus ``modalities``.
    modalities: keys to gather at window centers.

  Returns:
    dict of device arrays ``[C, B, ...]`` (C = number of window centers):
    ``player_past``/``player_future`` ego-frame float32, ``location``/
    ``rotation``, each modality (allowlisted images as uint8), and a
    boolean ``valid`` mask (windows overlapping the first collision
    frame are invalid — post-crash frames teach models to park).
  """
  global _device_pack_jit
  if _device_pack_jit is None:
    import jax
    _device_pack_jit = jax.jit(_device_pack_windows_impl,
                               static_argnums=(1, 2, 3, 4, 5))
  return _device_pack_jit(collected, tuple(modalities), past_length,
                          future_length, num_frame_skips,
                          tuple(image_size) if image_size else None)


_device_pack_jit = None
_device_gather_jit = None


def _device_pack_windows_impl(collected, modalities, past_length,
                              future_length, num_frame_skips,
                              image_size=None):
  import jax
  import jax.numpy as jnp

  loc = collected["location"]            # [T, B, 3]
  rot = collected["rotation"]            # [T, B, 3]
  T = loc.shape[0]
  centers = np.arange(past_length, T - future_length, num_frame_skips)

  collided = collected["collision"] > 0  # [T, B]
  crash_t = jnp.where(jnp.any(collided, axis=0),
                      jnp.argmax(collided, axis=0), T)        # [B]
  valid = (centers[:, None] + future_length) < crash_t[None, :]  # [C, B]

  # Window gathers with static index grids: [C, W, B, 3] -> [C, B, W, 3].
  past_idx = centers[:, None] + np.arange(-past_length, 0)[None, :]
  fut_idx = centers[:, None] + np.arange(1, future_length + 1)[None, :]
  cur_loc = loc[centers].astype(jnp.float32)                  # [C, B, 3]
  cur_rot = rot[centers].astype(jnp.float32)
  past_w = jnp.transpose(loc[past_idx], (0, 2, 1, 3))
  fut_w = jnp.transpose(loc[fut_idx], (0, 2, 1, 3))
  player_past = tf_ops.world2local(
      current_location=cur_loc, current_rotation=cur_rot,
      world_locations=past_w.astype(jnp.float32))
  player_future = tf_ops.world2local(
      current_location=cur_loc, current_rotation=cur_rot,
      world_locations=fut_w.astype(jnp.float32))

  out = {"player_past": player_past, "player_future": player_future,
         "location": cur_loc, "rotation": cur_rot,
         "valid": valid}
  for key in modalities:
    value = collected[key][centers]                           # [C, B, ...]
    if value.ndim == 2:
      value = value[..., None]  # match host np.atleast_1d per-sample
    if key in _QUANTIZABLE_MODALITIES:
      if value.dtype == jnp.uint8:
        # Already resized + quantised inside the rollout's
        # collect_transform (uint8 per-step storage is what keeps a
        # large-chunk [T, B, H, W, C] stack inside HBM) — pure gather.
        out[key] = value
        continue
      if image_size is not None and value.ndim >= 4:
        # Pack at model input resolution: the trainers' first transform
        # is this exact bilinear resize (models/transforms.py
        # `downsample_visual_features`), so doing it at pack time is
        # equivalence-preserving and cuts disk/HBM/link cost by
        # (H*W)/(h*w) — the lever that lets a 10x dataset stay
        # device-resident.
        value = jax.image.resize(
            value.astype(jnp.float32),
            value.shape[:-3] + tuple(image_size) + value.shape[-1:],
            method="bilinear")
      # Allowlisted image modalities are contractually in [0, 1] (BEV
      # splat clips to 5 pts/px and divides by 5; cameras emit [0, 1]);
      # the clip below only guards float rounding at the boundaries.
      value = jnp.clip(jnp.round(value.astype(jnp.float32) * 255.0),
                       0, 255).astype(jnp.uint8)
    else:
      # Host path casts every modality to float32 (`collect_packed`'s
      # numpy loop) — keep on-disk dtypes identical across both paths.
      value = value.astype(jnp.float32)
    out[key] = value
  return out


def _prefetch_iterator(iterator, depth: int):
  """Runs `iterator` in a daemon thread, buffering `depth` items."""
  import queue
  import threading

  q: "queue.Queue" = queue.Queue(maxsize=depth)
  sentinel = object()

  def worker():
    try:
      for item in iterator:
        q.put(item)
    finally:
      q.put(sentinel)

  threading.Thread(target=worker, daemon=True).start()
  while True:
    item = q.get()
    if item is sentinel:
      return
    yield item


class CARLADataset(Dataset):
  """The autopilot expert demonstrations dataset."""

  def __init__(self, id: str) -> None:  # pylint: disable=redefined-builtin
    if id not in ("raw", "examples", "processed"):
      raise ValueError("Unrecognised CARLA dataset id {}".format(id))
    self.id = id
    super().__init__()

  def _get_uuid(self) -> str:
    return "CARLATown01Autopilot{}-v0".format(self.id)

  @property
  def info(self) -> Mapping[str, Any]:
    return dict(
        uuid=self.uuid,
        town="Town01",
        agent="oatomobile_tpu.baselines.rulebased.AutopilotAgent",
        noise=0.2,
    )

  @property
  def url(self) -> str:
    """Hosted URL of the reference dataset (datasets/carla.py:70-80)."""
    return ("https://www.cs.ox.ac.uk/people/angelos.filos/data/"
            "oatomobile/{}.zip".format(self.id))

  def download_and_prepare(self, output_dir: str) -> None:
    """Downloads and extracts the hosted dataset.

    Requires network egress; in air-gapped environments use
    :meth:`collect` / :meth:`collect_batched` to generate demonstrations
    locally instead.
    """
    import urllib.request
    os.makedirs(output_dir, exist_ok=True)
    zfname = os.path.join(output_dir, "{}.zip".format(self.id))
    urllib.request.urlretrieve(self.url, zfname)
    with zipfile.ZipFile(zfname) as zfile:
      zfile.extractall(output_dir)
    os.remove(zfname)

  # -- loading -----------------------------------------------------------

  @staticmethod
  def load_datum(
      fname: str,
      modalities: Sequence[str],
      mode: bool,
      dataformat: str = "HWC",
      signed_mode: bool = False,
  ) -> Mapping[str, np.ndarray]:
    """Loads a single ``.npz`` datum (datasets/carla.py:107-164).

    By default the ``mode`` label {0 FORWARD, 1 STOP, 2 LEFT, 3 RIGHT}
    follows the reference rule *including its quirk*: theta =
    degrees(arccos(x/r)) is always >= 0, so the reference's RIGHT branch
    (theta <= -15, datasets/carla.py:154) is unreachable and right turns
    label as FORWARD.  Preserved for byte-level dataset parity; pass
    ``signed_mode=True`` for the fixed rule the trainers use (see
    `derive_mode_labels`).
    """
    assert dataformat in ("HWC", "CHW")
    dtype = np.float32
    sample = dict()

    with np.load(fname) as datum:
      for attr in modalities:
        value = np.atleast_1d(datum[attr]).astype(dtype)
        if value.ndim == 3 and dataformat == "CHW":
          value = np.transpose(value, (2, 0, 1))
        sample[attr] = value

    if mode and "player_future" in sample:
      sample["mode"] = derive_mode_labels(
          sample["player_future"][None], signed=signed_mode)[0]

    sample["name"] = fname
    return sample

  # -- collection -----------------------------------------------------------

  @staticmethod
  def collect(
      town: str,
      output_dir: str,
      num_vehicles: int,
      num_pedestrians: int,
      num_steps: int = 1000,
      spawn_point: Optional[int] = None,
      destination: Optional[int] = None,
      sensors: Sequence[str] = (
          "acceleration",
          "velocity",
          "lidar",
          "is_at_traffic_light",
          "traffic_light_state",
          "actors_tracker",
      ),
      render: bool = False,
  ) -> None:
    """Collects one autopilot episode (datasets/carla.py:166-235)."""
    from oatomobile_tpu.baselines.rulebased import AutopilotAgent
    from oatomobile_tpu.core.loop import EnvironmentLoop
    from oatomobile_tpu.core.rl import (FiniteHorizonWrapper,
                                        SaveToDiskWrapper)
    from oatomobile_tpu.envs.carla import (CARLAEnv,
                                           TerminateOnCollisionWrapper)

    os.makedirs(output_dir, exist_ok=True)
    env = CARLAEnv(
        town=town,
        sensors=sensors,
        spawn_point=spawn_point,
        destination=destination,
        num_vehicles=num_vehicles,
        num_pedestrians=num_pedestrians,
    )
    env = TerminateOnCollisionWrapper(env)
    env = SaveToDiskWrapper(env=env, output_dir=output_dir)
    env = FiniteHorizonWrapper(env=env, max_episode_steps=num_steps)
    EnvironmentLoop(
        agent_fn=AutopilotAgent,
        environment=env,
        render_mode="human" if render else "none",
    ).run()

  @staticmethod
  def collect_batched(
      town: str,
      output_dir: str,
      num_episodes: int = 16,
      num_steps: int = 1000,
      num_vehicles: int = 0,
      sensors: Sequence[str] = (
          "location",
          "rotation",
          "velocity",
          "acceleration",
          "lidar",
          "is_at_traffic_light",
          "traffic_light_state",
          "goal",
          "collision",
          "lane_invasion",
          "control",
      ),
      seed: int = 0,
      noise: float = 0.0,
  ) -> Sequence[str]:
    """TPU-native collection: one vmapped autopilot rollout produces
    `num_episodes` episodes in a single device computation, then flushes
    them to per-step npz files compatible with :meth:`process`.

    Args:
      noise: expert epsilon-noise (the reference's hosted dataset used
        0.2 — datasets/carla.py:63-68).

    Returns the episode tokens written.
    """
    import jax as _jax
    from oatomobile_tpu.envs.batched import BatchedEnv
    from oatomobile_tpu.sim import autopilot_policy

    os.makedirs(output_dir, exist_ok=True)
    env = BatchedEnv(
        town=town,
        batch_size=num_episodes,
        sensors=sensors,
        num_vehicles=num_vehicles,
        seed=seed,
        auto_reset=False,
    )
    policy = None
    if noise > 0.0:
      def policy(params, states):  # noqa: E306
        return _jax.vmap(
            lambda s: autopilot_policy(params, s, noise=noise))(states)
    _, collected, _ = env.rollout(num_steps, policy=policy,
                                  collect=tuple(sensors))
    collected = {k: np.asarray(v) for k, v in collected.items()}

    from oatomobile_tpu.core.dataset import tokens as token_gen
    written = []
    for n in range(num_episodes):
      episode = Episode(output_dir, next(token_gen))
      episode.append_batch(
          {k: v[:, n] for k, v in collected.items()})
      written.append(episode.token)
    return written

  @classmethod
  def collect_packed(
      cls,
      town: str,
      output_dir: str,
      num_episodes: int = 64,
      num_steps: int = 400,
      modalities: Sequence[str] = (
          "lidar",
          "velocity",
          "acceleration",
          "is_at_traffic_light",
          "traffic_light_state",
          "goal",
      ),
      future_length: int = 80,
      past_length: int = 20,
      num_frame_skips: int = 5,
      num_vehicles: int = 0,
      noise: float = 0.0,
      seed: int = 0,
      chunk_episodes: int = 24,
      device_pack: bool = True,
      image_size: Optional[Sequence[int]] = None,
  ) -> int:
    """Device-to-training-set pipeline: batched autopilot rollouts are
    windowed (past/future ego-frame trajectories) *in memory* and written
    straight to the packed format — no intermediate per-step npz files.

    Equivalent to collect() + process() + pack() fused; for a 64-episode
    dataset this skips ~25k compressed-npz round trips on the host.

    With ``device_pack`` (default) the windowing/ego-frame/quantisation
    runs on device (`_device_pack_windows`) and only training-ready
    arrays are fetched — ~26x less host-link transfer than fetching the
    raw float32 sensor stacks, which dominates wall-clock when the
    accelerator is remote.  ``device_pack=False`` keeps the host-numpy
    path (float64 transforms; equivalence covered by tests).

    ``image_size``: when given (e.g. ``(100, 100)``), image modalities
    are bilinearly resized ON DEVICE to this shape before quantisation —
    the trainers' own first transform, applied at pack time.  Device-pack
    path only.

    Returns the number of training samples written.
    """
    import jax as _jax
    import json as _json

    if image_size is not None and not device_pack:
      raise ValueError("image_size requires device_pack=True")
    from oatomobile_tpu.envs.batched import BatchedEnv
    from oatomobile_tpu.ops import transforms as tf_ops_mod
    from oatomobile_tpu.sim import autopilot_policy

    os.makedirs(output_dir, exist_ok=True)
    sensors = tuple(set(modalities) | {"location", "rotation",
                                       "collision"})
    buffers: dict = {key: [] for key in list(modalities) +
                     ["player_past", "player_future", "location",
                      "rotation"]}

    collect_transform = None
    if device_pack and image_size is not None:
      import jax.numpy as _jnp

      def collect_transform(obs):  # noqa: E306
        """Resize + uint8-quantise image modalities per step, inside the
        rollout scan — the [T, B, H, W, C] float32 stack of a large
        chunk would not fit HBM (e.g. 128 x 500 x 200x200x2 f32 =
        20 GB; 100x100 uint8 = 1.3 GB)."""
        out = dict(obs)
        for key, value in obs.items():
          if key in _QUANTIZABLE_MODALITIES and value.ndim >= 3:
            value = _jax.image.resize(
                value, value.shape[:-3] + tuple(image_size) +
                value.shape[-1:], method="bilinear")
            out[key] = _jnp.clip(_jnp.round(value * 255.0), 0,
                                 255).astype(_jnp.uint8)
        return out

    done = 0
    while done < num_episodes:
      n = min(chunk_episodes, num_episodes - done)
      env = BatchedEnv(town=town, batch_size=n, sensors=sensors,
                       num_vehicles=num_vehicles, seed=seed + done,
                       auto_reset=False)
      policy = None
      if noise > 0.0:
        def policy(params, states):  # noqa: E306
          return _jax.vmap(lambda s: autopilot_policy(
              params, s, noise=noise))(states)
      _, collected, _ = env.rollout(num_steps, policy=policy,
                                    collect=sensors,
                                    collect_transform=collect_transform)
      done += n

      if device_pack:
        packed = _device_pack_windows(collected, modalities, past_length,
                                      future_length, num_frame_skips,
                                      image_size=image_size)
        packed = {k: np.asarray(v) for k, v in packed.items()}  # fetch
        # Episode-major sample order, matching the host loop (for b: for i).
        mask = packed.pop("valid").T.reshape(-1)                # [B*C]
        for key, value in packed.items():
          value = np.swapaxes(value, 0, 1)                      # [B, C, ...]
          flat = value.reshape((-1,) + value.shape[2:])
          buffers[key].append(flat[mask])
        continue

      collected = {k: np.asarray(v) for k, v in collected.items()}
      locations = collected["location"]      # [T, B, 3]
      rotations = collected["rotation"]      # [T, B, 3]
      T, B = locations.shape[:2]
      # Windows are only cut from PRE-collision driving: a crashed scene
      # sits pinned against the obstacle for the rest of the rollout, and
      # those stationary frames would teach the imitation models to park
      # (the reference's collect wraps the env in
      # TerminateOnCollisionWrapper for the same reason,
      # datasets/carla.py:224-228).
      collided = np.asarray(collected["collision"]) > 0  # [T, B]
      crash_t = np.where(collided.any(axis=0),
                         collided.argmax(axis=0), T)     # [B]
      centers = np.arange(past_length, T - future_length, num_frame_skips)
      for b in range(B):
        loc_b = locations[:, b].astype(np.float64)
        for i in centers:
          if i + future_length >= crash_t[b]:
            continue
          past = tf_ops_mod.np_world2local(
              current_location=loc_b[i], current_rotation=rotations[i, b],
              world_locations=loc_b[i - past_length:i])
          future = tf_ops_mod.np_world2local(
              current_location=loc_b[i], current_rotation=rotations[i, b],
              world_locations=loc_b[i + 1:i + future_length + 1])
          buffers["player_past"].append(past.astype(np.float32))
          buffers["player_future"].append(future.astype(np.float32))
          buffers["location"].append(locations[i, b])
          buffers["rotation"].append(rotations[i, b])
          for key in modalities:
            value = np.atleast_1d(collected[key][i, b]).astype(np.float32)
            buffers[key].append(value)

    keys = sorted(buffers.keys())
    stack = np.concatenate if device_pack else np.stack
    stacked = {key: stack(buffers[key]) for key in keys}
    quantized = _save_packed_arrays(output_dir, stacked)
    num_samples = len(stacked["player_future"])
    with open(os.path.join(output_dir, "manifest.json"), "w") as fp:
      _json.dump({"num_samples": num_samples, "modalities": keys,
                  "quantized": quantized}, fp)
    return num_samples

  # -- processing -----------------------------------------------------------

  @staticmethod
  def process(
      dataset_dir: str,
      output_dir: str,
      future_length: int = 80,
      past_length: int = 20,
      num_frame_skips: int = 5,
  ) -> None:
    """Converts raw episodes to imitation examples
    (datasets/carla.py:237-325): sliding windows with ego-frame
    player_past / player_future trajectories."""
    os.makedirs(output_dir, exist_ok=True)

    for episode_token in os.listdir(dataset_dir):
      episode = Episode(parent_dir=dataset_dir, token=episode_token)
      try:
        sequence = episode.fetch()
      except FileNotFoundError:
        continue
      if len(sequence) < past_length + future_length + 1:
        continue

      # Load all locations once (the reference re-read every npz per
      # window — O(T^2) file reads; this is O(T)).
      observations = [episode.read_sample(tok) for tok in sequence]
      locations = np.stack([obs["location"] for obs in observations])

      for i in range(past_length, len(sequence) - future_length,
                     num_frame_skips):
        observation = observations[i]
        current_location = observation["location"]
        current_rotation = observation["rotation"]

        player_past = tf_ops.np_world2local(
            current_location=current_location,
            current_rotation=current_rotation,
            world_locations=locations[i - past_length:i])
        player_future = tf_ops.np_world2local(
            current_location=current_location,
            current_rotation=current_rotation,
            world_locations=locations[i + 1:i + future_length + 1])

        np.savez_compressed(
            os.path.join(output_dir, "{}.npz".format(sequence[i])),
            **observation,
            player_future=player_future.astype(np.float32),
            player_past=player_past.astype(np.float32))

  # -- visualisation -----------------------------------------------------------

  @staticmethod
  def plot_datum(fname: str, output_dir: str) -> None:
    """Visualises a datum (datasets/carla.py:327-483)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    COLORS = ["#0071bc", "#d85218", "#ecb01f", "#7d2e8d"]
    os.makedirs(output_dir, exist_ok=True)
    datum = np.load(fname)

    if "lidar" in datum:
      bev_meters = 25.0
      lidar = datum["lidar"]
      rgb = np.zeros(lidar.shape[:2] + (3,), dtype=np.float32)
      rgb[..., 0] = lidar[..., 0]
      rgb[..., 1] = lidar[..., 1]
      fig, ax = plt.subplots(figsize=(3.0, 3.0))
      ax.imshow(np.transpose(rgb, (1, 0, 2)),
                extent=(-bev_meters, bev_meters, bev_meters, -bev_meters))
      ax.set(frame_on=False)
      ax.get_xaxis().set_visible(False)
      ax.get_yaxis().set_visible(False)
      fig.savefig(os.path.join(output_dir, "lidar.png"),
                  bbox_inches="tight", pad_inches=0, transparent=True)
      plt.close(fig)

    for key in ("bird_view_camera_rgb", "bird_view_camera_cityscapes",
                "front_camera_rgb"):
      if key not in datum:
        continue
      fig, ax = plt.subplots(figsize=(3.0, 3.0))
      ax.imshow(datum[key])
      for traj_key, color in (("player_past", COLORS[0]),
                              ("player_future", COLORS[1])):
        if traj_key in datum:
          traj = datum[traj_key]
          ax.plot(traj[..., 1], -traj[..., 0], marker="o", markersize=3,
                  color=color, alpha=0.3)
      ax.set(frame_on=False)
      ax.get_xaxis().set_visible(False)
      ax.get_yaxis().set_visible(False)
      fig.savefig(os.path.join(output_dir, "{}.png".format(key)),
                  bbox_inches="tight", pad_inches=0, transparent=True)
      plt.close(fig)

  @classmethod
  def plot_coverage(cls, dataset_dir: str, output_fname: str,
                    color: int = 0) -> None:
    """Scatter of all trajectory locations (datasets/carla.py:485-547)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    COLORS = ["#0071bc", "#d85218", "#ecb01f", "#7d2e8d", "#76ab2f"]
    data_files = glob.glob(os.path.join(dataset_dir, "**", "*.npz"),
                           recursive=True)
    locations = []
    for npz_fname in data_files:
      try:
        locations.append(
            cls.load_datum(npz_fname, modalities=["location"],
                           mode=False)["location"])
      except Exception as e:  # pylint: disable=broad-except
        if isinstance(e, KeyboardInterrupt):
          sys.exit(0)
    locations = np.asarray(locations)
    fig, ax = plt.subplots(figsize=(3.0, 3.0))
    ax.scatter(locations[..., 0], locations[..., 1], s=5, alpha=0.1,
               color=COLORS[color % len(COLORS)])
    ax.set(title=dataset_dir, frame_on=False)
    ax.get_xaxis().set_visible(False)
    ax.get_yaxis().set_visible(False)
    fig.savefig(output_fname, bbox_inches="tight", pad_inches=0,
                transparent=True)
    plt.close(fig)

  # -- packed format -----------------------------------------------------------

  @classmethod
  def pack(
      cls,
      dataset_dir: str,
      output_dir: str,
      modalities: Sequence[str],
      mode: bool = False,
  ) -> int:
    """Packs per-sample npz files into stacked .npy arrays (one per
    modality) + a manifest — the fast-IO training format.

    Per-sample compressed npz (the reference's on-disk layout,
    core/dataset.py:51-56) costs a zlib inflate + python roundtrip per
    sample per epoch; packed arrays are memory-mapped and batch assembly
    is one fancy-index.  ~two orders of magnitude faster on a single-core
    host.

    Returns the number of samples packed.
    """
    import json as _json
    os.makedirs(output_dir, exist_ok=True)
    filenames = sorted(glob.glob(os.path.join(dataset_dir, "*.npz")))
    if not filenames:
      raise FileNotFoundError("No .npz files in {}".format(dataset_dir))
    keys = list(modalities) + (["mode"] if mode else [])
    buffers = {key: [] for key in keys}
    for fname in filenames:
      sample = cls.load_datum(fname, modalities, mode, dataformat="HWC")
      for key in keys:
        buffers[key].append(sample[key])
    stacked = {key: np.stack(buffers[key]) for key in keys}
    quantized = _save_packed_arrays(output_dir, stacked)
    manifest = {"num_samples": len(filenames), "modalities": keys,
                "quantized": quantized}
    with open(os.path.join(output_dir, "manifest.json"), "w") as fp:
      _json.dump(manifest, fp)
    return len(filenames)

  @classmethod
  def as_jax_packed(
      cls,
      packed_dir: str,
      batch_size: int,
      shuffle: bool = True,
      seed: int = 0,
      drop_remainder: bool = True,
      dequantize: bool = False,
      split: Optional[str] = None,
      val_fraction: float = 0.05,
      split_seed: int = 1234,
      mode: bool = False,
      signed_mode: bool = True,
  ) -> Generator[Mapping[str, np.ndarray], None, None]:
    """Yields batches from a packed dataset via memory-mapped reads.

    ``mode``: derive the {FORWARD, STOP, LEFT, RIGHT} command label from
    ``player_future`` per batch.  Labels use the SIGNED angle rule by
    default so training conditioning matches the eval-time policy (see
    `derive_mode_labels` — the reference's unsigned quirk made RIGHT
    unreachable in training while eval emitted it); pass
    ``signed_mode=False`` for the reference rule.

    Quantised (uint8) image modalities are yielded as uint8 by default —
    4x less host->device transfer; consumers divide by 255 *inside* jit
    (free on device).  Pass dequantize=True for host-side float batches.

    ``split``: ``"train"``/``"val"`` carve a deterministic held-out
    validation set from the pack (last ``val_fraction`` of a fixed
    ``split_seed`` permutation) — the role of the reference's separate
    val DataLoader (dim/train.py:155-165), without a second on-disk copy.
    """
    import json as _json
    with open(os.path.join(packed_dir, "manifest.json")) as fp:
      manifest = _json.load(fp)
    quantized = set(manifest.get("quantized", []))
    arrays = {
        key: np.load(os.path.join(packed_dir, "{}.npy".format(key)),
                     mmap_mode="r")
        for key in manifest["modalities"]
    }
    n = manifest["num_samples"]
    indices = cls.packed_split_indices(n, split, val_fraction=val_fraction,
                                       split_seed=split_seed)
    n = len(indices)
    order = indices
    if shuffle:
      order = order.copy()
      np.random.RandomState(seed).shuffle(order)
    stop = n - (n % batch_size) if drop_remainder else n
    for start in range(0, stop, batch_size):
      idx = np.sort(order[start:start + batch_size])
      batch = {}
      for key, arr in arrays.items():
        value = np.asarray(arr[idx])
        if key in quantized and dequantize:
          value = value.astype(np.float32) / 255.0
        batch[key] = value
      if mode and "player_future" in batch:
        batch["mode"] = derive_mode_labels(batch["player_future"],
                                           signed=signed_mode)
      yield batch

  @staticmethod
  def packed_split_indices(n: int, split: Optional[str],
                           val_fraction: float = 0.05,
                           split_seed: int = 1234) -> np.ndarray:
    """Deterministic train/val index split of a packed dataset: the last
    ``val_fraction`` of a fixed-``split_seed`` permutation is val.  Every
    consumer (streaming loader, device-resident loader) derives its
    indices here, so the splits always agree."""
    if split is None:
      return np.arange(n)
    perm = np.random.RandomState(split_seed).permutation(n)
    num_val = max(1, int(round(n * val_fraction)))
    return (np.sort(perm[:-num_val]) if split == "train"
            else np.sort(perm[-num_val:]))

  @staticmethod
  def restart_transition_indices(packed_dir: str,
                                 speed_thresh: float = 1.0,
                                 move_thresh: float = 2.0) -> np.ndarray:
    """Indices of stopped->restart samples in a packed dataset: ego speed
    below ``speed_thresh`` m/s while the expert's future leaves a
    ``move_thresh``-metre disc (ego frame, so |future[-1]| is total
    displacement over the plan horizon).

    Imitation-inertia counter-measure at the DATA level: closed-loop
    learned agents stall because v~0 states whose label says "go" are a
    sliver of on-policy driving data (most v~0 frames are red lights and
    queue holds where the label is also ~0), so the restart behaviour is
    under-trained and the policy's own stop becomes absorbing.  Trainers
    tile these indices ``oversample_restarts`` extra times into the epoch
    order — a pure sampling change, no new data and no bridge heuristics.
    Reads only the two small modalities via mmap; never touches images.
    """
    vel = np.load(os.path.join(packed_dir, "velocity.npy"), mmap_mode="r")
    fut = np.load(os.path.join(packed_dir, "player_future.npy"),
                  mmap_mode="r")
    speed = np.linalg.norm(np.asarray(vel[:, :2], dtype=np.float32),
                           axis=-1)
    disp = np.linalg.norm(np.asarray(fut[:, -1, :2], dtype=np.float32),
                          axis=-1)
    return np.where((speed < speed_thresh) & (disp > move_thresh))[0]

  @classmethod
  def load_packed_to_device(cls, packed_dir: str,
                            modalities: Optional[Sequence[str]] = None):
    """Uploads a packed dataset to the accelerator ONCE.

    Streaming loaders re-upload every batch every epoch — for a 15k-sample
    BEV dataset that is ~1.2 GB/epoch over the host link, 100x the size
    of the dataset itself across a long run.  The whole pack (uint8
    images stay uint8; consumers dequantise in-graph) usually fits in a
    fraction of HBM, so train-time batch assembly can be a pure device
    gather (`iter_device_batches`) with zero steady-state host traffic.

    Returns (dict of device arrays [N, ...], num_samples).
    """
    import jax
    import jax.numpy as jnp
    import json as _json
    with open(os.path.join(packed_dir, "manifest.json")) as fp:
      manifest = _json.load(fp)
    keys = manifest["modalities"]
    if modalities is not None:
      keep = set(modalities)
      keys = [k for k in keys if k in keep]

    max_chunk = 1 << 30  # 1 GiB per transfer: multi-GB single buffers

    # exhaust the tunneled transfer path (measured: a 4.1 GB device_put
    # of the 204k-sample round-3 lidar pack raised ResourceExhausted
    # where 4 x 1 GiB slices + one on-device concat succeed).
    def put(path):
      arr = np.load(path, mmap_mode="r")
      if arr.nbytes <= max_chunk:
        return jax.device_put(np.asarray(arr))
      rows = max(1, max_chunk // max(arr[:1].nbytes, 1))
      parts = [
          jax.device_put(np.ascontiguousarray(arr[i:i + rows]))
          for i in range(0, arr.shape[0], rows)
      ]
      return jnp.concatenate(parts, axis=0)

    data = {
        key: put(os.path.join(packed_dir, "{}.npy".format(key)))
        for key in keys
    }
    return data, manifest["num_samples"]

  @classmethod
  def iter_device_batches(cls, data, indices: np.ndarray, batch_size: int,
                          *, shuffle: bool = True, seed: int = 0,
                          drop_remainder: bool = True):
    """Yields batches gathered ON DEVICE from resident arrays
    (`load_packed_to_device`); only the [batch] index vector crosses the
    host link per step."""
    global _device_gather_jit
    if _device_gather_jit is None:
      import jax
      _device_gather_jit = jax.jit(
          lambda data, idx: {k: v[idx] for k, v in data.items()})
    import jax.numpy as jnp
    order = np.asarray(indices)
    if shuffle:
      order = order.copy()
      np.random.RandomState(seed).shuffle(order)
    n = len(order)
    stop = n - (n % batch_size) if drop_remainder else n
    for start in range(0, stop, batch_size):
      idx = np.sort(order[start:start + batch_size])
      yield _device_gather_jit(data, jnp.asarray(idx))

  @staticmethod
  def is_packed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "manifest.json"))

  @staticmethod
  def merge_packed(packed_dirs: Sequence[str], output_dir: str) -> int:
    """Concatenates several packed datasets into one (e.g. collection
    runs with different traffic densities / seeds).  Modalities must
    match; a modality is stored quantised iff it is quantised in every
    input.  Returns the merged sample count."""
    import json as _json
    os.makedirs(output_dir, exist_ok=True)
    manifests = []
    for d in packed_dirs:
      with open(os.path.join(d, "manifest.json")) as fp:
        manifests.append(_json.load(fp))
    keys = manifests[0]["modalities"]
    for m in manifests[1:]:
      if m["modalities"] != keys:
        raise ValueError("Modalities differ across packs: {} vs {}".format(
            keys, m["modalities"]))
    quantized = set(manifests[0].get("quantized", []))
    for m in manifests[1:]:
      quantized &= set(m.get("quantized", []))
    total = 0
    for key in keys:
      parts = []
      for d, m in zip(packed_dirs, manifests):
        arr = np.load(os.path.join(d, "{}.npy".format(key)),
                      mmap_mode="r")
        if key in set(m.get("quantized", [])) and key not in quantized:
          arr = np.asarray(arr).astype(np.float32) / 255.0
        parts.append(arr)
      merged = np.concatenate([np.asarray(p) for p in parts], axis=0)
      np.save(os.path.join(output_dir, "{}.npy".format(key)), merged)
      total = len(merged)
    with open(os.path.join(output_dir, "manifest.json"), "w") as fp:
      _json.dump({"num_samples": total, "modalities": keys,
                  "quantized": sorted(quantized)}, fp)
    return total

  @classmethod
  def make_loader(cls, dataset_dir: str, modalities: Sequence[str],
                  batch_size: int, mode: bool = False, seed: int = 0,
                  prefetch: int = 0, split: Optional[str] = None,
                  val_fraction: float = 0.05):
    """Batch loader that auto-detects the packed format.

    ``prefetch`` runs the loader in a background thread; measured
    counterproductive on single-core hosts (GIL contention on the
    fancy-index gather), so it defaults off — enable on multi-core.

    ``split``: "train"/"val" for a deterministic held-out validation
    subset (packed format only; per-file datasets load everything)."""
    if cls.is_packed(dataset_dir):
      it = cls.as_jax_packed(
          dataset_dir, batch_size=batch_size, seed=seed, split=split,
          mode=mode,
          val_fraction=val_fraction,
          shuffle=(split != "val"),
          drop_remainder=(split != "val"))
    else:
      it = cls.as_jax(dataset_dir, modalities, batch_size=batch_size,
                      mode=mode, seed=seed)
    if prefetch <= 0:
      return it
    return _prefetch_iterator(it, prefetch)

  # -- framework adapters -----------------------------------------------------

  @classmethod
  def as_jax(
      cls,
      dataset_dir: str,
      modalities: Sequence[str],
      batch_size: int,
      mode: bool = False,
      shuffle: bool = True,
      seed: int = 0,
      drop_remainder: bool = True,
  ) -> Generator[Mapping[str, np.ndarray], None, None]:
    """Yields stacked numpy batches (NHWC images) for jit training —
    the TPU-native replacement for `as_torch`/`as_tensorflow`."""
    filenames = sorted(glob.glob(os.path.join(dataset_dir, "*.npz")))
    if not filenames:
      raise FileNotFoundError("No .npz files in {}".format(dataset_dir))
    rng = np.random.RandomState(seed)
    order = np.arange(len(filenames))
    if shuffle:
      rng.shuffle(order)
    batch = []
    for idx in order:
      sample = cls.load_datum(filenames[idx], modalities, mode,
                              dataformat="HWC")
      sample.pop("name", None)
      batch.append(sample)
      if len(batch) == batch_size:
        yield {
            key: np.stack([s[key] for s in batch])
            for key in batch[0]
        }
        batch = []
    if batch and not drop_remainder:
      yield {key: np.stack([s[key] for s in batch]) for key in batch[0]}

  @classmethod
  def as_numpy(
      cls,
      dataset_dir: str,
      modalities: Sequence[str],
      mode: bool = False,
  ) -> Generator[Mapping[str, np.ndarray], None, None]:
    """Unbatched numpy sample generator (datasets/carla.py:596-615)."""
    filenames = sorted(glob.glob(os.path.join(dataset_dir, "*.npz")))
    for npz_fname in filenames:
      yield cls.load_datum(npz_fname, modalities, mode, dataformat="HWC")

  @classmethod
  def as_torch(
      cls,
      dataset_dir: str,
      modalities: Sequence[str],
      transform: Optional[Callable[[Any], Any]] = None,
      mode: bool = False,
      only_array: bool = False,
  ):
    """PyTorch dataset adapter (datasets/carla.py:617-695)."""
    import torch

    class PyTorchDataset(torch.utils.data.Dataset):
      """Data reader for the expert demonstrations."""

      def __init__(self):
        self._npz_files = sorted(
            glob.glob(os.path.join(dataset_dir, "*.npz")))

      def __len__(self):
        return len(self._npz_files)

      def __getitem__(self, idx):
        sample = cls.load_datum(fname=self._npz_files[idx],
                                modalities=modalities, mode=mode,
                                dataformat="CHW")
        for key in list(sample):
          if not isinstance(sample[key], np.ndarray):
            sample.pop(key)
        if transform is not None:
          sample = {key: transform(val) for key, val in sample.items()}
        return sample

    return PyTorchDataset()

  @classmethod
  def as_tensorflow(cls, dataset_dir: str, modalities: Sequence[str],
                    mode: bool = False):
    """TensorFlow dataset adapter (datasets/carla.py:549-594).  Gated:
    raises ImportError when tensorflow is absent (it is not part of the
    single-stack TPU build)."""
    import tensorflow as tf  # noqa: F401

    filenames = sorted(glob.glob(os.path.join(dataset_dir, "*.npz")))
    output_shapes = {}
    with np.load(filenames[0]) as datum:
      for modality in modalities:
        output_shapes[modality] = tf.TensorShape(
            np.atleast_1d(datum[modality]).shape)
    if mode:
      output_shapes["mode"] = tf.TensorShape((1,))
    output_types = {m: tf.float32 for m in output_shapes}

    return tf.data.Dataset.from_generator(
        generator=lambda: (
            {k: v for k, v in cls.load_datum(f, modalities, mode,
                                             "HWC").items()
             if k != "name"} for f in filenames),
        output_types=output_types,
        output_shapes=output_shapes,
    )
