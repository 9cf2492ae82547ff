"""Host-side rendering utilities.

Parity with the consumable surface of /root/reference/oatomobile/utils/
graphics.py (1,161 LoC of pygame): the map rasterisation moved into the
map builder (maps/builder.py) and the per-step dashboard into the
on-device bird-view renderer (sensors/synth.py); what remains host-side is
lightweight numpy/matplotlib: LIDAR->RGB, image downsampling, dashboards
for humans.
"""

from typing import Mapping, Optional, Sequence

import numpy as np


def lidar_2darray_to_rgb(array: np.ndarray) -> np.ndarray:
  """Returns a [H, W, 3] RGB visualisation of a 2-channel BEV LIDAR splat
  (semantics of graphics.py lidar_2darray_to_rgb: channels into colors)."""
  array = np.asarray(array)
  h, w = array.shape[:2]
  rgb = np.zeros((h, w, 3), dtype=np.float32)
  rgb[..., 0] = array[..., 0]          # below (ground) -> red
  rgb[..., 1] = array[..., 1]          # above (obstacles) -> green
  rgb[..., 2] = 0.2 * (array[..., 0] + array[..., 1])
  return np.clip(rgb, 0.0, 1.0)


def downsample(image: np.ndarray, factor: int = 1) -> np.ndarray:
  """Strided spatial downsampling (graphics.py downsample semantics)."""
  if factor <= 1:
    return image
  return image[::factor, ::factor]


def rgb_to_binary_mask(image: np.ndarray,
                       threshold: float = 0.1) -> np.ndarray:
  """Any-channel-active binary mask from an RGB image
  (graphics.py rgb_to_binary_mask semantics)."""
  image = np.asarray(image, dtype=np.float32)
  if image.max() > 1.5:
    image = image / 255.0
  return (image.max(axis=-1) > threshold).astype(np.int32)


def make_dashboard(observations: Mapping[str, np.ndarray],
                   output_fname: Optional[str] = None,
                   keys: Sequence[str] = ("bird_view_camera_rgb",
                                          "front_camera_rgb", "lidar")):
  """Composes available visual observations into one dashboard image
  (human-facing equivalent of graphics.py make_dashboard:204-382).

  Returns the matplotlib figure; saves a PNG when `output_fname` given.
  """
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  panels = []
  for key in keys:
    if key not in observations:
      continue
    value = np.asarray(observations[key])
    if key == "lidar":
      value = lidar_2darray_to_rgb(value)
    panels.append((key, value))
  if not panels:
    raise ValueError("No visual observations among {}".format(list(keys)))

  fig, axs = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
  if len(panels) == 1:
    axs = [axs]
  for ax, (key, value) in zip(axs, panels):
    ax.imshow(np.clip(value, 0.0, 1.0))
    ax.set_title(key)
    ax.axis("off")
  if output_fname is not None:
    fig.savefig(output_fname, bbox_inches="tight", pad_inches=0.1)
  return fig


def plot_trajectory_overlay(bev: np.ndarray,
                            trajectories: Mapping[str, np.ndarray],
                            meters: float = 25.0,
                            output_fname: Optional[str] = None):
  """Overlays ego-frame trajectories on a BEV image (the torch
  TensorBoardLogger's image panels, torch/loggers.py:55-141)."""
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  bev = np.asarray(bev)
  if bev.ndim == 3 and bev.shape[-1] == 2:
    bev = lidar_2darray_to_rgb(bev)
  fig, ax = plt.subplots(figsize=(4, 4))
  ax.imshow(np.transpose(bev, (1, 0, 2)),
            extent=(-meters, meters, meters, -meters))
  colors = ["#0071bc", "#d85218", "#ecb01f", "#7d2e8d", "#76ab2f"]
  for i, (label, traj) in enumerate(trajectories.items()):
    traj = np.asarray(traj)
    ax.plot(traj[..., 1], -traj[..., 0], marker="o", markersize=3,
            color=colors[i % len(colors)], alpha=0.6, label=label)
  ax.legend(loc="upper right", fontsize=7)
  ax.set(frame_on=False)
  ax.get_xaxis().set_visible(False)
  ax.get_yaxis().set_visible(False)
  if output_fname is not None:
    fig.savefig(output_fname, bbox_inches="tight", pad_inches=0,
                transparent=True)
  return fig
