"""Town definitions and cached loading.

The five towns mirror the reference's available set
(/root/reference/oatomobile/simulators/carla/defaults.py:176-182) in
relative scale: Town01/Town02 are small training towns, Town03-05 are the
larger distribution-shift towns used by CARNOVEL.  Geometry is procedural
(see builder.py); each town provides enough spawn points to cover every
(origin, destination) index used by the CARNOVEL + CoRL2017 configs
(max index: Town01=256, Town02=100, Town03=257, Town04=365).
"""

import functools
import os
from typing import Tuple

import numpy as np

from oatomobile_tpu.maps.assets import TownMap
from oatomobile_tpu.maps.builder import build_grid_town

AVAILABLE_TOWNS = ("Town01", "Town02", "Town03", "Town04", "Town05")

# Street coordinates per town (vertical xs, horizontal ys).  Slightly
# irregular spacings give each town a distinct geometry.
_LAYOUTS = {
    "Town01": (
        (0.0, 88.0, 172.0, 264.0, 352.0),
        (0.0, 80.0, 164.0, 244.0, 330.0),
    ),
    "Town02": (
        (0.0, 72.0, 140.0, 204.0),
        (0.0, 64.0, 132.0, 196.0),
    ),
    "Town03": (
        (0.0, 84.0, 172.0, 258.0, 340.0, 428.0),
        (0.0, 76.0, 150.0, 228.0, 304.0, 380.0),
    ),
    "Town04": (
        (0.0, 92.0, 180.0, 272.0, 356.0, 448.0, 540.0),
        (0.0, 84.0, 168.0, 256.0, 340.0, 428.0, 512.0),
    ),
    "Town05": (
        (0.0, 80.0, 156.0, 240.0, 320.0, 400.0),
        (0.0, 72.0, 148.0, 224.0, 300.0, 376.0),
    ),
}

_CACHE_DIR = os.environ.get(
    "OATOMOBILE_TPU_MAP_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "oatomobile_tpu", "maps"))

_CACHE_VERSION = 4


def _cache_path(name: str) -> str:
  return os.path.join(_CACHE_DIR, "{}_v{}.npz".format(name, _CACHE_VERSION))


def _save_cache(town: TownMap, path: str) -> None:
  os.makedirs(os.path.dirname(path), exist_ok=True)
  arrays = {
      f.name: getattr(town, f.name)
      for f in town.__dataclass_fields__.values()
      if isinstance(getattr(town, f.name), np.ndarray)
  }
  np.savez_compressed(path, name=town.name, lane_width=town.lane_width,
                      raster_ppm=town.raster_ppm, **arrays)


def _load_cache(path: str) -> TownMap:
  with np.load(path, allow_pickle=False) as data:
    return TownMap(
        name=str(data["name"]),
        lane_width=float(data["lane_width"]),
        raster_ppm=float(data["raster_ppm"]),
        **{
            key: data[key] for key in data.files
            if key not in ("name", "lane_width", "raster_ppm")
        })


@functools.lru_cache(maxsize=None)
def load_town(name: str) -> TownMap:
  """Loads (building + caching on first use) the named town."""
  if name not in AVAILABLE_TOWNS:
    raise ValueError("Unknown town {!r}; available: {}".format(
        name, AVAILABLE_TOWNS))
  path = _cache_path(name)
  if os.path.exists(path):
    try:
      return _load_cache(path)
    except Exception:  # Corrupt cache: rebuild.
      pass
  xs, ys = _LAYOUTS[name]
  town = build_grid_town(name, xs, ys)
  try:
    _save_cache(town, path)
  except OSError:
    pass
  return town


def town_bounds(town: TownMap) -> Tuple[np.ndarray, np.ndarray]:
  """Returns (min_xy, max_xy) of the drivable area."""
  lo = town.raster_origin
  hi = lo + np.array(town.road_mask.shape, dtype=np.float32) / town.raster_ppm
  return lo, hi
