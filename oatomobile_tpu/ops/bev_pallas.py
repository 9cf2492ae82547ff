"""Pallas TPU kernel for the BEV LIDAR splat (alternative backend).

One program per scene, image in VMEM, empty rect/box slots skipped with
``pl.when``, pixel coordinates from in-register iota.  Verified bit-exact
against the XLA path (ops/bev.py) — see tests/test_bev_pallas.py.

Status: measured on v5e at 1024 scenes x 16 vehicles, the fused XLA path
is slightly FASTER (36 ms vs 43 ms standalone): the per-slot VMEM
read-modify-write of the occupancy scratch outweighs the dynamic slot
skipping when most slots are live.  Kept as a correct, tested backend and
the substrate for tile-level culling (grid over row/col tiles with
per-tile bbox tests) if sparser scenes ever dominate; the default sensor
path stays on XLA.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oatomobile_tpu.ops import bev as bev_ref

BEV = bev_ref.BEV_SIZE  # 200
_BIN_LOW = float(bev_ref.BIN_LOW)
_BIN_WIDTH = float(bev_ref.BIN_WIDTH)


@functools.lru_cache(maxsize=1)
def _const_images():
  # Pure numpy (must be trace-safe: this may run inside a jit trace).
  c = bev_ref._pixel_centers().astype(np.float32)  # noqa: SLF001
  lx = np.broadcast_to(c[:, None], (BEV, BEV))
  ly = np.broadcast_to(c[None, :], (BEV, BEV))
  rng = np.maximum(np.sqrt(lx * lx + ly * ly), 1.0)
  # numpy twin of bev_ref._expected_obstacle_hits.
  az = bev_ref._PTS_PER_CHANNEL * bev_ref.BIN_WIDTH / (2 * np.pi * rng)  # noqa: SLF001
  span = (np.arctan2(bev_ref.LIDAR_Z, rng) -
          np.arctan2(bev_ref.LIDAR_Z - 1.6, rng))
  channels = span / np.deg2rad(
      (bev_ref.LIDAR_UPPER_FOV - bev_ref.LIDAR_LOWER_FOV) /
      bev_ref.LIDAR_CHANNELS)
  hits = az * np.maximum(channels, 1.0)
  counts = np.minimum(hits, float(
      bev_ref.HIST_MAX_PER_PIXEL)) / bev_ref.HIST_MAX_PER_PIXEL
  counts = np.where(
      np.sqrt(lx * lx + ly * ly) <= bev_ref.METERS_MAX, counts, 0.0)
  ground = bev_ref.ground_ring_image()
  return counts.astype(np.float32), ground.astype(np.float32)


def _kernel(hero_ref, walls_ref, roads_ref, boxes_ref, counts_ref,
            ground_ref, below_ref, above_ref, occ_ref, open_ref):
  hx = hero_ref[0, 0, 0]
  hy = hero_ref[0, 0, 1]
  cos_y = hero_ref[0, 0, 2]
  sin_y = hero_ref[0, 0, 3]

  # Hero-frame pixel centers from iota (no HBM fetch).  TPU iota must be
  # integer-typed; cast after.
  row = jax.lax.broadcasted_iota(jnp.int32, (BEV, BEV), 0).astype(
      jnp.float32)
  col = jax.lax.broadcasted_iota(jnp.int32, (BEV, BEV), 1).astype(
      jnp.float32)
  lx = _BIN_LOW + (row + 0.5) * _BIN_WIDTH
  ly = _BIN_LOW + (col + 0.5) * _BIN_WIDTH
  wx = hx + cos_y * lx - sin_y * ly
  wy = hy + sin_y * lx + cos_y * ly

  occ_ref[...] = jnp.zeros((BEV, BEV), jnp.float32)
  open_ref[...] = jnp.zeros((BEV, BEV), jnp.float32)

  def oriented_body(ref, out_ref):
    def body(k, _):
      hl = ref[0, k, 2]

      @pl.when(hl > 0.0)
      def _():
        cx = ref[0, k, 0]
        cy = ref[0, k, 1]
        hw = ref[0, k, 3]
        cr = ref[0, k, 4]
        sr = ref[0, k, 5]
        # Half-plane form, matching ops/bev.rects_occupancy bit-for-bit
        # (same association: center folded into scalar constants).
        cu = cr * cx + sr * cy
        cv = -sr * cx + cr * cy
        u = cr * wx + sr * wy - cu
        v = cr * wy - sr * wx - cv
        inside = (jnp.abs(u) <= hl) & (jnp.abs(v) <= hw)
        out_ref[...] = jnp.maximum(out_ref[...], inside.astype(jnp.float32))

      return 0

    return body

  # Walls + actor boxes paint occupancy; (pre-inflated) road corridors
  # paint the open-ground coverage where ground returns can exist.
  jax.lax.fori_loop(0, walls_ref.shape[1], oriented_body(walls_ref, occ_ref),
                    0)
  jax.lax.fori_loop(0, boxes_ref.shape[1], oriented_body(boxes_ref, occ_ref),
                    0)
  jax.lax.fori_loop(0, roads_ref.shape[1], oriented_body(roads_ref, open_ref),
                    0)

  occupied = occ_ref[...] > 0.0
  open_ground = open_ref[...] > 0.0
  above_ref[0] = jnp.where(occupied, counts_ref[...], 0.0)
  below_ref[0] = jnp.where(occupied | ~open_ground, 0.0, ground_ref[...])


def splat_lidar_batch(hero: jnp.ndarray, walls: jnp.ndarray,
                      roads: jnp.ndarray, boxes: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
  """Batched splat via the pallas kernel.

  Args:
    hero: [B, 4] (x, y, cos_yaw, sin_yaw).
    walls: [B, NW, 6] oriented wall rects; padded slots have non-positive
      half extents.
    roads: [B, NR, 6] oriented road-corridor rects, ALREADY inflated by
      the sidewalk margin (open-ground coverage).
    boxes: [B, NV, 6] oriented boxes (cx, cy, half_l, half_w, cos, sin).

  Returns:
    [B, 200, 200, 2] float32 (below, above).
  """
  B = hero.shape[0]
  counts, ground = _const_images()

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=0,
      grid=(B,),
      scratch_shapes=[
          pltpu.VMEM((BEV, BEV), jnp.float32),
          pltpu.VMEM((BEV, BEV), jnp.float32),
      ],
      in_specs=[
          pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, walls.shape[1], 6), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, roads.shape[1], 6), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, boxes.shape[1], 6), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((BEV, BEV), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((BEV, BEV), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, BEV, BEV), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, BEV, BEV), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
  )

  below, above = pl.pallas_call(
      _kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((B, BEV, BEV), jnp.float32),
          jax.ShapeDtypeStruct((B, BEV, BEV), jnp.float32),
      ],
      interpret=interpret,
  )(hero[:, None, :], walls, roads, boxes, jnp.asarray(counts),
    jnp.asarray(ground))
  return jnp.stack([below, above], axis=-1)


def gather_inputs(params, state):
  """XLA-side preparation of kernel inputs for ONE scene (vmap over
  scenes): nearest-k rect selection + box assembly — matching the
  selection semantics of ops/bev.splat_lidar."""
  hero = jnp.stack([
      state.hero_xy[0], state.hero_xy[1],
      jnp.cos(state.hero_yaw),
      jnp.sin(state.hero_yaw)
  ])
  walls = bev_ref.nearest_rects(params.map["wall_rects"], state.hero_xy,
                                min(bev_ref.MAX_BEV_WALLS,
                                    params.wall_budget),
                                max_range=bev_ref.METERS_MAX * 1.04)
  roads = bev_ref.nearest_rects(params.map["road_rects"], state.hero_xy,
                                min(bev_ref.MAX_BEV_ROADS,
                                    params.road_budget))
  # Pre-inflate corridor chords by the sidewalk margin (the XLA path
  # passes inflate= to rects_occupancy; the kernel takes them inflated).
  roads = roads.at[:, 2:4].add(
      jnp.where(roads[:, 2:3] > 0.0, bev_ref._SIDEWALK, 0.0))  # noqa: SLF001

  boxes = []
  if state.num_npcs > 0:
    rel = state.npc_xy - state.hero_xy[None, :]
    sel = bev_ref._nearest_k(rel, state.npc_alive,  # noqa: SLF001
                             bev_ref.MAX_BEV_VEHICLES)
    in_range = (jnp.linalg.norm(rel[sel], axis=-1) <
                bev_ref.METERS_MAX * 1.5) & state.npc_alive[sel]
    half_l = jnp.where(in_range, params.vehicle.length / 2.0, 0.0)
    boxes.append(
        jnp.stack([
            state.npc_xy[sel, 0], state.npc_xy[sel, 1], half_l,
            jnp.full_like(half_l, params.vehicle.width / 2.0),
            jnp.cos(state.npc_yaw[sel]),
            jnp.sin(state.npc_yaw[sel])
        ], axis=-1))
  if state.num_pedestrians > 0:
    rel = state.ped_xy - state.hero_xy[None, :]
    sel = bev_ref._nearest_k(rel, state.ped_alive,  # noqa: SLF001
                             bev_ref.MAX_BEV_PEDESTRIANS)
    in_range = (jnp.linalg.norm(rel[sel], axis=-1) <
                bev_ref.METERS_MAX * 1.5) & state.ped_alive[sel]
    half = jnp.where(in_range, 0.35, 0.0)
    boxes.append(
        jnp.stack([
            state.ped_xy[sel, 0], state.ped_xy[sel, 1], half, half,
            jnp.ones_like(half),
            jnp.zeros_like(half)
        ], axis=-1))
  if boxes:
    box_arr = jnp.concatenate(boxes, axis=0)
  else:
    box_arr = jnp.zeros((1, 6), jnp.float32)
  return hero, walls, roads, box_arr


def splat_lidar_pallas(params, states, interpret: bool = False):
  """Batched BEV splat for a SceneState with a leading batch axis."""
  hero, walls, roads, boxes = jax.vmap(
      lambda s: gather_inputs(params, s))(states)
  return splat_lidar_batch(hero, walls, roads, boxes, interpret=interpret)
