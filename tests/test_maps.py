"""Tests for procedural town maps and routing."""

import numpy as np
import pytest

from oatomobile_tpu.maps import (load_town, nearest_waypoint, plan_route,
                                 route_distances, shortest_route)
from oatomobile_tpu.maps.builder import (JUNCTION_HALF, LANE_OFFSET,
                                         WAYPOINT_SPACING)


@pytest.fixture(scope="module")
def town():
  return load_town("Town02")  # Smallest town: fastest to build/load.


def test_spawn_point_coverage_for_benchmarks():
  # Max spawn indices used by CARNOVEL/CoRL2017 configs per town.
  required = {"Town01": 257, "Town02": 101, "Town03": 258, "Town04": 366}
  for name, need in required.items():
    town = load_town(name)
    assert town.num_spawn_points >= need, name


def test_graph_is_closed(town):
  # Every waypoint has at least one successor, all indices valid.
  assert town.wp_num_next.min() >= 1
  assert town.wp_next.min() >= 0
  assert town.wp_next.max() < town.num_waypoints


def test_successor_spacing_and_heading(town):
  # Following primary successors moves ~WAYPOINT_SPACING per hop and the
  # stored yaw roughly matches the direction of motion.
  wp = int(town.spawn_wp[3])
  for _ in range(200):
    nwp = int(town.wp_next[wp, 0])
    delta = town.wp_xy[nwp] - town.wp_xy[wp]
    dist = np.linalg.norm(delta)
    assert 0.3 < dist < 2.5 * WAYPOINT_SPACING
    heading = np.arctan2(delta[1], delta[0])
    yaw_err = np.abs(np.angle(np.exp(1j * (heading - town.wp_yaw[wp]))))
    assert yaw_err < np.deg2rad(46.0)
    wp = nwp


def test_all_waypoints_reachable_roundtrip(town):
  # Any spawn point can route to any other (closed strongly-connected grid).
  rng = np.random.RandomState(0)
  for _ in range(5):
    a, b = rng.randint(town.num_spawn_points, size=2)
    o = int(town.spawn_wp[a])
    d = int(town.spawn_wp[b])
    path = shortest_route(town, o, d)
    assert path is not None
    assert path[0] == o and path[-1] == d


def test_route_padding_and_distances(town):
  o_loc, _ = town.spawn_transform(0)
  d_loc, _ = town.spawn_transform(50)
  route, length = plan_route(town, o_loc[:2], d_loc[:2], capacity=2048)
  assert route.shape == (2048,)
  assert (route[length:] == route[length - 1]).all()
  dists = route_distances(town, route, length)
  assert dists.shape == (length,)
  assert np.all(np.diff(dists) > 0)
  # Route length in meters ~ hops * spacing.
  assert dists[-1] == pytest.approx(length * WAYPOINT_SPACING, rel=0.2)


def test_nearest_waypoint_raster(town):
  # The nearest waypoint of a lane point is (close to) itself.
  for wp in town.spawn_wp[:10]:
    got = nearest_waypoint(town, town.wp_xy[wp])
    d = np.linalg.norm(town.wp_xy[got] - town.wp_xy[wp])
    assert d <= 1.5  # within raster quantisation


def test_lane_points_on_road(town):
  # All non-junction waypoints sit on the road mask, off the obstacle mask.
  idx = town.world_to_pixel(town.wp_xy)
  on_road = town.road_mask[idx[:, 0], idx[:, 1]]
  assert on_road.mean() > 0.99
  on_obstacle = town.obstacle_mask[idx[:, 0], idx[:, 1]]
  assert on_obstacle.mean() < 0.01


def test_lane_offset_from_center(town):
  # Straight-lane waypoints are LANE_OFFSET from the street centerline:
  # pick an eastbound waypoint (yaw ~ 0) and check its y sits 1.75 off a
  # horizontal street line.
  mask = (~town.wp_is_junction) & (np.abs(town.wp_yaw) < 1e-3)
  ys_lane = town.wp_xy[mask][:, 1] - LANE_OFFSET
  # All values should cluster near the street y-coordinates.
  from oatomobile_tpu.maps.towns import _GRIDS
  street_ys = np.asarray(_GRIDS["Town02"][1])
  err = np.min(np.abs(ys_lane[:, None] - street_ys[None, :]), axis=1)
  # Catmull-Rom endpoint tangents wobble a few mm; allow 2 cm.
  assert err.max() < 2e-2


def test_traffic_lights_governance(town):
  if len(town.tl_xy) == 0:
    pytest.skip("town has no lights")
  governed = np.nonzero(town.wp_tl >= 0)[0]
  assert len(governed) > 0
  # Governed waypoints are near their light (approach stop line).
  d = np.linalg.norm(
      town.wp_xy[governed] - town.tl_xy[town.wp_tl[governed]], axis=1)
  assert d.max() < 3 * JUNCTION_HALF
  assert set(np.unique(town.tl_group)) <= {0, 1}


def test_deterministic_rebuild(tmp_path, monkeypatch):
  # Building the same town twice gives identical arrays.
  from oatomobile_tpu.maps import builder
  from oatomobile_tpu.maps.towns import _GRIDS
  xs, ys = _GRIDS["Town02"]
  a = builder.build_grid_town("Town02", xs, ys)
  b = builder.build_grid_town("Town02", xs, ys)
  np.testing.assert_array_equal(a.wp_xy, b.wp_xy)
  np.testing.assert_array_equal(a.spawn_wp, b.spawn_wp)
  np.testing.assert_array_equal(a.nearest_wp, b.nearest_wp)
