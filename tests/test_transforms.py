"""Tests for coordinate transforms vs. reference semantics.

Oracle: independent re-derivation of transforms3d.euler.euler2mat for the
'sxyz' convention (the reference used euler2mat(roll, pitch, yaw).T —
utils/carla.py:642-648), plus known-value and round-trip checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.ops import transforms as tf


def _oracle_euler2mat_sxyz(ai, aj, ak):
  """transforms3d.euler.euler2mat(ai, aj, ak, 'sxyz') re-derived: for static
  axes the matrix is Rz(ak) @ Ry(aj) @ Rx(ai)."""

  def rx(a):
    return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                     [0, np.sin(a), np.cos(a)]])

  def ry(a):
    return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                     [-np.sin(a), 0, np.cos(a)]])

  def rz(a):
    return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a),
                                                  np.cos(a), 0], [0, 0, 1]])

  return rz(ak) @ ry(aj) @ rx(ai)


@pytest.mark.parametrize("pitch,yaw,roll", [
    (0.0, 0.0, 0.0),
    (0.0, 90.0, 0.0),
    (0.0, -37.0, 0.0),
    (10.0, 45.0, -20.0),
    (-5.0, 181.0, 3.0),
])
def test_rot2mat_matches_reference_convention(pitch, yaw, roll):
  rotation = np.array([pitch, yaw, roll], dtype=np.float64)
  expected = _oracle_euler2mat_sxyz(np.deg2rad(roll), np.deg2rad(pitch),
                                    np.deg2rad(yaw)).T
  actual = np.asarray(tf.rot2mat(rotation, xp=np))
  np.testing.assert_allclose(actual, expected, atol=1e-12)


def test_world2local_point_ahead_is_positive_x():
  # Vehicle at origin with yaw=90deg faces +y in world; a point at (0, 5, 0)
  # is directly ahead -> local (5, 0, 0).
  loc = np.zeros(3)
  rot = np.array([0.0, 90.0, 0.0])
  out = tf.np_world2local(current_location=loc, current_rotation=rot,
                          world_locations=np.array([0.0, 5.0, 0.0]))
  np.testing.assert_allclose(out, [5.0, 0.0, 0.0], atol=1e-12)


def test_world_local_roundtrip_identity():
  rng = np.random.RandomState(0)
  loc = rng.randn(3)
  rot = rng.uniform(-180, 180, size=3)
  pts = rng.randn(7, 3)
  local = tf.np_world2local(current_location=loc, current_rotation=rot,
                            world_locations=pts)
  world = tf.np_local2world(current_location=loc, current_rotation=rot,
                            local_locations=local)
  np.testing.assert_allclose(world, pts, atol=1e-10)


def test_jax_matches_numpy_and_jits():
  rng = np.random.RandomState(1)
  loc = rng.randn(3).astype(np.float32)
  rot = rng.uniform(-180, 180, size=3).astype(np.float32)
  pts = rng.randn(5, 3).astype(np.float32)

  fn = jax.jit(lambda l, r, p: tf.world2local(
      current_location=l, current_rotation=r, world_locations=p))
  out_jax = np.asarray(fn(loc, rot, pts))
  out_np = tf.np_world2local(current_location=loc, current_rotation=rot,
                             world_locations=pts)
  # f32 trig on degree-scale angles vs the f64 oracle: ~1e-3 abs error.
  np.testing.assert_allclose(out_jax, out_np, atol=1e-2)


def test_world2local_2d_consistency_with_3d():
  rng = np.random.RandomState(2)
  xy = rng.randn(2)
  yaw_deg = 73.0
  pts2 = rng.randn(4, 2)
  pts3 = np.concatenate([pts2, np.zeros((4, 1))], axis=-1)

  out2 = np.asarray(
      tf.world2local_2d(current_xy=jnp.asarray(xy),
                        current_yaw_rad=jnp.deg2rad(yaw_deg),
                        world_xy=jnp.asarray(pts2)))
  out3 = tf.np_world2local(
      current_location=np.array([xy[0], xy[1], 0.0]),
      current_rotation=np.array([0.0, yaw_deg, 0.0]),
      world_locations=pts3)
  np.testing.assert_allclose(out2, out3[:, :2], atol=1e-5)


def test_local2world_2d_roundtrip():
  xy = jnp.array([3.0, -2.0])
  yaw = jnp.deg2rad(31.0)
  pts = jnp.array([[1.0, 0.5], [-2.0, 4.0]])
  local = tf.world2local_2d(current_xy=xy, current_yaw_rad=yaw, world_xy=pts)
  world = tf.local2world_2d(current_xy=xy, current_yaw_rad=yaw,
                            local_xy=local)
  np.testing.assert_allclose(np.asarray(world), np.asarray(pts), atol=1e-5)


def test_vmap_over_scenes():
  batch = 6
  rng = np.random.RandomState(3)
  locs = rng.randn(batch, 3).astype(np.float32)
  rots = rng.uniform(-180, 180, (batch, 3)).astype(np.float32)
  pts = rng.randn(batch, 4, 3).astype(np.float32)
  fn = jax.vmap(lambda l, r, p: tf.world2local(
      current_location=l, current_rotation=r, world_locations=p))
  out = np.asarray(fn(locs, rots, pts))
  for i in range(batch):
    expected = tf.np_world2local(current_location=locs[i],
                                 current_rotation=rots[i],
                                 world_locations=pts[i])
    np.testing.assert_allclose(out[i], expected, atol=1e-2)


def test_yaw_to_forward():
  fwd = np.asarray(tf.yaw_to_forward(0.0, xp=np))
  np.testing.assert_allclose(fwd, [1.0, 0.0, 0.0], atol=1e-12)
  fwd = np.asarray(tf.yaw_to_forward(90.0, xp=np))
  np.testing.assert_allclose(fwd, [0.0, 1.0, 0.0], atol=1e-12)
