"""Coordinate transforms between world and ego (local) frames.

Semantics match the reference exactly (/root/reference/oatomobile/utils/
carla.py:642-700): rotations are CARLA ``(pitch, yaw, roll)`` triplets in
*degrees*; ``rot2mat(rotation) = euler2mat(roll, pitch, yaw).T`` in the
static-xyz convention, i.e. ``(Rz(yaw) @ Ry(pitch) @ Rx(roll)).T``, and

    world2local(x) = R @ (x - loc)
    local2world(x) = R^{-1} @ x + loc

All functions are pure jax.numpy and shape-polymorphic over leading batch
dims of ``locations`` — unlike the reference, which was numpy-only, 2-D-only
and allocated per call.  They jit, vmap and differentiate.
"""

import jax.numpy as jnp
import numpy as np


def _euler_zyx(roll, pitch, yaw, xp):
  """Rz(yaw) @ Ry(pitch) @ Rx(roll) (static xyz convention), stacked."""
  cr, sr = xp.cos(roll), xp.sin(roll)
  cp, sp = xp.cos(pitch), xp.sin(pitch)
  cy, sy = xp.cos(yaw), xp.sin(yaw)
  row0 = xp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
                  axis=-1)
  row1 = xp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
                  axis=-1)
  row2 = xp.stack([-sp, cp * sr, cp * cr], axis=-1)
  return xp.stack([row0, row1, row2], axis=-2)


def rot2mat(rotation, xp=jnp):
  """Returns the 3x3 world->local rotation matrix.

  Args:
    rotation: ``[..., 3]`` CARLA rotation (pitch, yaw, roll) in degrees.
    xp: array namespace (jnp or np).

  Returns:
    ``[..., 3, 3]`` rotation matrices, ``euler2mat(roll, pitch, yaw).T``.
  """
  rotation = xp.asarray(rotation)
  pitch = xp.deg2rad(rotation[..., 0])
  yaw = xp.deg2rad(rotation[..., 1])
  roll = xp.deg2rad(rotation[..., 2])
  m = _euler_zyx(roll, pitch, yaw, xp)
  return xp.swapaxes(m, -1, -2)


def world2local(*, current_location, current_rotation, world_locations,
                xp=jnp):
  """Converts ``world_locations`` to ego coordinates.

  Args:
    current_location: ego location ``[..., 3]``.
    current_rotation: ego rotation ``[..., 3]`` (pitch, yaw, roll) degrees.
    world_locations: ``[..., N, 3]`` or ``[..., 3]`` points.

  Returns:
    Local coordinates with the same shape as ``world_locations``.
  """
  current_location = xp.asarray(current_location)
  world_locations = xp.asarray(world_locations)
  R = rot2mat(current_rotation, xp=xp)
  delta = world_locations - current_location[..., None, :] \
      if world_locations.ndim > current_location.ndim else \
      world_locations - current_location
  return xp.einsum("...ij,...j->...i", R, delta) \
      if delta.ndim == R.ndim - 1 else \
      xp.einsum("...ij,...nj->...ni", R, delta)


def local2world(*, current_location, current_rotation, local_locations,
                xp=jnp):
  """Converts ``local_locations`` to world coordinates (inverse of above)."""
  current_location = xp.asarray(current_location)
  local_locations = xp.asarray(local_locations)
  R = rot2mat(current_rotation, xp=xp)
  # R is orthonormal: inverse == transpose (the reference used np.linalg.inv).
  Rt = xp.swapaxes(R, -1, -2)
  if local_locations.ndim == R.ndim - 1:
    out = xp.einsum("...ij,...j->...i", Rt, local_locations)
    return out + current_location
  out = xp.einsum("...ij,...nj->...ni", Rt, local_locations)
  return out + current_location[..., None, :]


def yaw_to_forward(yaw_deg, xp=jnp):
  """Unit forward vector for a (pitch=0) yaw in degrees, CARLA convention:
  ``get_forward_vector() == (cos(yaw), sin(yaw), 0)``."""
  yaw = xp.deg2rad(xp.asarray(yaw_deg))
  zeros = xp.zeros_like(yaw)
  return xp.stack([xp.cos(yaw), xp.sin(yaw), zeros], axis=-1)


def world2local_2d(*, current_xy, current_yaw_rad, world_xy, xp=jnp):
  """Fast planar world->ego used inside the hot step (yaw-only rotation).

  Args:
    current_xy: ``[..., 2]`` ego position.
    current_yaw_rad: ``[...]`` ego yaw in radians.
    world_xy: ``[..., N, 2]`` points.

  Returns:
    ``[..., N, 2]`` ego-frame points (x forward, y right).
  """
  c = xp.cos(current_yaw_rad)
  s = xp.sin(current_yaw_rad)
  delta = world_xy - current_xy[..., None, :]
  x = c[..., None] * delta[..., 0] + s[..., None] * delta[..., 1]
  y = -s[..., None] * delta[..., 0] + c[..., None] * delta[..., 1]
  return xp.stack([x, y], axis=-1)


def local2world_2d(*, current_xy, current_yaw_rad, local_xy, xp=jnp):
  """Inverse of :func:`world2local_2d`."""
  c = xp.cos(current_yaw_rad)
  s = xp.sin(current_yaw_rad)
  x = c[..., None] * local_xy[..., 0] - s[..., None] * local_xy[..., 1]
  y = s[..., None] * local_xy[..., 0] + c[..., None] * local_xy[..., 1]
  return xp.stack([x, y], axis=-1) + current_xy[..., None, :]


def wrap_angle(theta):
  """Wraps radians to (-pi, pi]."""
  return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


# Convenience numpy twins for host-side code (dataset processing etc.).
def np_world2local(*, current_location, current_rotation, world_locations):
  out = world2local(
      current_location=np.asarray(current_location, dtype=np.float64),
      current_rotation=np.asarray(current_rotation, dtype=np.float64),
      world_locations=np.atleast_2d(np.asarray(world_locations,
                                               dtype=np.float64)),
      xp=np)
  return np.squeeze(out)


def np_local2world(*, current_location, current_rotation, local_locations):
  return local2world(
      current_location=np.asarray(current_location, dtype=np.float64),
      current_rotation=np.asarray(current_rotation, dtype=np.float64),
      local_locations=np.atleast_2d(np.asarray(local_locations,
                                               dtype=np.float64)),
      xp=np)
