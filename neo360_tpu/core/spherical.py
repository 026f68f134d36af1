"""NeRF++ inverted-sphere parameterization (NeO-360 background).

Parity with reference models/neo360/helper.py:253-273 (`intersect_sphere`) and
:401-450 (`depth2pts_outside`). Re-implemented branch-free in jnp: the
reference's assert-and-crash on rays missing the unit sphere becomes a clamp
(sqrt of a clipped value) so the functions are jit-safe; callers that want the
invariant enforced should validate data on the host once.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """Depth of each ray's exit intersection with the unit sphere.

    Args:
      rays_o: (..., 3) ray origins (inside the unit sphere).
      rays_d: (..., 3) ray directions (need not be unit-norm).

    Returns:
      (..., 1) depth along the (unnormalized) direction.
    """
    d1 = -jnp.sum(rays_d * rays_o, axis=-1, keepdims=True) / jnp.sum(
        rays_d ** 2, axis=-1, keepdims=True)
    p = rays_o + d1 * rays_d
    rays_d_cos = 1.0 / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    p_norm_sq = jnp.sum(p * p, axis=-1, keepdims=True)
    # reference asserts 1 - |p|^2 >= 0 (helper.py:271); clamp for jit-safety.
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_norm_sq, 0.0)) * rays_d_cos
    return d1 + d2


def depth2pts_outside(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      depth: jnp.ndarray) -> jnp.ndarray:
    """Lift inverse-sphere depths to 4D points (x', y', z', 1/r) outside the
    unit sphere via the NeRF++ Rodrigues rotation construction.

    Args:
      rays_o: (B, 3) origins.  rays_d: (B, 3) directions.
      depth: (B, S) inverse distance to sphere origin, in [0, 1].

    Returns:
      (B, S, 4) points: unit direction on the sphere after rotation, plus 1/r.
    """
    rays_o = jnp.broadcast_to(rays_o[..., None, :], depth.shape + (3,))
    rays_d = jnp.broadcast_to(rays_d[..., None, :], depth.shape + (3,))

    d1 = -jnp.sum(rays_d * rays_o, axis=-1, keepdims=True) / jnp.sum(
        rays_d ** 2, axis=-1, keepdims=True)
    p_mid = rays_o + d1 * rays_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1, keepdims=True)
    rays_d_cos = 1.0 / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # reference asserts 1 - |p_mid|^2 >= 0 (helper.py:426); clamp for jit.
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_mid_norm * p_mid_norm, 0.0)) * rays_d_cos
    p_sphere = rays_o + (d1 + d2) * rays_d

    rot_axis = jnp.cross(rays_o, p_sphere)
    # eps: rays through the origin have rays_o || p_sphere (zero cross
    # product); their rotation angle is also 0, so the guarded axis cancels
    # exactly instead of producing 0/0 (the reference divides unguarded,
    # helper.py:432 — NaN for center-pixel rays).
    rot_axis = rot_axis / (jnp.linalg.norm(rot_axis, axis=-1, keepdims=True)
                           + 1e-10)
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth[..., None], -1.0, 1.0))
    rot_angle = phi - theta  # (..., 1)

    cos_a = jnp.cos(rot_angle)
    sin_a = jnp.sin(rot_angle)
    p_sphere_new = (
        p_sphere * cos_a
        + jnp.cross(rot_axis, p_sphere) * sin_a
        + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1, keepdims=True)
        * (1.0 - cos_a)
    )
    p_sphere_new = p_sphere_new / (
        jnp.linalg.norm(p_sphere_new, axis=-1, keepdims=True) + 1e-10)
    return jnp.concatenate([p_sphere_new, depth[..., None]], axis=-1)
