"""Positional / integrated positional encodings and the MipNeRF-360 scene
contraction.

Parity notes:
  - `pos_enc` includes the identity and uses sin(x), sin(x + pi/2) stacking
    (reference vanilla_nerf/helper.py:445-449, neo360/helper.py:121-125).
  - `contract` is x * (2|x| - 1) / |x|^2 for |x| > 1; the covariance is
    transported with the contraction Jacobian. The reference needs
    functorch vmap(jacrev) (mipnerf360/helper.py:33-66); in JAX this is a
    native `jax.vmap(jax.jacfwd(...))` — jacfwd because the map is R^3 -> R^3
    and forward mode avoids the transpose.
  - icosahedron basis + lift_and_diagonalize for the lifted IPE
    (reference mipnerf360/helper.py:457-531, 70-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pos_enc(x: jnp.ndarray, min_deg: int, max_deg: int) -> jnp.ndarray:
    """[x, sin(2^i x), cos(2^i x)] for i in [min_deg, max_deg).

    cos is computed as sin(x + pi/2) (parity with reference helper.py:445-449).
    Output dim = d * (1 + 2 * (max_deg - min_deg)).
    """
    if min_deg == max_deg:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)],
                         dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(x.shape[:-1] + (-1,))
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    return jnp.concatenate([x, four_feat], axis=-1)


def expected_sin(mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """E[sin(x)] for x ~ N(mean, var) = exp(-var/2) sin(mean)."""
    return jnp.exp(-0.5 * var) * jnp.sin(mean)


def integrated_pos_enc(mean: jnp.ndarray, var: jnp.ndarray,
                       min_deg: int, max_deg: int) -> jnp.ndarray:
    """IPE over diagonalized Gaussians (reference mipnerf360/helper.py:70-80).

    Args:
      mean, var: (..., D) per-axis means / variances (already lifted onto a
        basis via `lift_and_diagonalize`).
    Returns (..., 2 * D * num_degrees) features.
    """
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)],
                         dtype=mean.dtype)
    shape = mean.shape[:-1] + (-1,)
    scaled_mean = (mean[..., None, :] * scales[:, None]).reshape(shape)
    scaled_var = (var[..., None, :] * scales[:, None] ** 2).reshape(shape)
    return expected_sin(
        jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([scaled_var] * 2, axis=-1),
    )


# ---------------------------------------------------------------------------
# MipNeRF-360 scene contraction with covariance transport
# ---------------------------------------------------------------------------

def _contract_point(x: jnp.ndarray) -> jnp.ndarray:
    """contract(x) = x if |x| <= 1 else (2 - 1/|x|) * x/|x|  (single point)."""
    # eps guards the norm's gradient at 0; matches reference 1e-7 min-clamp
    # semantics (mipnerf360/helper.py:36-40).
    eps = jnp.finfo(x.dtype).eps
    x_mag_sq = jnp.maximum(eps, jnp.sum(x ** 2, axis=-1, keepdims=True))
    z = jnp.where(x_mag_sq <= 1.0, x, ((2.0 * jnp.sqrt(x_mag_sq) - 1.0) / x_mag_sq) * x)
    return z


def contract(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise-batched scene contraction onto the radius-2 ball."""
    return _contract_point(x)


def track_linearize(fn, mean: jnp.ndarray, cov: jnp.ndarray):
    """Push a Gaussian (mean, cov) through fn via local linearization.

    JAX-native replacement for the reference's functorch vmap(jacrev) dance
    (mipnerf360/helper.py:44-66): J = jacfwd(fn) per point, cov' = J cov J^T.
    """
    pre_shape = mean.shape[:-1]
    mean_flat = mean.reshape(-1, mean.shape[-1])
    cov_flat = cov.reshape(-1, cov.shape[-2], cov.shape[-1])

    fn_mean = fn(mean_flat)
    jac = jax.vmap(jax.jacfwd(lambda p: fn(p[None, :])[0]))(mean_flat)
    fn_cov = jnp.einsum("...ij,...jk,...lk->...il", jac, cov_flat, jac)
    return (fn_mean.reshape(pre_shape + (-1,)),
            fn_cov.reshape(pre_shape + fn_cov.shape[-2:]))


def _compute_sq_dist(mat0: np.ndarray, mat1: np.ndarray = None) -> np.ndarray:
    """Squared Euclidean distance between all pairs of columns."""
    if mat1 is None:
        mat1 = mat0
    sq_norm0 = np.sum(mat0 ** 2, 0)
    sq_norm1 = np.sum(mat1 ** 2, 0)
    return np.maximum(0, sq_norm0[:, None] + sq_norm1[None, :]
                      - 2 * mat0.T @ mat1)


def _tesselate_geodesic(base_verts, base_faces, v: int, eps: float = 1e-4):
    """Barycentric face tesselation projected to the sphere, deduplicated.

    Algorithm parity with reference mipnerf360/helper.py:414-454 (itself from
    the public multinerf JAX codebase).
    """
    int_weights = np.array(
        [(i, j, v - (i + j)) for i in range(v + 1) for j in range(v + 1 - i)])
    tri_weights = int_weights / v

    verts = []
    for face in base_faces:
        new_verts = tri_weights @ base_verts[face, :]
        new_verts /= np.sqrt(np.sum(new_verts ** 2, 1, keepdims=True))
        verts.append(new_verts)
    verts = np.concatenate(verts, 0)

    sq_dist = _compute_sq_dist(verts.T)
    assignment = np.array([np.min(np.argwhere(d <= eps)) for d in sq_dist])
    return verts[np.unique(assignment), :]


def generate_basis(base_shape: str = "icosahedron",
                   angular_tesselation: int = 2,
                   remove_symmetries: bool = True,
                   eps: float = 1e-4) -> np.ndarray:
    """Tesselated-polyhedron vertex basis for lifted IPE, shape (3, V).

    Parity with reference mipnerf360/helper.py:457-531 including the final
    column reversal (xyz -> zyx). Host-side numpy: a compile-time constant.
    """
    if base_shape == "icosahedron":
        a = (np.sqrt(5.0) + 1.0) / 2.0
        verts = np.array(
            [(-1, 0, a), (1, 0, a), (-1, 0, -a), (1, 0, -a),
             (0, a, 1), (0, a, -1), (0, -a, 1), (0, -a, -1),
             (a, 1, 0), (-a, 1, 0), (a, -1, 0), (-a, -1, 0)],
            dtype=np.float64) / np.sqrt(a + 2.0)
        faces = np.array(
            [(0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
             (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
             (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
             (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11)])
        verts = _tesselate_geodesic(verts, faces, angular_tesselation)
    elif base_shape == "octahedron":
        import itertools
        verts = np.array(
            [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0),
             (1, 0, 0)], dtype=np.float64)
        corners = np.array(list(itertools.product([-1, 1], repeat=3)))
        pairs = np.argwhere(_compute_sq_dist(corners.T, verts.T) == 2)
        faces = np.sort(np.reshape(pairs[:, 1], [3, -1]).T, 1)
        verts = _tesselate_geodesic(verts, faces, angular_tesselation)
    else:
        raise ValueError(f"base_shape {base_shape!r} not supported")

    if remove_symmetries:
        match = _compute_sq_dist(verts.T, -verts.T) < eps
        verts = verts[np.any(np.triu(match), 1), :]

    return verts[:, ::-1].T.astype(np.float32)  # (3, V)


def lift_and_diagonalize(mean: jnp.ndarray, cov: jnp.ndarray,
                         basis: jnp.ndarray):
    """Project Gaussians onto basis vectors; return per-axis mean/var.

    Parity with reference mipnerf360/helper.py:82-88.
    basis: (3, V). Returns means (..., V), vars (..., V).
    """
    fn_mean = mean @ basis
    fn_cov = jnp.sum((cov @ basis) * basis[None], axis=-2)
    return fn_mean, fn_cov
