"""Camera model and ray generation (pure jnp, jit-friendly).

Reference semantics (cited for parity, re-implemented TPU-first):
  - ray directions use the OpenGL convention with NO +0.5 pixel centering
    (reference datasets/ray_utils.py:84-104).
  - `get_rays` returns world-space origins, unit view directions, the
    unnormalized rotated directions, and MipNeRF pixel radii ``dx * 2/sqrt(12)``
    (reference datasets/ray_utils.py:133-176).
  - PD -> NeRF pose axis flip (reference datasets/ray_utils.py:329-332).

Everything here is shape-static and differentiable; ray generation for a whole
image is a single fused XLA program (broadcasts + one small matmul on the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT12_X2 = 2.0 / np.sqrt(12.0)


def get_ray_directions(h: int, w: int, focal) -> jnp.ndarray:
    """Per-pixel ray directions in the camera frame, shape (H, W, 3).

    OpenGL convention: x right, y up, camera looks down -z. No +0.5 pixel
    centering (parity with reference ray_utils.py:98-101).
    """
    i = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, W)
    j = jnp.arange(h, dtype=jnp.float32)[:, None]  # (H, 1)
    x = (i - w / 2.0) / focal
    y = -(j - h / 2.0) / focal
    x = jnp.broadcast_to(x, (h, w))
    y = jnp.broadcast_to(y, (h, w))
    z = -jnp.ones((h, w), dtype=jnp.float32)
    return jnp.stack([x, y, z], axis=-1)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """World-space rays for one camera.

    Args:
      directions: (..., 3) camera-frame directions (from `get_ray_directions`).
      c2w: (3, 4) camera-to-world matrix.

    Returns:
      dict with:
        rays_o:   (..., 3) ray origins (camera center broadcast).
        rays_d:   (..., 3) unnormalized world directions.
        viewdirs: (..., 3) unit world directions.
    """
    rays_d = directions @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return {"rays_o": rays_o, "rays_d": rays_d, "viewdirs": viewdirs}


def pixel_radii(rays_d_image: jnp.ndarray) -> jnp.ndarray:
    """MipNeRF base radii of pixel cones, from an (H, W, 3) direction image.

    radius = |d[y+1,x] - d[y,x]| * 2/sqrt(12), last row duplicated
    (parity with reference ray_utils.py:153-160). Returns (H, W, 1).
    """
    dx = jnp.sqrt(jnp.sum((rays_d_image[:-1] - rays_d_image[1:]) ** 2, axis=-1))
    dx = jnp.concatenate([dx, dx[-2:-1]], axis=0)
    return (dx * _INV_SQRT12_X2)[..., None]


def rays_for_camera(h: int, w: int, focal, c2w: jnp.ndarray):
    """All rays for one camera as flat (H*W, ...) arrays, plus radii.

    One XLA program; no host loops. Returns dict with rays_o, rays_d,
    viewdirs, radii — each (H*W, 3) / (H*W, 1).
    """
    dirs = get_ray_directions(h, w, focal)
    r = get_rays(dirs, c2w)
    radii = pixel_radii(r["rays_d"])
    return {
        "rays_o": r["rays_o"].reshape(-1, 3),
        "rays_d": r["rays_d"].reshape(-1, 3),
        "viewdirs": r["viewdirs"].reshape(-1, 3),
        "radii": radii.reshape(-1, 1),
    }


def convert_pose_pd_to_nerf(c2w: np.ndarray) -> np.ndarray:
    """Parallel-Domain -> NeRF camera axis flip (reference ray_utils.py:329-332).

    Right-multiplies by [[1,0,0,0],[0,0,-1,0],[0,1,0,0],[0,0,0,1]].
    Host-side (numpy): pose preprocessing happens in the data layer.
    """
    flip = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=c2w.dtype,
    )
    return c2w @ flip


def opencv_to_opengl(c2w: np.ndarray) -> np.ndarray:
    """Flip y/z columns: OpenCV -> OpenGL camera (reference ray_utils.py:76-81)."""
    flip = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=c2w.dtype))
    return c2w @ flip


def ndc_rays(h: int, w: int, focal, near, rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift rays to the near plane and map to NDC (reference ray_utils.py:205-246)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def sample_rays_in_bbox(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                        rotations: jnp.ndarray, translations: jnp.ndarray,
                        half_extents: jnp.ndarray):
    """Per-ray near/far against a set of oriented object boxes.

    Vectorized replacement for the reference's numba loop chain
    (neo360/helper.py:325-373: transform rays to each box frame, slab test,
    merge near/far across objects with its zero-as-missing convention).

    rotations (K,3,3), translations (K,3), half_extents (K,3) describe K
    boxes; rays (N,3). Returns (near (N,1), far (N,1), mask (N,1)) where
    mask marks rays hitting at least one box.
    """
    rot_t = jnp.swapaxes(rotations, -1, -2)                       # world->box
    o_box = jnp.einsum("kij,nj->kni", rot_t, rays_o) - jnp.einsum(
        "kij,kj->ki", rot_t, translations)[:, None, :]
    d_box = jnp.einsum("kij,nj->kni", rot_t, rays_d)

    def one_box(o, d, ext):
        return ray_aabb_intersection(o, d, -ext, ext)

    hit, near, far = jax.vmap(one_box)(o_box, d_box, half_extents)
    # reference merge: zeros mean "miss"; take min over hits per ray
    big = jnp.where(hit, near, jnp.inf)
    near_min = jnp.min(big, axis=0)
    far_min = jnp.min(jnp.where(hit, far, jnp.inf), axis=0)
    any_hit = jnp.any(hit, axis=0)
    zero = jnp.zeros_like(near_min)
    return (jnp.where(any_hit, near_min, zero)[:, None],
            jnp.where(any_hit, far_min, zero)[:, None],
            any_hit[:, None])


def ray_aabb_intersection(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                          box_min, box_max):
    """Vectorized slab test: per-ray (hit, t_near, t_far) against one AABB.

    Replaces the reference's numba-JIT per-ray loop (ray_utils.py:17-68) with a
    branch-free jnp formulation (VPU-friendly; no data-dependent control flow).
    Matches the reference's convention that rays starting inside the box (or
    behind it) report no hit.
    """
    box_min = jnp.asarray(box_min, dtype=rays_o.dtype)
    box_max = jnp.asarray(box_max, dtype=rays_o.dtype)
    d = jnp.where(rays_d == 0.0, 1.0e-14, rays_d)
    inv_d = 1.0 / d
    t0 = (box_min - rays_o) * inv_d
    t1 = (box_max - rays_o) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.max(t_small, axis=-1)
    t_far = jnp.min(t_big, axis=-1)
    hit = (t_near <= t_far) & (t_near >= 0.0) & (t_far >= 0.0)
    zero = jnp.zeros_like(t_near)
    return hit, jnp.where(hit, t_near, zero), jnp.where(hit, t_far, zero)


def get_rays_segmented(seg_masks: np.ndarray, class_ids,
                       rays_o: np.ndarray, rays_d: np.ndarray,
                       w: int, h: int, n_rays: int,
                       rng: "np.random.Generator | None" = None):
    """Segmentation-conditioned ray picking (reference ray_utils.py:276-326).

    seg_masks: (H, W, K) per-class masks (>0 = member) aligned with
    `class_ids` (K,); rays_o/rays_d: (H*W, 3) flattened rays. For each class,
    draws `n_rays` member rays with replacement. Host-side numpy (runs in the
    data pipeline, like the reference's dataloader path).

    Returns (rays_o_per_class, rays_d_per_class, sorted_class_ids, fg_mask)
    where the lists hold one (n_member_rays, 3) array per class (the
    reference returns the deduplicated member rays of the sampled index set)
    and fg_mask is the flattened any-class membership mask.
    """
    rng = rng or np.random.default_rng()
    seg = np.zeros((h, w), dtype=np.int64)
    class_ids = sorted(int(c) for c in class_ids)
    for i, cid in enumerate(class_ids):
        seg[seg_masks[:, :, i] > 0] = cid

    flat = seg.flatten()
    rays_o_cls, rays_d_cls, select_inds = [], [], []
    for cid in class_ids:
        member = np.where(flat == cid)[0]
        picked = member[rng.integers(0, member.shape[0], size=n_rays)]
        select_inds.append(picked)
        mask = np.zeros(rays_o.shape[0], dtype=bool)
        mask[picked] = True
        rays_o_cls.append(rays_o[mask])
        rays_d_cls.append(rays_d[mask])
    return rays_o_cls, rays_d_cls, class_ids, flat > 0


def get_rays_mvs(h: int, w: int, focal, c2w: jnp.ndarray):
    """MVS-convention rays: +z forward, principal point at the image center
    (reference ray_utils.py:335-351; feeds homography-warp style pipelines).
    c2w: (3|4, 4). Returns (rays_o, rays_d) each (H*W, 3); rays_d is NOT
    normalized (matches the reference)."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    dirs = jnp.stack([(xs - w / 2) / focal, (ys - h / 2) / focal,
                      jnp.ones_like(xs)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d
