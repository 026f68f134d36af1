"""World <-> camera <-> image geometry for view-conditioned models.

Parity with reference models/neo360/util.py:
  - `get_world_grid`  (util.py:12-26): meshgrid over per-axis (min, max).
  - `world2camera`    (util.py:52-70): x_cam = R^T (x_world) - R^T t.
  - `world2camera_viewdirs` (util.py:45-49): rotation only.
  - `projection`      (util.py:92-110): uv = -xy/z * focal + principal point —
    note the leading minus (OpenGL camera looks down -z) and that the caller
    negates fy (encoder_tp_fusion_conv.py:491-493) to land in image-row space.
  - `repeat_interleave` semantics (util.py:196-203): views interleaved on the
    leading axis, matching `combine_interleaved` fusion in nn/mlp.py.

All jnp, batched as (B, N, 3) points with (B, 4, 4) poses; matmuls hit the MXU.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp


def repeat_interleave(x: jnp.ndarray, repeats: int) -> jnp.ndarray:
    """(B, ...) -> (B*repeats, ...) with each row repeated contiguously."""
    if repeats == 1:
        return x
    out = jnp.broadcast_to(x[:, None], (x.shape[0], repeats) + x.shape[1:])
    return out.reshape((-1,) + x.shape[1:])


def get_world_grid(side_lengths: Sequence[Sequence[float]],
                   grid_size: Union[int, Sequence[int]],
                   dtype=jnp.float32) -> jnp.ndarray:
    """(1, Gx*Gy*Gz, 3) grid of world points, ij-indexed like torch.meshgrid."""
    if isinstance(grid_size, int):
        grid_size = [grid_size] * 3
    elif len(grid_size) == 1:
        grid_size = [grid_size[0]] * 3
    axes = [jnp.linspace(side_lengths[i][0], side_lengths[i][1],
                         grid_size[i], dtype=dtype) for i in range(3)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1).reshape(1, -1, 3)


def world2camera(w_xyz: jnp.ndarray, cam2world: jnp.ndarray,
                 ns: int | None = None) -> jnp.ndarray:
    """World points -> camera frame. w_xyz (B, N, 3), cam2world (B', 4, 4).

    If `ns` is given, w_xyz rows are repeat-interleaved ns times first
    (one copy per source view).
    """
    if ns is not None:
        w_xyz = repeat_interleave(w_xyz, ns)
    rot = jnp.swapaxes(cam2world[:, :3, :3], 1, 2)      # R^T (B, 3, 3)
    trans = -jnp.einsum("bij,bj->bi", rot, cam2world[:, :3, 3])
    cam_rot = jnp.einsum("bij,bnj->bni", rot, w_xyz)
    return cam_rot + trans[:, None, :]


def world2camera_viewdirs(w_dirs: jnp.ndarray, cam2world: jnp.ndarray,
                          ns: int | None = None) -> jnp.ndarray:
    """World directions -> camera frame (rotation only)."""
    if ns is not None:
        w_dirs = repeat_interleave(w_dirs, ns)
    rot = jnp.swapaxes(cam2world[:, :3, :3], 1, 2)
    return jnp.einsum("bij,bnj->bni", rot, w_dirs)


def projection(c_xyz: jnp.ndarray, focal: jnp.ndarray, c: jnp.ndarray,
               nv: int | None = None) -> jnp.ndarray:
    """Camera points -> pixel coordinates.

    c_xyz: (SB*NV, N, 3); focal, c: (SB, 2). uv = -xy/(z+1e-9)*f + c.
    A negative fy (passed by the caller) flips v into image-row direction.
    """
    if nv is None:
        nv = c_xyz.shape[0] // c.shape[0]
    uv = -c_xyz[..., :2] / (c_xyz[..., 2:] + 1e-9)
    f = repeat_interleave(focal[:, None, :], nv if focal.shape[0] > 1 else 1)
    cc = repeat_interleave(c[:, None, :], nv if c.shape[0] > 1 else 1)
    return uv * f + cc


def homography_warp(src_feat: jnp.ndarray, proj_mat: jnp.ndarray,
                    depth_values: jnp.ndarray) -> jnp.ndarray:
    """MVS plane-sweep warp (reference models/neo360/util.py:680-731).

    For every reference pixel and every hypothesis depth, projects the
    pixel into the source view with `proj_mat = src_proj @ ref_proj_inv`
    and bilinear-samples the source features (zeros padding,
    align_corners=True — ops/interpolate.grid_sample_2d semantics, matching
    the reference's F.grid_sample call at util.py:725-727).

    Args:
      src_feat: (B, H, W, C) source-view feature maps (NHWC — TPU layout;
        the reference is NCHW).
      proj_mat: (B, 3, 4) ref-pixel -> src-pixel homogeneous projection.
      depth_values: (B, D) hypothesis depths per batch.

    Returns:
      (B, D, H, W, C) warped features (reference returns (B, C, D, H, W)).
    """
    b, h, w, _ = src_feat.shape
    d = depth_values.shape[1]

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ref = jnp.stack([xs.ravel(), ys.ravel(),
                     jnp.ones(h * w, jnp.float32)])          # (3, HW)
    rot = proj_mat[:, :, :3]                                  # (B, 3, 3)
    t = proj_mat[:, :, 3:]                                    # (B, 3, 1)
    # (R @ x) + T/depth ~ homogeneous (R @ x * depth + T) (reference :712)
    src = (jnp.einsum("bij,jn->bin", rot, ref)[:, None]
           + t[:, None] / depth_values[:, :, None, None])     # (B, D, 3, HW)
    uv = src[:, :, :2] / src[:, :, 2:]
    scale = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0])
    uv = uv / scale[None, None, :, None] - 1.0                # [-1, 1]
    uv = uv.transpose(0, 1, 3, 2).reshape(b, d * h * w, 2)

    from neo360_tpu.ops.interpolate import grid_sample_2d
    warped = grid_sample_2d(src_feat, uv, padding_mode="zeros")
    return warped.reshape(b, d, h, w, -1)
