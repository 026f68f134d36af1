"""Multi-chip scaling via jax.sharding (Mesh + NamedSharding).

Replaces the reference's NCCL DDP plumbing (run.py:114,134,154 and the
Lightning all_gather at interface.py:30-50) with the XLA-native recipe:
annotate input/param shardings, jit once, and let the compiler insert the
collectives (psum for the data-parallel gradient all-reduce, all-gathers for
tensor-parallel activations). ICI handles the traffic; there is no wrapper
runtime to maintain.

Axes:
  data  — rays (train batches, eval ray tiles). The NeRF analogue of both DP
          and sequence/context parallelism: rays are embarrassingly parallel.
  model — hidden width of the big MLPs (MipNeRF-360's 8x1024 NeRF trunk).
          Kernels of Dense layers wider than `min_tp_width` are sharded on
          their output feature dim; XLA propagates and inserts the matching
          collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh. Default: 1-D {"data": n_devices}."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axis_sizes} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for ray batches."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a batch dict with leading-axis sharding over `axis`.

    Arrays whose leading dim is not divisible by the axis size (e.g. the
    source-image stack, poses) are replicated instead.
    """
    n = mesh.shape[axis]
    sh_data = data_sharding(mesh, axis)
    sh_repl = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        sh = sh_data if (x.ndim >= 1 and x.shape[0] % n == 0) else sh_repl
        return jax.device_put(x, sh)

    return {k: place(v) for k, v in batch.items()}


def shard_staged_batch(batches: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a STAGED batch dict ((K, B, ...) arrays from stack_batches) with
    the per-step batch axis (axis 1) sharded over `axis`. Arrays whose second
    dim is not divisible (source-image stacks, poses) are replicated. A
    lax.scan over axis 0 then yields per-step batches sharded on their
    leading ray axis — the data-parallel production path of cli.run_train."""
    n = mesh.shape[axis]
    sh_data = NamedSharding(mesh, P(None, axis))
    sh_repl = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        sh = sh_data if (x.ndim >= 2 and x.shape[1] % n == 0) else sh_repl
        return jax.device_put(x, sh)

    return {k: place(v) for k, v in batches.items()}


def shard_stage_batch(rbs: Dict, mesh: Mesh, ray_axis: int,
                      axis: str = "data") -> Dict:
    """Place scene-stage ray batches with the per-step RAY axis sharded.

    `rbs` arrays are (n_stages, K, B, ...) for single-scene stages
    (ray_axis=2) or (n_stages, K, S, B/S, ...) for scene-mixed stages
    (ray_axis=3); the nested scans in make_scene_stage_trainer then see
    per-step batches sharded on their ray dimension. Non-divisible arrays
    replicate."""
    n = mesh.shape[axis]
    spec = [None] * ray_axis + [axis]
    sh_rays = NamedSharding(mesh, P(*spec))
    sh_repl = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        ok = x.ndim > ray_axis and x.shape[ray_axis] % n == 0
        return jax.device_put(x, sh_rays if ok else sh_repl)

    return {k: place(v) for k, v in rbs.items()}


def tp_param_shardings(params, mesh: Mesh, axis: str = "model",
                       min_tp_width: int = 512):
    """Pytree of NamedShardings for params: Dense kernels with a wide,
    divisible output dim are sharded on `axis`; everything else replicated.

    XLA's sharding propagation derives the activation shardings and inserts
    all-gathers / reduce-scatters; alternating col/row parallelism falls out
    of propagation rather than manual annotation.
    """
    size = mesh.shape[axis]

    def spec(path, x):
        if (x.ndim == 2 and x.shape[-1] >= min_tp_width
                and x.shape[-1] % size == 0):
            return NamedSharding(mesh, P(None, axis))
        if (x.ndim == 1 and x.shape[-1] >= min_tp_width
                and x.shape[-1] % size == 0):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
