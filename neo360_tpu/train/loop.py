"""Training loop building blocks (single- and multi-device).

TPU-native design (contrast with the reference's Lightning loop, SURVEY §3.1):
  - `make_train_step` closes over the model+optimizer and returns a pure
    (state, batch, key) -> (state, metrics) function; jit it once.
  - `make_buffer_trainer` runs K optimizer steps per call with an internal
    `lax.fori_loop`, sampling random ray batches *on device* from a resident
    HBM ray buffer — zero host round-trips per step, vs. the reference's
    32-process CPU dataloader feeding 2048-ray batches over PCIe
    (vanilla_nerf/model.py:439-446).
  - `make_image_renderer` renders a full image by `lax.map` over fixed-shape
    ray tiles: one compile, static shapes, no per-chunk re-dispatch (the
    reference re-runs a Python chunk loop — and for NeO-360 even re-encodes
    the source images per chunk, neo360/model.py:266-273,825-843).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Any = None     # non-trainable collections (batch_stats)


def create_train_state(params, optimizer, model_state=None) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params),
                      model_state=model_state)


def make_train_step(loss_fn: Callable, optimizer,
                    pmean_axis: Optional[str] = None,
                    with_model_state: bool = False,
                    with_step: bool = False):
    """Build train_step(state, batch, key) -> (state, metrics).

    loss_fn signature:
      default:            (params, batch, key) -> (loss, metrics)
      with_model_state:   (params, model_state, batch, key)
                            -> (loss, (metrics, new_model_state))
        for models with mutable collections (BatchNorm running stats).
      with_step:          loss_fn receives the current optimizer step as a
        trailing `step` argument (traced int32) — e.g. MipNeRF-360's
        train_frac anneal (reference mipnerf360/model.py:433-437).

    If `pmean_axis` is set, grads/metrics are psum-averaged over that mapped
    axis (the data-parallel grad all-reduce, replacing the reference's NCCL
    DDP — run.py:114,134,154). Under jit over a sharded mesh the all-reduce
    is inserted automatically and `pmean_axis` is unnecessary.
    """
    def train_step(state: TrainState, batch, key):
        extra = (state.step,) if with_step else ()
        if with_model_state:
            (loss, (metrics, model_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.model_state,
                                       batch, key, *extra)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, key, *extra)
            model_state = state.model_state
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            metrics = jax.lax.pmean(metrics, pmean_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, model_state=model_state), metrics
    return train_step


def make_buffer_trainer(train_step: Callable, batch_size: int,
                        steps_per_call: int, mesh=None):
    """Wrap a train_step into a jitted K-step driver over a device-resident
    ray buffer.

    buffers: dict of (N, ...) arrays (rays_o, viewdirs, rays_d, target, ...).
    Random indices are drawn per step with jax.random inside the loop, so the
    whole call is one XLA program.

    With a `mesh`, each step's gathered ray batch is constrained to the
    mesh's "data" axis: XLA shards the forward/backward over devices and
    inserts the gradient all-reduce (the reference's DDP, run.py:114,134,154)
    automatically. Buffers and state stay replicated.
    """
    if mesh is not None and batch_size % mesh.shape["data"] != 0:
        raise ValueError(f"batch_size {batch_size} must divide by data axis "
                         f"{mesh.shape['data']}")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state: TrainState, buffers: Dict[str, jnp.ndarray], key):
        n = next(iter(buffers.values())).shape[0]

        def body(i, carry):
            state, key, _ = carry
            key, k_idx, k_step = jax.random.split(key, 3)
            idx = jax.random.randint(k_idx, (batch_size,), 0, n)
            batch = {k: v[idx] for k, v in buffers.items()}
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(mesh, P("data"))
                batch = {k: jax.lax.with_sharding_constraint(v, sh)
                         for k, v in batch.items()}
            state, metrics = train_step(state, batch, k_step)
            return state, key, metrics

        # run step 0 outside to get the metrics structure
        state, key, metrics = body(0, (state, key, None))
        state, key, metrics = jax.lax.fori_loop(
            1, steps_per_call, body, (state, key, metrics))
        return state, metrics

    return run


def make_staged_trainer(train_step: Callable):
    """Wrap a train_step into a jitted multi-step driver over K staged
    batches: one dispatch runs a lax.scan over the stacked batch dict
    (K, ...). Amortizes host->device transfer and dispatch latency over K
    optimizer steps — the production pattern for host-sampled pipelines
    (the per-step analogue of make_buffer_trainer's on-device sampling).

    Returns run(state, batches, key, const=None) -> (state,
    metrics_of_last_step) where `batches` is a dict of (K, ...) arrays.
    `const` (optional dict) is merged into every step's batch WITHOUT the
    leading K axis — run-constant conditioning (e.g. optimize mode's cached
    frozen-encoder latents) rides each dispatch once instead of K times.

    K == 1 dispatches skip the scan entirely: wrapping an SPMD train step
    in a one-trip lax.scan puts the whole program inside a While op, which
    XLA partitions dramatically slower (a 4-partition XLA:CPU compile of
    this step goes from >510 s scanned to ~1 min bare) for zero run-time
    benefit.
    """
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state: TrainState, batches, key, const=None):
        merge = (lambda b: b) if const is None else \
            (lambda b: dict(b, **const))
        k_steps = jax.tree_util.tree_leaves(batches)[0].shape[0]
        if k_steps == 1:
            _, k = jax.random.split(key)
            batch = jax.tree_util.tree_map(lambda b: b[0], batches)
            return train_step(state, merge(batch), k)

        def body(carry, batch):
            state, key = carry
            key, k = jax.random.split(key)
            state, metrics = train_step(state, merge(batch), k)
            return (state, key), metrics

        (state, _), metrics = jax.lax.scan(body, (state, key), batches)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return run


@flax.struct.dataclass
class SceneStageState:
    """Train state for the scene-stage (encode-once) trainer: encoder and
    ray-branch params carry separate optimizer states because they update at
    different cadences (encoder once per K-step stage, ray branch every
    step)."""
    step: jnp.ndarray
    enc_params: Any
    ray_params: Any
    enc_opt_state: Any
    ray_opt_state: Any
    model_state: Any = None

    @property
    def params(self):
        """Merged view for checkpoint/render compatibility."""
        return {**self.enc_params, **self.ray_params}


def partition_encoder_params(params, is_enc=None):
    """Split a NeRFTP param tree into (encoder, ray-branch) top-level
    subtrees. Encoder = everything NeRFTP.encode touches: the GridEncoder
    ('encoder') and the factored local projections ('local_proj_*')."""
    if is_enc is None:
        is_enc = lambda k: k == "encoder" or k.startswith("local_proj")
    params = dict(params)
    enc = {k: v for k, v in params.items() if is_enc(k)}
    ray = {k: v for k, v in params.items() if not is_enc(k)}
    return enc, ray


def create_scene_stage_state(params, enc_optimizer, ray_optimizer,
                             model_state=None) -> SceneStageState:
    enc, ray = partition_encoder_params(params)
    return SceneStageState(
        step=jnp.zeros((), jnp.int32), enc_params=enc, ray_params=ray,
        enc_opt_state=enc_optimizer.init(enc),
        ray_opt_state=ray_optimizer.init(ray), model_state=model_state)


def make_scene_stage_trainer(encode_fn: Callable, loss_fn: Callable,
                             enc_optimizer, ray_optimizer,
                             multi_stage: bool = False,
                             cot_dtype=jnp.float32):
    """Encode-once scene-stage trainer — the TPU-first restructuring of
    NeO-360 training for throughput.

    Motivation: the GridEncoder + pixel-latent encode is ~75% of a NeO-360
    train step (BASELINE.md xplane attribution) yet its inputs (the 3 source
    views) change only when the sampled scene changes. The reference
    re-encodes every 500-ray step (models/neo360/model.py:266-273). Here a
    *stage* = K consecutive steps on ONE scene: the encoder forward runs
    once, each step trains the ray branch against the fixed feature tables,
    and the encoder receives ONE update from the K steps' accumulated
    feature cotangents pulled back through ONE encoder VJP. The pullback is
    exact gradient accumulation: a VJP is linear in the cotangent and the
    encoder params are fixed within the stage, so
    sum_k d loss_k/d enc = vjp(sum_k d loss_k/d features). The cotangent is
    divided by K (mean), keeping the encoder's per-step learning rate.

    encode_fn(enc_params, model_state, src)
        -> (tables, (aux, new_model_state)); `tables` is the differentiable
        feature pack the loss consumes (NeRFTP.encode's corner tables).
    loss_fn(ray_params, tables, src, batch, key) -> (loss, metrics)

    Returns run(state, src, ray_batches, key) -> (state, last-step metrics)
    where ray_batches is a dict of (K, B, ...) arrays. With
    `multi_stage=True`, `src` leaves carry a leading stage axis S and
    ray_batches are (S, K, B, ...): one dispatch scans S whole stages
    (amortizing the ~0.3-0.5 s per-dispatch relay cost the way
    make_staged_trainer does for plain steps).
    """
    def stage_body(state: SceneStageState, src, ray_batches, key):
        tables, enc_vjp, (_, new_model_state) = jax.vjp(
            lambda p: encode_fn(p, state.model_state, src),
            state.enc_params, has_aux=True)

        # Cotangent accumulator dtype: f32 is exact; bf16 halves the
        # accumulator's HBM traffic (the corner-table cotangents are
        # ~GB-scale and are read+written EVERY step — ~10 ms/step of the
        # adopted production config per the round-3 xplane profile) at
        # ~1e-2 relative error on a K-term sum, which Adam's per-coordinate
        # normalization absorbs (fixture quality A/B in BASELINE.md).
        cot0 = jax.tree_util.tree_map(
            lambda t: jnp.zeros(t.shape, cot_dtype), tables)

        def body(carry, batch):
            ray_p, ray_opt, cot, key, step = carry
            key, k = jax.random.split(key)
            (_, metrics), (g_ray, g_tab) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    ray_p, tables, src, batch, k)
            updates, ray_opt = ray_optimizer.update(g_ray, ray_opt, ray_p)
            ray_p = optax.apply_updates(ray_p, updates)
            cot = jax.tree_util.tree_map(
                lambda c, g: c + g.astype(cot_dtype), cot, g_tab)
            return (ray_p, ray_opt, cot, key, step + 1), metrics

        k_steps = next(iter(ray_batches.values())).shape[0]
        (ray_p, ray_opt, cot, _, step), metrics = jax.lax.scan(
            body, (state.ray_params, state.ray_opt_state, cot0, key,
                   state.step), ray_batches)

        cot = jax.tree_util.tree_map(
            lambda c, t: (c / k_steps).astype(t.dtype), cot, tables)
        (g_enc,) = enc_vjp(cot)
        enc_updates, enc_opt = enc_optimizer.update(
            g_enc, state.enc_opt_state, state.enc_params)
        enc_p = optax.apply_updates(state.enc_params, enc_updates)

        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return SceneStageState(
            step=step, enc_params=enc_p, ray_params=ray_p,
            enc_opt_state=enc_opt, ray_opt_state=ray_opt,
            model_state=new_model_state), last

    if not multi_stage:
        return functools.partial(jax.jit, donate_argnums=(0,))(stage_body)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_stages(state: SceneStageState, srcs, ray_batches, key):
        def outer(carry, inp):
            state, key = carry
            src, rb = inp
            key, k = jax.random.split(key)
            state, metrics = stage_body(state, src, rb, k)
            return (state, key), metrics

        (state, _), metrics = jax.lax.scan(outer, (state, key),
                                           (srcs, ray_batches))
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return run_stages


def stack_batches(samples, keys=None):
    """Stack a list of sample dicts into one dict of (K, ...) arrays."""
    import numpy as np
    keys = keys or list(samples[0].keys())
    return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in keys}


def make_image_renderer(render_chunk_fn: Callable, chunk: int = 4096,
                        mesh=None):
    """render_chunk_fn(params, rays_chunk) -> dict of (chunk, ...) outputs.

    Returns render(params, rays) that pads rays to a multiple of `chunk`,
    lax.map's over tiles, and strips the padding. `rays` is a dict of (N, D)
    arrays. One jit per distinct padded size (sizes are quantized by `chunk`,
    so in practice one).

    With a `mesh`, the TILE axis is sharded over the mesh's "data" axis via
    shard_map — the NeRF analogue of context parallelism: every chip renders
    its own contiguous block of full-`chunk` tiles (so the per-chip tile size
    stays at the tuned VMEM knee) and XLA gathers the outputs (replacing the
    reference's eval-time Lightning all_gather, interface.py:30-50).

    shard_map, not with_sharding_constraint: rays are embarrassingly
    parallel, so the partitioning is made explicit per-device rather than
    left to GSPMD propagation — which was measured REPLICATING the full
    NeRFTP body on every device (scripts/mesh_render_scaling.py: 8 virtual
    devices took 7.99x the 1-device wall on one core; the pure-matmul
    control partitioned at 1.04x, isolating the model body as the
    propagation failure).
    """
    ndev = 1 if mesh is None else int(mesh.shape["data"])

    @functools.partial(jax.jit, static_argnames=("n_valid", "n_padded"))
    def _render(params, rays, n_valid: int, n_padded: int):
        # edge-replicate padding: padded lanes hold a valid ray, so ray math
        # (normalization, sphere intersection) stays finite.
        pad_width = ((0, n_padded - n_valid),) + ((0, 0),) * (
            next(iter(rays.values())).ndim - 1)
        padded = {k: jnp.pad(v, pad_width, mode="edge") for k, v in rays.items()}
        tiled = {k: v.reshape((n_padded // chunk, chunk) + v.shape[1:])
                 for k, v in padded.items()}

        def local_map(params, tiled):
            return jax.lax.map(lambda c: render_chunk_fn(params, c), tiled)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            out = jax.shard_map(local_map, mesh=mesh,
                                in_specs=(P(), P("data")),
                                out_specs=P("data"),
                                check_vma=False)(params, tiled)
        else:
            out = local_map(params, tiled)
        return {k: v.reshape((n_padded,) + v.shape[2:])[:n_valid]
                for k, v in out.items()}

    def render(params, rays):
        n = next(iter(rays.values())).shape[0]
        quantum = chunk * ndev
        n_padded = ((n + quantum - 1) // quantum) * quantum
        return _render(params, rays, n, n_padded)

    return render
