"""Data-parallel scaling over a 1-D device mesh.

The distribution layer the reference never actually had (its DDP scaffolding
is vestigial and never activated — SURVEY.md §2.3): ray-batch data
parallelism via `shard_map` over a `jax.sharding.Mesh`:

- training: each chip renders its ray shard, gradients are `pmean`-reduced
  over ICI, the (replicated) optimizer state updates identically everywhere.
  The sharded step calls the SAME `train.state.rgb_step_body` as the
  single-device step — one loss implementation, full batch-dict support
  (RGBA images, per-ray `cam_near_far`, TV/WD regularizers, the
  `update_proposal` schedule).
- inference: full-frame rays shard across chips; outputs gather back on the
  `data` axis (the eval all_gather of utils.py:1919-1943, done properly).

No TP/PP is needed at reference scale (SURVEY.md §2.3); the mesh is built
1-D but the helpers accept any axis name so a 2-D mesh (dp x tp for a future
sharded SAM teacher) composes.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sanerf_tpu.config import TrainConfig
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.state import TrainState


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_pspec(batch: Dict, axis: str = "data") -> Dict:
    """PartitionSpec per batch entry: shard the leading (ray) axis; arrays
    with a broadcast leading dim of 1 (e.g. shared cam_near_far [1, 2])
    replicate."""
    return {
        k: P(axis) if np.ndim(v) >= 1 and v.shape[0] > 1 else P()
        for k, v in batch.items()
    }


def make_dp_train_step(
    model: NerfModel,
    cfg: TrainConfig,
    mesh: Mesh,
    trainable: Optional[Params] = None,
    axis: str = "data",
    batch_keys: Optional[Tuple[str, ...]] = None,
    shared_keys: Tuple[str, ...] = (),
):
    """Build the sharded stage-1 train step around the canonical step body.

    Sharding specs are derived from the actual batch at call time (leading
    ray axis shards; arrays with a broadcast leading dim of 1, e.g. a
    shared [1, 2] cam_near_far, replicate) and cached per batch signature.
    Pass `batch_keys`/`shared_keys` to pin the specs explicitly instead.
    Returns step(state, batch, key, update_proposal=True) like
    make_rgb_train_step.
    """
    tx = state_lib.make_optimizer(cfg, trainable)

    def build(update_proposal: bool, spec_items: Tuple[Tuple[str, bool], ...]):
        spec = {k: P(axis) if sharded else P() for k, sharded in spec_items}

        def body(state, batch, key):
            return state_lib.rgb_step_body(
                model, cfg, tx, state, batch, key,
                update_proposal=update_proposal, axis_name=axis)

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(), spec, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0,))

    pinned = None
    if batch_keys is not None:
        pinned = tuple(sorted(
            [(k, True) for k in batch_keys] + [(k, False) for k in shared_keys]
        ))
    cache = {}

    def step(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array,
             update_proposal: bool = True):
        if pinned is not None:
            spec_items = pinned
        else:
            spec_items = tuple(sorted(
                (k, bool(np.ndim(v) >= 1 and v.shape[0] > 1))
                for k, v in batch.items()
            ))
        sig = (bool(update_proposal), spec_items)
        if sig not in cache:
            cache[sig] = build(*sig)
        return cache[sig](state, batch, key)

    return step


def make_dp_sam_train_step(
    model: NerfModel,
    cfg,
    mesh: Mesh,
    trainable: Optional[Params] = None,
    h: int = 32,
    w: int = 32,
    axis: str = "data",
    with_cam_near_far: bool = False,
):
    """Sharded stage-2 student step (SURVEY §2.3: "batch-shard teacher
    calls across the mesh" — here the expensive side, the student's
    low-res feature render, shards by rays; the strips all_gather before
    the resize+MSE; grads psum). Wraps the SAME `train.distill.sam_step_body`
    as the single-device step."""
    from sanerf_tpu.train.distill import sam_step_body

    tx = state_lib.make_optimizer(cfg.train, trainable)
    spec = {"rays_o_lr": P(axis), "rays_d_lr": P(axis)}
    if with_cam_near_far:
        spec["cam_near_far"] = P()

    def body(state, batch, gt, key):
        return sam_step_body(model, cfg, tx, state, batch, gt, key, h, w,
                             axis_name=axis)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_mask_train_step(
    model: NerfModel,
    cfg,
    mesh: Mesh,
    trainable: Optional[Params] = None,
    axis: str = "data",
    batch_keys: Tuple[str, ...] = ("rays_o", "rays_d", "masks"),
    shared_keys: Tuple[str, ...] = (),
):
    """Sharded stage-3 mask step around `train.mask_trainer.mask_step_body`.

    The batch must be laid out per-shard by `shard_mask_batch` (globals and
    whole patches interleaved per chip); `num_global` passed to the returned
    step is the PER-CHIP global-ray count. Input specs derive from the
    actual batch keys per signature (`shared_keys` replicate; everything
    else shards on the ray axis)."""
    from sanerf_tpu.train.mask_trainer import mask_step_body

    tx = state_lib.make_optimizer(cfg.train, trainable)
    shared = set(shared_keys) | {"cam_near_far"}

    def build(num_global: int, use_similarity: bool, keys: Tuple[str, ...]):
        spec = {k: (P() if k in shared else P(axis)) for k in keys}

        def body(state, batch, key):
            return mask_step_body(model, cfg, tx, state, batch, key,
                                  num_global, use_similarity, axis_name=axis)

        aux_spec = {"loss": P(), "ce": P(), "pred": P(axis), "error": P(axis)}
        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(), spec, P()),
            out_specs=(P(), aux_spec),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0,))

    cache = {}

    def step(state: TrainState, batch: Dict, key: jax.Array, num_global: int,
             use_similarity: bool):
        sig = (num_global, bool(use_similarity), tuple(sorted(batch)))
        if sig not in cache:
            cache[sig] = build(*sig)
        return cache[sig](state, batch, key)

    return step


def shard_mask_batch(batch: Dict, mesh: Mesh, num_global: int,
                     patch_pixels: int, axis: str = "data") -> Tuple[Dict, int]:
    """Reorder a stage-3 batch [globals | patches] into per-chip blocks
    [g_0 p_0 | g_1 p_1 | ...] so shard_map's contiguous split gives every
    chip its globals plus WHOLE patches, then place on the mesh.

    Returns (sharded batch, per-chip num_global). Requires num_global and
    the patch count to divide the mesh size."""
    n = int(mesh.devices.size)
    total = batch["masks"].shape[0]
    n_patch_px = total - num_global
    assert num_global % n == 0, (num_global, n)
    assert n_patch_px % (patch_pixels * n) == 0 or n_patch_px == 0, (
        n_patch_px, patch_pixels, n)
    gn = num_global // n
    ln = n_patch_px // n
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape") or np.ndim(v) < 1 or v.shape[0] != total:
            # shared metadata (cam_near_far [1,2], scalars) replicates
            if hasattr(v, "shape"):
                out[k] = jax.device_put(
                    jnp.asarray(v), jax.sharding.NamedSharding(mesh, P()))
            continue
        g, l = np.asarray(v[:num_global]), np.asarray(v[num_global:])
        parts = []
        for i in range(n):
            parts.append(g[i * gn:(i + 1) * gn])
            parts.append(l[i * ln:(i + 1) * ln])
        arr = jnp.asarray(np.concatenate(parts, axis=0))
        out[k] = jax.device_put(
            arr, jax.sharding.NamedSharding(mesh, P(axis)))
    return out, gn


def make_dp_render(model: NerfModel, mesh: Mesh, axis: str = "data",
                   with_cam_near_far: bool = False, **render_kwargs):
    """Sharded full-frame inference: rays split over chips, results
    concatenated on the ray axis (replaces the reference's eval all_gather,
    utils.py:1919-1943). Ray count must divide the mesh size — pad frames
    to a multiple of (chips * tile). With `with_cam_near_far` the returned
    fn takes a shared [1, 2] near/far (replicated). `return_feats` /
    `return_mask` in render_kwargs shard their extra outputs too (the
    round-2 `simple` gate is gone — feature/mask eval frames render
    sharded as well)."""

    out_spec = {"image": P(axis), "depth": P(axis), "weights_sum": P(axis)}
    if render_kwargs.get("return_feats"):
        out_spec["samvit"] = P(axis)
    if render_kwargs.get("return_mask"):
        out_spec["instance_mask_logits"] = P(axis)

    if with_cam_near_far:
        def shard_fn(params: Params, rays_o, rays_d, cnf):
            out = run_rays(model, params, rays_o, rays_d,
                           cam_near_far=cnf, **render_kwargs)
            return {k: out[k] for k in out_spec}

        in_specs = (P(), P(axis), P(axis), P())
    else:
        def shard_fn(params: Params, rays_o, rays_d):
            out = run_rays(model, params, rays_o, rays_d, **render_kwargs)
            return {k: out[k] for k in out_spec}

        in_specs = (P(), P(axis), P(axis))

    mapped = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(mapped)


def render_frame_dp(model: NerfModel, mesh: Mesh, render_fn, params,
                    rays_o, rays_d, cam_near_far=None):
    """Pad rays to the mesh size, run a sharded render, trim. `render_fn`
    comes from make_dp_render (built once, reused per frame)."""
    N = rays_o.shape[0]
    n = int(mesh.devices.size)
    M = (N + n - 1) // n * n
    if M != N:
        rays_o = jnp.concatenate(
            [rays_o, jnp.broadcast_to(rays_o[-1:], (M - N, 3))], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(rays_d[-1:], (M - N, 3))], 0)
    args = (params, rays_o, rays_d)
    if cam_near_far is not None:
        args = args + (cam_near_far,)
    out = render_fn(*args)
    return {k: v[:N] for k, v in out.items()}


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place (replicate) the train state across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place batch arrays on the mesh: leading (ray) axis sharded, arrays
    with a broadcast leading dim of 1 replicated."""
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        spec = P(axis) if v.ndim >= 1 and v.shape[0] > 1 else P()
        out[k] = jax.device_put(v, jax.sharding.NamedSharding(mesh, spec))
    return out
