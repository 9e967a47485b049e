"""Data-parallel scaling over a 1-D device mesh.

The distribution layer the reference never actually had (its DDP scaffolding
is vestigial and never activated — SURVEY.md §2.3): ray-batch data
parallelism via `shard_map` over a `jax.sharding.Mesh`:

- training: each chip renders its ray shard, gradients are `pmean`-reduced
  over ICI, the (replicated) optimizer state updates identically everywhere.
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
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sanerf_tpu.config import TrainConfig
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.ops import entropy_loss
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.state import TrainState


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_dp_train_step(
    model: NerfModel,
    cfg: TrainConfig,
    mesh: Mesh,
    trainable: Optional[Params] = None,
    axis: str = "data",
):
    """Build the sharded stage-1 train step.

    Batch arrays are sharded on their leading (ray) axis; state is
    replicated. Gradients ride ICI via `pmean` inside shard_map.
    """
    tx = state_lib.make_optimizer(cfg, trainable)

    def shard_fn(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        # decorrelate per-chip randomness
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        render_key, bg_key = jax.random.split(key)
        gt = batch["images"]
        bg = state_lib._bg_color(model, bg_key, gt.shape[0])
        gt_rgb = gt if gt.shape[-1] == 3 else (
            gt[..., :3] * gt[..., 3:] + bg * (1.0 - gt[..., 3:])
        )

        def loss_fn(params):
            out = run_rays(
                model, params, batch["rays_o"], batch["rays_d"], render_key,
                training=True, perturb=True, bg_color=bg,
                cam_near_far=batch.get("cam_near_far"),
            )
            loss_rgb = jnp.mean((out["image"] - gt_rgb) ** 2)
            loss = (
                loss_rgb
                + cfg.lambda_proposal * out["proposal_loss"]
                + cfg.lambda_distort * out["distort_loss"]
            )
            if cfg.lambda_entropy > 0:
                loss = loss + cfg.lambda_entropy * entropy_loss(out["weights_sum"])
            return loss, {"loss": loss, "loss_rgb": loss_rgb}

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)  # ICI all-reduce
        aux = jax.lax.pmean(aux, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state_lib._ema_update(state.ema_params, params, cfg.ema_decay)
        return TrainState(params, ema, opt_state, state.step + 1), aux

    batch_spec = {
        "rays_o": P(axis), "rays_d": P(axis), "images": P(axis),
    }

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_dp_render(model: NerfModel, mesh: Mesh, axis: str = "data"):
    """Sharded full-frame inference: rays split over chips, results
    concatenated on the ray axis (replaces the reference's eval all_gather,
    utils.py:1919-1943). Ray count must divide the mesh size — pad frames
    to a multiple of (chips * tile)."""

    def shard_fn(params: Params, rays_o, rays_d):
        out = run_rays(model, params, rays_o, rays_d)
        return {"image": out["image"], "depth": out["depth"],
                "weights_sum": out["weights_sum"]}

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs={"image": P(axis), "depth": P(axis), "weights_sum": P(axis)},
        check_rep=False,
    )
    return jax.jit(mapped)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place (replicate) the train state across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place batch arrays sharded on their leading axis."""
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}
