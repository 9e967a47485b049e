"""Train state: optimizer, EMA, freeze-masking, and the jitted step builders.

Rebuild of the reference optimization setup (main.py:296-318, nerf/utils.py
train_one_epoch/train_step) as pure jitted functions over an explicit state
pytree:

- Adam(eps=1e-15) with the log-decay schedule lr * 0.1^(step/iters)
  (main.py:296, 312-313), stepped every iteration.
- EMA(0.95) tracked as a parallel param tree (utils.py:615-619).
- Cross-stage freezing: the reference loads `--init_ckpt` non-strictly and
  freezes exactly the loaded keys (main.py:255-262); here that is an
  explicit boolean `trainable` mask realized with `optax.masked` so frozen
  params carry no optimizer state and receive no updates.
- TV / weight-decay regularizers are gradient contributions added before
  the optimizer update (the reference mutates `.grad` in-place after
  unscaling, utils.py:1110-1120).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from sanerf_tpu.config import TrainConfig
from sanerf_tpu.models import fields
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.ops import entropy_loss


class TrainState(NamedTuple):
    params: Params
    ema_params: Params
    opt_state: Any
    step: jax.Array  # int32 scalar


def lr_schedule(cfg: TrainConfig):
    """0.1^(min(step/iters, 1)) decay (main.py:312-313)."""

    def fn(step):
        frac = jnp.minimum(step / cfg.iters, 1.0)
        lr = cfg.lr * jnp.power(0.1, frac)
        if cfg.lr_warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / cfg.lr_warmup_steps)
        return lr

    return fn


# factorized-grid tables (CP lines / VM planes) train at a multiple of the
# MLP lr — TensoRF's split (arXiv:2203.09517: 2e-2 grids vs 1e-3 nets);
# measured +1.1 dB on the CP import-distillation student. Hash-grid tables
# keep the reference's single lr (main.py:312).
GRID_LR_KEYS = ("cp_lines", "vm_planes", "vm_lines",
                "sigma_cp_lines", "sigma_vm_planes", "sigma_vm_lines")


def _grid_lr_mask(params: Params) -> Params:
    return {k: jax.tree.map(lambda _: k in GRID_LR_KEYS, v)
            for k, v in params.items()}


def make_optimizer(cfg: TrainConfig, trainable: Optional[Params] = None):
    tx = optax.adam(learning_rate=lr_schedule(cfg), eps=cfg.adam_eps)
    if cfg.grid_lr_mult != 1.0:
        # scale AFTER adam: the masked keys step at grid_lr_mult * lr
        tx = optax.chain(
            tx, optax.masked(optax.scale(cfg.grid_lr_mult), _grid_lr_mask))
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if trainable is not None:
        labels = jax.tree.map(lambda t: "trainable" if t else "frozen", trainable)
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def grid_upsample_targets(cfg: TrainConfig, mc, step: int) -> dict:
    """Target resolution per factorized-table family at `step` under
    cfg.grid_upsample_steps (keys as fields.grid_resolutions): the
    configured resolution is the FINAL one; with N milestones still ahead
    the tables sit N halvings below it (TensoRF §5.2 trains coarse-to-fine
    and upsamples at milestones)."""
    down = sum(1 for m in cfg.grid_upsample_steps if step < m)
    t = {}
    if mc.mlp_cp_rank > 0:
        t["cp"] = max(8, mc.mlp_cp_res >> down)
    if mc.mlp_vm_rank > 0:
        t["vm"] = max(8, mc.mlp_vm_res >> down)
    if mc.mlp_sigma_cp_rank > 0:
        t["sigma_cp"] = max(8, mc.mlp_sigma_cp_res >> down)
    if mc.mlp_sigma_vm_rank > 0:
        t["sigma_vm"] = max(8, mc.mlp_sigma_vm_res >> down)
    return t


def resize_grid_state(model: NerfModel, cfg: TrainConfig, state: TrainState,
                      targets: dict,
                      trainable: Optional[Params] = None) -> TrainState:
    """Linear-resample the grid tables (params AND ema) to the target
    resolutions and re-init the optimizer state for the new shapes. The
    optimizer reset restarts the lr schedule — TensoRF's lr_upsample_reset
    behavior (their train loop resets lr at every upsample)."""
    new_p = fields.resize_grid_tables(model, state.params, targets)
    new_e = fields.resize_grid_tables(model, state.ema_params, targets)
    tx = make_optimizer(cfg, trainable)
    return TrainState(params=new_p, ema_params=new_e,
                      opt_state=tx.init(new_p), step=state.step)


def all_trainable(params: Params) -> Params:
    return jax.tree.map(lambda _: True, params)


def create_train_state(
    model: NerfModel,
    cfg: TrainConfig,
    key: jax.Array,
    params: Optional[Params] = None,
    trainable: Optional[Params] = None,
) -> TrainState:
    if params is None:
        params = fields.init_params(model, key)
    tx = make_optimizer(cfg, trainable)
    # copy both trees: the train step donates the whole state, which would
    # otherwise delete the caller's param buffers after the first step
    params = jax.tree.map(jnp.asarray, params)
    params = jax.tree.map(jnp.copy, params)
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _ema_update(ema: Params, params: Params, decay: float) -> Params:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def _apply_regularizer_grads(
    model: NerfModel, cfg: TrainConfig, params: Params, grads: Params, key: jax.Array
) -> Params:
    """Add TV / level-meaned WD gradient terms for the active grid
    (utils.py:1110-1120; defaults are 0 -> no-op)."""
    if cfg.lambda_tv > 0:
        x01 = jax.random.uniform(key, (4096, 3))
        contrib = fields.apply_total_variation(model, params, x01, cfg.lambda_tv)
        for k, g in contrib.items():
            # tree-map, not `+`: multi-res cp_lines is a LIST of tables
            # (python `+` would concatenate)
            grads[k] = jax.tree.map(jnp.add, grads[k], g)
    if cfg.lambda_wd > 0:
        contrib = fields.apply_weight_decay(model, params, cfg.lambda_wd)
        for k, g in contrib.items():
            grads[k] = jax.tree.map(jnp.add, grads[k], g)
    if cfg.lambda_l1_grid > 0:
        contrib = fields.apply_l1_sparsity(model, params, cfg.lambda_l1_grid)
        for k, g in contrib.items():
            grads[k] = jax.tree.map(jnp.add, grads[k], g)
    return grads


def rgb_loss_fn(model: NerfModel, cfg: TrainConfig, params: Params,
                batch: Dict[str, jax.Array], gt_rgb, bg, render_key,
                update_proposal: bool, enc_alpha=None):
    """THE canonical stage-1 loss (utils.py:917-931). Both the single-device
    step and the data-parallel step (parallel/dp.py) call this one function
    — there is exactly one loss implementation to maintain.

    `enc_alpha` (traced scalar, TrainConfig.anneal_iters) rides into the
    field apply fns as a non-trainable `params` entry — the apply fns read
    `params.get("enc_alpha")`, so eval/inference (which never inject it)
    always run the full encode."""
    if enc_alpha is not None:
        params = {**params, "enc_alpha": enc_alpha}
    out = run_rays(
        model, params, batch["rays_o"], batch["rays_d"], render_key,
        training=True, perturb=True, bg_color=bg,
        cam_near_far=batch.get("cam_near_far"),
        update_proposal=update_proposal,
    )
    loss_rgb = jnp.mean((out["image"] - gt_rgb) ** 2)
    loss = loss_rgb
    if cfg.lambda_proposal > 0:
        loss = loss + cfg.lambda_proposal * out["proposal_loss"]
    if cfg.lambda_distort > 0:
        loss = loss + cfg.lambda_distort * out["distort_loss"]
    if cfg.lambda_entropy > 0:
        loss = loss + cfg.lambda_entropy * entropy_loss(out["weights_sum"])
    aux = {
        "loss": loss,
        "loss_rgb": loss_rgb,
        "proposal_loss": out["proposal_loss"],
        "distort_loss": out["distort_loss"],
        "psnr": -10.0 * jnp.log10(loss_rgb + 1e-12),
    }
    return loss, aux


def rgb_step_body(
    model: NerfModel,
    cfg: TrainConfig,
    tx,
    state: TrainState,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    update_proposal: bool = True,
    axis_name: Optional[str] = None,
):
    """One stage-1 optimization step (pure; jit/shard_map applied by the
    callers). With `axis_name` set (inside shard_map) the per-shard
    randomness decorrelates via fold_in, gradients and metrics pmean over
    ICI, and the TV/WD regularizer grads use the shared (un-folded) key so
    every chip applies the identical update."""
    shard_key = key
    if axis_name is not None:
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    render_key, bg_key = jax.random.split(shard_key)
    reg_key = jax.random.fold_in(key, 0x7FFFFFFF)  # shared across shards
    gt = batch["images"]
    bg = _bg_color(model, bg_key, gt.shape[0])
    if gt.shape[-1] == 4:
        alpha = gt[..., 3:]
        gt_rgb = gt[..., :3] * alpha + bg * (1.0 - alpha)
    else:
        gt_rgb = gt

    enc_alpha = None
    if cfg.anneal_iters > 0 and model.is_mlp_field:
        enc_alpha = jnp.minimum(state.step / cfg.anneal_iters, 1.0)

    def loss_fn(params):
        return rgb_loss_fn(model, cfg, params, batch, gt_rgb, bg,
                           render_key, update_proposal, enc_alpha=enc_alpha)

    grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        aux = jax.lax.pmean(aux, axis_name)
    grads = _apply_regularizer_grads(model, cfg, state.params, grads, reg_key)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = _ema_update(state.ema_params, params, cfg.ema_decay)
    aux["lr"] = lr_schedule(cfg)(state.step)
    return TrainState(params, ema, opt_state, state.step + 1), aux


def make_rgb_train_step(model: NerfModel, cfg: TrainConfig,
                        trainable: Optional[Params] = None):
    """Stage-1 RGB training step (utils.py:872-937), one jitted program per
    `update_proposal` variant."""
    tx = make_optimizer(cfg, trainable)

    @functools.partial(
        jax.jit, static_argnames=("update_proposal",), donate_argnums=(0,)
    )
    def step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        key: jax.Array,
        update_proposal: bool = True,
    ):
        return rgb_step_body(model, cfg, tx, state, batch, key,
                             update_proposal)

    return step


def _bg_color(model: NerfModel, key: jax.Array, n: int):
    """Training background color (utils.py:892-896)."""
    if model.render_cfg.background == "random":
        return jax.random.uniform(key, (n, 3))
    return jnp.ones(())  # white / last_sample


def update_proposal_now(cfg: TrainConfig, step: int) -> bool:
    """Proposal-update schedule: every step for the first 3000, then every
    5th (utils.py:910-911). Host-side; selects which jitted variant runs."""
    return step <= cfg.prop_warmup_steps or step % cfg.prop_update_every == 0


def adaptive_num_rays(cfg: TrainConfig, num_steps_last: int) -> int:
    """The reference adapts num_rays so final-level points hit `num_points`
    (utils.py:932-935). Because num_points == num_rays * num_steps[-1]
    exactly, the adaptation converges to this constant after one step; with
    static XLA shapes we use the fixed point directly."""
    if not cfg.adaptive_num_rays:
        return cfg.num_rays
    return max(1, cfg.num_points // num_steps_last)
