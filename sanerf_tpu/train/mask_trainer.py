"""Stage-3: per-object instance mask-field training.

Rebuild of the reference's `with_mask` branch (utils.py:941-1070):
- render with the mask head -> instance logits; softmax cross-entropy on
  labeled pixels of the global rays (gt == -1 ignored, utils.py:957-976);
- incoherent-region down-weighting (utils.py:978-979);
- error-map EMA refresh from cosine-similarity error (utils.py:981-1017),
  applied host-side to the provider's importance map;
- depth-weighted label regularization (utils.py:1028-1030);
- rgb-similarity loss on the local mixed-sampling patches after
  `rgb_similarity_iter` (utils.py:1033-1064).

The backbone (and SAM field, if present) stays frozen via the stage
handoff mask; only the mask head trains.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sanerf_tpu.config import Config
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.ops import label_regularization, rgb_similarity_loss
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.state import TrainState
from sanerf_tpu.train.trainer import Trainer, _device_batch
from sanerf_tpu.train.metrics import MeanIoUMeter


def mask_step_body(model: NerfModel, cfg: Config, tx, state: TrainState,
                   batch: Dict, key: jax.Array, num_global: int,
                   use_similarity: bool, axis_name: Optional[str] = None):
    """One stage-3 optimization step (pure; jit/shard_map applied by the
    callers). Under `axis_name` the batch is PER-SHARD (num_global and
    num_local_sample are the per-chip counts; parallel/dp.py interleaves
    [globals_i, patches_i] per chip so every shard sees whole patches):

    - the CE normalizes by the GLOBAL labeled-pixel count (psum of the
      numerator and denominator), so every chip computes the identical
      global loss and gradients PSUM exactly;
    - label_regularization psums its weighted sums the same way;
    - rgb_similarity decorrelates its anchor sampling per shard (fold_in)
      and pmeans — equal patch counts per chip make that the global mean.
    """
    mc = cfg.mask
    n_inst = model.cfg.n_inst
    sim_key = key
    if axis_name is not None:
        sim_key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

    def loss_fn(params):
        out = run_rays(
            model, params, batch["rays_o"], batch["rays_d"], None,
            training=True, return_mask=True,
            cam_near_far=batch.get("cam_near_far"),
        )
        logits = out["instance_mask_logits"]  # [N, I]
        probs = jnp.clip(jax.nn.softmax(logits, -1), mc.epsilon, 1 - mc.epsilon)
        gt = batch["masks"]  # [N] int, -1 = unlabeled

        g_probs, g_gt = probs[:num_global], gt[:num_global]
        labeled = g_gt != -1
        onehot = jax.nn.one_hot(jnp.maximum(g_gt, 0), n_inst)
        nll = -jnp.log(jnp.sum(onehot * g_probs, -1))
        nll = jnp.where(labeled, nll, 0.0)
        if mc.incoherent_uncertainty_weight < 1 and "incoherent_masks" in batch:
            inc = batch["incoherent_masks"][:num_global]
            nll = (1 - inc + mc.incoherent_uncertainty_weight * inc) * nll
        nll_sum = jnp.sum(nll)
        n_labeled = jnp.sum(labeled)
        if axis_name is not None:
            nll_sum = jax.lax.psum(nll_sum, axis_name)
            n_labeled = jax.lax.psum(n_labeled, axis_name)
        loss = nll_sum / jnp.maximum(n_labeled, 1)

        aux = {"ce": loss}
        if mc.label_regularization_weight > 0:
            lr_loss = label_regularization(
                jax.lax.stop_gradient(out["depth"][:num_global]),
                g_probs, mc.patch_size, n_inst, axis_name=axis_name,
            )
            loss = loss + mc.label_regularization_weight * lr_loss
        if use_similarity and mc.mixed_sampling:
            P = mc.local_sample_patch_size**2
            S = (batch["masks"].shape[0] - num_global) // P
            local_probs = probs[num_global:].reshape(S, P, -1)
            local_rgb = out["image"][num_global:].reshape(S, P, 3)
            inc = batch.get("error_maps", batch.get("incoherent_masks"))
            local_inc = inc[num_global:].reshape(S, P)
            sim = rgb_similarity_loss(
                sim_key, jax.lax.stop_gradient(local_rgb), local_probs,
                local_inc,
                threshold=mc.rgb_similarity_threshold,
                exp_weight=mc.rgb_similarity_exp_weight,
                epsilon=mc.epsilon,
                num_sample=mc.rgb_similarity_num_sample,
                redundant_instance=model.cfg.redundant_instance,
                use_pred_logistics=mc.rgb_similarity_use_pred_logistics,
            )
            if axis_name is not None:
                sim = jax.lax.pmean(sim, axis_name)
            loss = loss + mc.rgb_similarity_loss_weight * sim

        # error signal for the EMA map (utils.py:994-1014)
        gt_onehot = jax.nn.one_hot(jnp.maximum(g_gt, 0), probs.shape[-1])
        cos = jnp.sum(g_probs * gt_onehot, -1) / (
            jnp.linalg.norm(g_probs, axis=-1) * jnp.maximum(
                jnp.linalg.norm(gt_onehot, axis=-1), 1e-8)
        )
        error = jnp.exp(-mc.rgb_similarity_exp_weight * cos - mc.epsilon)

        aux.update({
            "loss": loss,
            # globals only: shards concatenate back to the original global
            # order; the trainer's [:num_rays] slice stays a no-op
            "pred": jnp.argmax(logits[:num_global], -1),
            "error": error,
        })
        return loss, aux

    grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        # pmean, NOT psum: the psum'd scalars inside loss_fn replicate the
        # global loss on every chip, so each chip's backward carries an
        # n_devices factor through the collective transposes — pmean
        # cancels it exactly (see tests/test_parallel.py grad equality)
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = state_lib._ema_update(state.ema_params, params, cfg.train.ema_decay)
    return TrainState(params, ema, opt_state, state.step + 1), aux


def make_mask_train_step(model: NerfModel, cfg: Config, trainable: Optional[Params]):
    tx = state_lib.make_optimizer(cfg.train, trainable)

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        static_argnames=("num_global", "use_similarity"),
    )
    def step(state: TrainState, batch: Dict, key: jax.Array, num_global: int,
             use_similarity: bool):
        return mask_step_body(model, cfg, tx, state, batch, key, num_global,
                              use_similarity)

    return step


class MaskTrainer(Trainer):
    """Stage-3 trainer: mask-field training with self-training refresh."""

    def __init__(self, name, cfg: Config, model: NerfModel, **kw):
        kw.setdefault("metrics", [MeanIoUMeter()])
        super().__init__(name, cfg, model, **kw)
        self._mask_step = make_mask_train_step(model, cfg, self.trainable)
        self._mask_step_dp = None

    def _run_mask_step(self, batch, key, num_global: int, use_similarity: bool):
        """Dispatch the mask step — sharded over the mesh when the batch
        divides it (globals AND whole patches per chip; VERDICT r2 item 4)."""
        mc = self.cfg.mask
        n = 0 if self.mesh is None else int(self.mesh.devices.size)
        total = batch["masks"].shape[0]
        patch_px = mc.local_sample_patch_size ** 2
        n_patch_px = total - num_global
        dp_ok = (
            n > 1
            and num_global % n == 0
            and (n_patch_px == 0 or n_patch_px % (patch_px * n) == 0)
        )
        if not dp_ok:
            if n > 1 and not getattr(self, "_warned_dp", False):
                self._warned_dp = True
                self.log(
                    f"[WARN] mask batch (global={num_global}, "
                    f"patch_px={n_patch_px}) does not divide the "
                    f"{n}-device mesh; stepping single-device")
            return self._mask_step(self.state, _device_batch(batch), key,
                                   num_global=num_global,
                                   use_similarity=use_similarity)
        from sanerf_tpu.parallel import dp

        keep = ("rays_o", "rays_d", "masks", "incoherent_masks",
                "error_maps", "cam_near_far")
        host = {k: v for k, v in batch.items() if k in keep}
        sharded, gn = dp.shard_mask_batch(host, self.mesh, num_global,
                                          patch_px)
        if self._mask_step_dp is None:
            self._mask_step_dp = dp.make_dp_mask_train_step(
                self.model, self.cfg, self.mesh, self.trainable)
        return self._mask_step_dp(self.state, sharded, key, num_global=gn,
                                  use_similarity=use_similarity)

    def train(self, train_dataset, valid_dataset=None, max_epoch: int = 1,
              steps_per_epoch: Optional[int] = None):
        steps_per_epoch = steps_per_epoch or len(train_dataset)
        mc = self.cfg.mask
        num_rays = self.cfg.train.num_rays
        for _ in range(max_epoch):
            self.epoch += 1
            t0 = time.time()
            miou = MeanIoUMeter()
            loss_sum = None
            for _ in range(steps_per_epoch):
                self.global_step += 1
                # multi-res schedule: raise the sampling resolution level
                # every multi_res_update_iter steps (colmap_provider.py:940-962)
                if mc.use_multi_res and hasattr(train_dataset, "multi_res_level"):
                    train_dataset.multi_res_level = min(
                        mc.max_multi_res_level,
                        self.global_step // max(1, mc.multi_res_update_iter),
                    )
                # dynamic incoherent refresh: re-derive boundary maps from the
                # model's own rendered masks (self-training, utils.py:1716-1780)
                if (mc.use_dynamic_incoherent
                        and self.global_step % max(1, mc.incoherent_update_iter) == 0
                        and getattr(train_dataset, "masks", None) is not None):
                    self.update_incoherent_masks(train_dataset)
                batch = train_dataset.collate_mask(self.rng, num_rays)
                use_sim = (
                    mc.rgb_similarity_loss_weight > 0
                    and self.global_step > mc.rgb_similarity_iter >= 0
                )
                self.state, aux = self._run_mask_step(
                    batch, self._next_key(), num_global=num_rays,
                    use_similarity=use_sim,
                )
                if train_dataset.error_map is not None:
                    train_dataset.update_error_map(
                        batch["index"],
                        batch["inds_coarse"][:num_rays],
                        np.asarray(aux["error"]),
                    )
                miou.update(np.asarray(aux["pred"][:num_rays]),
                            batch["masks"][:num_rays])
                loss_sum = (aux["loss"] if loss_sum is None
                            else loss_sum + aux["loss"])
            if loss_sum is None:  # steps_per_epoch == 0
                continue
            dt = time.time() - t0
            self.log(
                f"[mask epoch {self.epoch}] step {self.global_step} "
                f"loss={float(loss_sum) / steps_per_epoch:.4f} "
                f"train_mIoU={miou.measure():.4f} "
                f"({steps_per_epoch / dt:.1f} it/s)"
            )
            if valid_dataset is not None:
                self.evaluate_mask(valid_dataset)
        self.save_checkpoint(full=True)

    def evaluate_mask(self, dataset, n_frames: Optional[int] = None) -> float:
        """Full-frame mIoU on held-out views (utils.py:1948-1959)."""
        from sanerf_tpu.models import renderer as renderer_mod

        meter = MeanIoUMeter()
        params = self.eval_params()
        n = min(n_frames or len(dataset), len(dataset))
        for idx in range(n):
            frame = dataset.frame(idx)
            if "masks" not in frame:
                continue
            cnf = frame.get("cam_near_far")
            out = renderer_mod.render_staged(
                self.model, params, jnp.asarray(frame["rays_o"]),
                jnp.asarray(frame["rays_d"]), return_mask=True,
                cam_near_far=None if cnf is None else jnp.asarray(cnf),
            )
            pred = np.asarray(jnp.argmax(out["instance_mask_logits"], -1))
            meter.update(pred, frame["masks"])
        self.log(f"[mask eval] {meter.report()}")
        return meter.measure()


    # -- self-training label refresh (utils.py:1716-1780) ---------------------

    def render_train_masks(self, dataset, n_frames: Optional[int] = None):
        """Render predicted instance labels for train views."""
        from sanerf_tpu.models import renderer as renderer_mod

        params = self.eval_params()
        n = min(n_frames or len(dataset), len(dataset))
        out = []
        for idx in range(n):
            frame = dataset.frame(idx)
            cnf = frame.get("cam_near_far")
            r = renderer_mod.render_staged(
                self.model, params, jnp.asarray(frame["rays_o"]),
                jnp.asarray(frame["rays_d"]), return_mask=True,
                cam_near_far=None if cnf is None else jnp.asarray(cnf),
            )
            out.append(np.asarray(
                jnp.argmax(r["instance_mask_logits"], -1)
            ).reshape(frame["H"], frame["W"]))
        return np.stack(out)

    def update_ground_truth(self, dataset, n_frames: Optional[int] = None):
        """Replace provider labels with the model's own renders
        (`update_ground_truth`, utils.py:1739-1758)."""
        rendered = self.render_train_masks(dataset, n_frames)
        dataset.masks[: len(rendered)] = rendered.astype(dataset.masks.dtype)

    def update_incoherent_masks(self, dataset, n_frames: int = 4):
        """Recompute incoherent boundary maps from rendered masks
        (`update_incoherent_mask`, utils.py:1760-1780). Refreshes a rotating
        subset of views per call to bound the cost."""
        from sanerf_tpu.data.rays import get_incoherent_mask

        if dataset.incoherent_masks is None:
            return
        n = len(dataset)
        start = (self.global_step // max(
            1, self.cfg.mask.incoherent_update_iter) * n_frames) % n
        idxs = [(start + k) % n for k in range(min(n_frames, n))]
        for idx in idxs:
            frame = dataset.frame(idx)
            from sanerf_tpu.models import renderer as renderer_mod

            r = renderer_mod.render_staged(
                self.model, self.eval_params(), jnp.asarray(frame["rays_o"]),
                jnp.asarray(frame["rays_d"]), return_mask=True,
            )
            pred = np.asarray(jnp.argmax(r["instance_mask_logits"], -1)).reshape(
                frame["H"], frame["W"]
            )
            dataset.incoherent_masks[idx] = get_incoherent_mask(
                (pred > 0).astype(np.float32),
                sfact=max(1, self.cfg.mask.incoherent_downsample_scale),
            )
