"""Stage-2: online distillation of SAM ViT-H features into the NeRF.

Rebuild of the reference's `with_sam` training branch (utils.py:1072-1108):

1. every `cache_interval`-th step renders a fresh camera-augmented frame
   (staged, no grad), runs the frozen ViT-H teacher on the uint8 render,
   and inserts {rays, gt features} into a ring-buffer cache
   (`Cache`, utils.py:515-531);
2. every step, the student renders the low-res feature map and minimizes
   MSE against the (bilinear-resized-to-64x64) teacher features;
3. the RGB/geometry backbone is frozen via the trainable mask from
   `load_partial_and_freeze` — only s-field + samvit head train.

Host/device choreography (SURVEY.md §7 hard part): the teacher call and the
student step are separate jitted programs; the cache stores device arrays so
cached steps never touch the host.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sanerf_tpu.config import Config
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.models.fields import NerfModel, Params
from sanerf_tpu.models.renderer import run_rays
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.state import TrainState
from sanerf_tpu.train.trainer import Trainer, _device_batch


class Cache:
    """Fixed-size ring buffer with random get (utils.py:515-531)."""

    def __init__(self, size: int):
        self.size = size
        self.data: List = []
        self.ptr = 0

    def full(self) -> bool:
        return len(self.data) >= self.size

    def insert(self, item):
        if self.size <= 0:
            return
        if len(self.data) < self.size:
            self.data.append(item)
        else:
            self.data[self.ptr] = item
            self.ptr = (self.ptr + 1) % self.size

    def get(self, rng: np.random.Generator):
        return self.data[int(rng.integers(0, len(self.data)))]


def sam_step_body(model: NerfModel, cfg: Config, tx, state: TrainState,
                  batch: Dict, gt_samvit: jax.Array, key: jax.Array,
                  h: int, w: int, axis_name: Optional[str] = None):
    """One stage-2 optimization step (pure; jit/shard_map applied by the
    callers — the same one-body pattern as state.rgb_step_body).

    With `axis_name` set (inside shard_map) the student rays are sharded:
    each chip renders its row-strip of the feature map, the strips
    all_gather over ICI (h*w*256 floats, ~1 MB — cheap) so the bilinear
    resize + MSE see the full map, and gradients pmean (see the inline note
    on why pmean — not psum — is exact here)."""

    def loss_fn(params):
        # update_proposal=False: the backbone (incl. proposal nets) is
        # frozen in stage 2 — computing then masking their grads wastes
        # the hot path (utils.py:1094-1099 renders the student with
        # update_proposal=False too). Measured at reference scale
        # (32^2 student rays, 128/64/32 steps, v5e): 37.7 -> 134 it/s
        # for the student step (3.6x)
        out = run_rays(
            model, params, batch["rays_o_lr"], batch["rays_d_lr"], key,
            training=True, return_feats=True, update_proposal=False,
            cam_near_far=batch.get("cam_near_far"),
        )
        feats = out["samvit"]  # [local_rays, C]
        if axis_name is not None:
            feats = jax.lax.all_gather(feats, axis_name, axis=0, tiled=True)
        pred = feats.reshape(h, w, -1)
        pred = jax.image.resize(
            pred, (gt_samvit.shape[0], gt_samvit.shape[1], pred.shape[-1]),
            "bilinear",
        )  # (utils.py:1100-1103)
        loss = jnp.mean((pred - gt_samvit) ** 2)
        return loss, {"loss": loss}

    grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
    if axis_name is not None:
        # pmean, NOT psum: the global loss is computed (replicated) on every
        # chip, so each chip's backward already carries an n_devices factor
        # through the all_gather transpose (psum_scatter of n identical
        # cotangents) — pmean cancels it exactly (verified by the exact
        # grad-equality test in tests/test_parallel.py)
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = state_lib._ema_update(state.ema_params, params, cfg.train.ema_decay)
    return TrainState(params, ema, opt_state, state.step + 1), aux


def make_sam_train_step(model: NerfModel, cfg: Config, trainable: Optional[Params]):
    """Jitted student step: low-res feature render -> MSE vs teacher."""
    tx = state_lib.make_optimizer(cfg.train, trainable)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("h", "w"))
    def step(state: TrainState, batch: Dict, gt_samvit: jax.Array, key: jax.Array,
             h: int, w: int):
        return sam_step_body(model, cfg, tx, state, batch, gt_samvit, key, h, w)

    return step


class SamDistillTrainer(Trainer):
    """Stage-2 trainer: frozen backbone + SAM feature field distillation."""

    def __init__(self, name, cfg: Config, model: NerfModel, teacher=None, **kw):
        super().__init__(name, cfg, model, **kw)
        self.teacher = teacher  # SamPredictor or callable(img_uint8)->[64,64,256]
        self.cache = Cache(cfg.sam.cache_size)
        self._sam_step = make_sam_train_step(model, cfg, self.trainable)
        self._sam_step_dp = {}  # (h, w, has_cnf) -> sharded step

    def _get_dp_sam_step(self, h: int, w: int, has_cnf: bool):
        sig = (h, w, has_cnf)
        if sig not in self._sam_step_dp:
            from sanerf_tpu.parallel import dp

            self._sam_step_dp[sig] = dp.make_dp_sam_train_step(
                self.model, self.cfg, self.mesh, self.trainable, h=h, w=w,
                with_cam_near_far=has_cnf)
        return self._sam_step_dp[sig]

    def _run_student_step(self, batch, gt, key):
        """Dispatch the student step — sharded over the mesh when one exists
        and the feature rays divide it (VERDICT r2 item 4)."""
        h, w = batch["h"], batch["w"]
        if self.mesh is not None and (h * w) % self.mesh.devices.size == 0:
            from sanerf_tpu.parallel import dp

            keep = ("rays_o_lr", "rays_d_lr", "cam_near_far")
            dev = dp.shard_batch(
                {k: v for k, v in batch.items() if k in keep}, self.mesh)
            step = self._get_dp_sam_step(h, w, "cam_near_far" in dev)
            return step(self.state, dev, jnp.asarray(gt), key)
        return self._sam_step(self.state, _device_batch(batch), gt, key,
                              h=h, w=w)

    def teacher_features(self, image_uint8: np.ndarray) -> jax.Array:
        """uint8 [H, W, 3] -> [64, 64, 256] teacher features
        (utils.py:1083-1087)."""
        if callable(self.teacher) and not hasattr(self.teacher, "set_image"):
            return jnp.asarray(self.teacher(image_uint8))
        self.teacher.set_image(image_uint8)
        return self.teacher.features[0]

    def train(self, train_dataset, valid_dataset=None, max_epoch: int = 1,
              steps_per_epoch: Optional[int] = None):
        import time

        steps_per_epoch = steps_per_epoch or len(train_dataset)
        sc = self.cfg.sam
        for _ in range(max_epoch):
            self.epoch += 1
            t0 = time.time()
            loss_sum = None  # device-side running sum; fetched once per epoch
            for _ in range(steps_per_epoch):
                self.global_step += 1
                use_cache = (
                    sc.cache_size > 0
                    and self.cache.full()
                    and self.global_step % sc.cache_interval != 0
                )  # (utils.py:875-878)
                if use_cache:
                    batch, gt = self.cache.get(self.rng)
                else:
                    batch = train_dataset.collate_sam(self.rng)
                    gt = self._fresh_teacher_target(batch)
                    if sc.cache_size > 0:
                        self.cache.insert((batch, gt))
                self.state, aux = self._run_student_step(
                    batch, gt, self._next_key())
                loss_sum = (aux["loss"] if loss_sum is None
                            else loss_sum + aux["loss"])
            if loss_sum is None:  # steps_per_epoch == 0
                continue
            loss = float(loss_sum) / steps_per_epoch
            dt = time.time() - t0
            self.log(
                f"[sam epoch {self.epoch}] step {self.global_step} "
                f"feat_mse={loss:.5f} ({steps_per_epoch / dt:.1f} it/s)"
            )
            self.log_metrics({"feat_mse": loss,
                              "it_per_s": steps_per_epoch / dt})
        self.save_checkpoint(full=True)

    def _fresh_teacher_target(self, batch) -> jax.Array:
        """Render the augmented frame and run the teacher (utils.py:1077-1087).
        The full-frame render shards over the mesh when one exists (the
        expensive 512^2 staged render of the cache-refresh path)."""
        H, W = batch["H"], batch["W"]
        out = self._render_eval_frame(
            self.state.params,
            jnp.asarray(batch["rays_o"]), jnp.asarray(batch["rays_d"]),
            cam_near_far=None if batch.get("cam_near_far") is None
            else jnp.asarray(batch["cam_near_far"]),
        )
        rgb = np.asarray(out["image"]).reshape(H, W, 3)
        image = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        return self.teacher_features(image)

    def eval_feature_mse(self, dataset, n_frames: int = 4) -> float:
        """Held-out teacher-vs-student feature MSE (eval_step with_sam branch,
        utils.py:1122-1241).

        FIXED protocol: pose index is pinned per frame (and eval datasets use
        the fixed eval fovy), so the number is comparable across runs and
        checkpoints — a randomly-drawn camera would make it a noisy sample."""
        errs = []
        for idx in range(min(n_frames, len(dataset))):
            batch = dataset.collate_sam(self.rng, index=idx)
            gt = self._fresh_teacher_target(batch)
            out = run_rays(
                self.model, self.eval_params(),
                jnp.asarray(batch["rays_o_lr"]), jnp.asarray(batch["rays_d_lr"]),
                return_feats=True,
            )
            pred = out["samvit"].reshape(batch["h"], batch["w"], -1)
            pred = jax.image.resize(pred, gt.shape, "bilinear")
            errs.append(float(jnp.mean((pred - gt) ** 2)))
        return float(np.mean(errs))
