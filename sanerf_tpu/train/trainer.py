"""Trainer: the experiment loop around the jitted train/eval steps.

Rebuild of the reference Trainer (nerf/utils.py:534-2166) as a thin host
orchestrator: all math lives in jitted functions; the Python loop only
feeds batches, flips the proposal-update schedule, logs, checkpoints, and
runs metric meters. Workload-specific steps:

- stage 1 RGB (this module) — utils.py:872-937
- stage 2 SAM distillation — Trainer subclassing in train/distill.py
- stage 3 mask fields — train/mask_trainer.py

Design notes (TPU):
- the step function is compiled once per (num_rays, update_proposal)
  signature; `update_proposal_now` flips between two cached executables.
- eval/test frames render through `render_staged` (fixed-chunk programs).
- dispatch-ahead: the host enqueues the next step before blocking on the
  previous step's metrics (metrics fetch only every `log_every` steps).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from sanerf_tpu.config import Config
from sanerf_tpu.data.rays import full_frame_rays
from sanerf_tpu.models import fields, renderer
from sanerf_tpu.models.fields import NerfModel
from sanerf_tpu.train import checkpoints as ckpt_lib
from sanerf_tpu.train import state as state_lib
from sanerf_tpu.train.metrics import PSNRMeter


class Trainer:
    def __init__(
        self,
        name: str,
        cfg: Config,
        model: NerfModel,
        workspace: Optional[str] = None,
        metrics: Optional[List] = None,
        use_checkpoint: str = "latest",
        trainable=None,
        init_params=None,
    ):
        self.name = name
        self.cfg = cfg
        self.model = model
        self.metrics = metrics or [PSNRMeter()]
        self.workspace = workspace or cfg.workspace
        self.global_step = 0
        self.epoch = 0
        self.stats = {"results": [], "best_result": None, "checkpoints": []}
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.key(cfg.seed)

        os.makedirs(self.workspace, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{name}.txt")
        self.metrics_path = os.path.join(self.workspace, f"metrics_{name}.jsonl")
        self.writer = None  # tensorboardX opt-in via enable_tensorboard()
        self.ckpt_mgr = ckpt_lib.CheckpointManager(
            self.workspace, name, max_keep=cfg.train.max_keep_ckpt
        )

        self.state = state_lib.create_train_state(
            model, cfg.train, self._next_key(), params=init_params,
            trainable=trainable,
        )
        self.trainable = trainable
        # data-parallel product path: mesh + sharded canonical step
        # (SURVEY.md §2.3; the reference's DDP scaffolding never activated)
        self.mesh = None
        self._dp_step = None
        self._dp_render = None
        if cfg.train.n_devices > 1:
            from sanerf_tpu.parallel import dp

            avail = len(jax.devices())
            if avail < cfg.train.n_devices:
                raise ValueError(
                    f"n_devices={cfg.train.n_devices} but backend has {avail}")
            self.mesh = dp.make_mesh(cfg.train.n_devices)
            self.state = dp.replicate_state(self.state, self.mesh)
        self._train_step = state_lib.make_rgb_train_step(model, cfg.train, trainable)

        # checkpoint autoload (utils.py:659-679)
        if use_checkpoint != "scratch":
            self.load_checkpoint(use_checkpoint)

        self.log(
            f"[INFO] Trainer {name} | workspace {self.workspace} | "
            f"params {sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(self.state.params)):,}"
        )

    # -- infrastructure -----------------------------------------------------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def log(self, msg: str):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def log_metrics(self, scalars: Dict, prefix: str = "train"):
        """Structured observability: JSONL append + optional tensorboard
        (replaces the reference's tensorboardX/wandb hooks,
        utils.py:560, 1480-1482, 1825-1850)."""
        rec = {"step": self.global_step, "epoch": self.epoch,
               **{k: float(v) for k, v in scalars.items()}}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(f"{prefix}/{k}", float(v), self.global_step)
        if getattr(self, "_wandb", None) is not None:
            self._wandb.log({f"{prefix}/{k}": float(v)
                             for k, v in scalars.items()},
                            step=self.global_step)

    def enable_tensorboard(self):
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.workspace, "run"))
        except ImportError:
            self.log("[WARN] tensorboardX unavailable")
        return self.writer

    def enable_wandb(self, project: str = "sanerf_tpu", name: Optional[str] = None):
        """Opt-in wandb logging (--use_wandb; reference main.py:320-321,
        utils.py:1825-1826). Degrades gracefully when the package or network
        is absent — JSONL/tensorboard remain the primary sinks."""
        try:
            import wandb

            self._wandb = wandb.init(project=project,
                                     name=name or self.name, dir=self.workspace)
        except Exception as e:  # no package / no network / no API key
            self._wandb = None
            self.log(f"[WARN] wandb unavailable ({type(e).__name__}); "
                     "continuing with JSONL logging")
        return self._wandb

    # -- training -----------------------------------------------------------

    def train(self, train_dataset, valid_dataset=None, max_epoch: int = 1,
              steps_per_epoch: Optional[int] = None):
        tc = self.cfg.train
        steps_per_epoch = steps_per_epoch or len(train_dataset)
        eval_interval = max(1, max_epoch // max(1, tc.eval_cnt))
        save_interval = max(1, max_epoch // max(1, tc.save_cnt))
        num_rays = state_lib.adaptive_num_rays(
            tc, self.cfg.render.num_steps[-1]
        )
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            num_rays = max(n_dev, (num_rays + n_dev - 1) // n_dev * n_dev)
        sampler = train_dataset
        native = None
        if tc.use_native_loader and getattr(train_dataset, "images", None) is not None                 and getattr(train_dataset, "cam_near_far", None) is None:
            try:
                from sanerf_tpu.data.native_loader import NativeRaySampler

                native = NativeRaySampler(
                    train_dataset.poses, train_dataset.intrinsics,
                    train_dataset.images, num_rays, seed=self.cfg.seed,
                    prefetch_depth=6, n_threads=4,
                )
                sampler = native
            except Exception as e:  # no toolchain -> python path
                self.log(f"[INFO] native loader unavailable ({e}); using numpy collate")
        self.log(
            f"[INFO] train: {max_epoch} epochs x {steps_per_epoch} steps, "
            f"num_rays={num_rays}, eval every {eval_interval}, save every {save_interval}"
            + (" [native loader]" if native else "")
        )

        self._maybe_resize_grids()  # initial coarse tables / resume catch-up
        for _ in range(self.epoch, max_epoch):
            self.epoch += 1
            self._maybe_resize_grids()
            t0 = time.time()
            acc = None  # device-side running sums (cheap adds, no host sync)
            last_aux = None
            with jax.profiler.TraceAnnotation(f"train_epoch_{self.epoch}"):
                for _ in range(steps_per_epoch):
                    self.global_step += 1
                    batch = _device_batch(sampler.collate_train(self.rng, num_rays))
                    up = state_lib.update_proposal_now(tc, self.global_step)
                    if self.mesh is not None:
                        from sanerf_tpu.parallel import dp

                        step = self._get_dp_step(batch)
                        self.state, aux = step(
                            self.state, dp.shard_batch(batch, self.mesh),
                            self._next_key(), update_proposal=up,
                        )
                    else:
                        self.state, aux = self._train_step(
                            self.state, batch, self._next_key(),
                            update_proposal=up,
                        )
                    acc = aux if acc is None else jax.tree.map(
                        jax.numpy.add, acc, aux)
                    last_aux = aux
            if last_aux is None:  # steps_per_epoch == 0
                continue
            # fetch once per epoch (keeps the device pipeline full); scalars
            # are epoch MEANS, not a single-step sample (lr reports its
            # final value — a mean lr is not meaningful under decay)
            aux = {k: float(v) / steps_per_epoch for k, v in acc.items()}
            aux["lr"] = float(last_aux["lr"])
            dt = time.time() - t0
            aux["it_per_s"] = steps_per_epoch / dt
            self.log_metrics({k: v for k, v in aux.items()
                              if isinstance(v, float)})
            self.log(
                f"[epoch {self.epoch}] step {self.global_step} "
                f"loss={aux['loss']:.6f} psnr={aux['psnr']:.2f} "
                f"lr={aux['lr']:.2e} ({steps_per_epoch / dt:.1f} it/s)"
            )
            if valid_dataset is not None and self.epoch % eval_interval == 0:
                self.evaluate_one_epoch(valid_dataset)
            if self.epoch % save_interval == 0:
                self.save_checkpoint(full=True)
        if native is not None:
            native.close()
        self.save_checkpoint(full=True)

    def _maybe_resize_grids(self):
        """TensoRF §5.2 coarse-to-fine schedule (TrainConfig.
        grid_upsample_steps): resample the CP/VM tables to their
        target-at-this-step resolution. Runs at epoch boundaries —
        milestones round up to the next boundary. State is derived by
        comparing table shapes to targets, so checkpoint resume needs no
        extra bookkeeping; the jitted steps retrace on the new shapes."""
        tc = self.cfg.train
        if not tc.grid_upsample_steps or not self.model.is_mlp_field:
            return
        targets = state_lib.grid_upsample_targets(
            tc, self.model.cfg, self.global_step)
        current = fields.grid_resolutions(self.state.params)
        if all(current.get(k) == v for k, v in targets.items()):
            return
        self.state = state_lib.resize_grid_state(
            self.model, tc, self.state, targets, trainable=self.trainable)
        if self.mesh is not None:
            from sanerf_tpu.parallel import dp

            self.state = dp.replicate_state(self.state, self.mesh)
        self.log(f"[grid] tables resized to {targets} at step "
                 f"{self.global_step} (optimizer reset; lr restarts, "
                 "TensoRF-style)")

    def _get_dp_step(self, batch: Dict):
        """Sharded train step, rebuilt if the batch structure changes
        (sharding specs depend on which keys are per-ray vs shared)."""
        from sanerf_tpu.parallel import dp

        batch_keys = tuple(sorted(
            k for k, v in batch.items()
            if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] > 1))
        shared = tuple(sorted(k for k in batch if k not in batch_keys))
        sig = (batch_keys, shared)
        if self._dp_step is None or self._dp_step[0] != sig:
            step = dp.make_dp_train_step(
                self.model, self.cfg.train, self.mesh, self.trainable,
                batch_keys=batch_keys, shared_keys=shared,
            )
            self._dp_step = (sig, step)
        return self._dp_step[1]

    # -- evaluation ---------------------------------------------------------

    def eval_params(self):
        """EMA weights for eval when available (utils.py:1896-1900)."""
        return self.state.ema_params

    def _render_eval_frame(self, params, rays_o, rays_d, cam_near_far=None,
                           **kw):
        """Eval/test frame render: sharded over the mesh when one exists
        (utils.py:1919-1943's all_gather, done as a shard_map) — including
        feature / mask frames — otherwise fixed-chunk staged inference."""
        shared_cnf = cam_near_far is None or cam_near_far.shape[0] == 1
        if self.mesh is not None and shared_cnf:
            from sanerf_tpu.parallel import dp

            key = (cam_near_far is not None,
                   bool(kw.get("return_feats")), bool(kw.get("return_mask")))
            if self._dp_render is None or self._dp_render[0] != key:
                self._dp_render = (key, dp.make_dp_render(
                    self.model, self.mesh, with_cam_near_far=key[0],
                    return_feats=key[1], return_mask=key[2]))
            return dp.render_frame_dp(
                self.model, self.mesh, self._dp_render[1], params,
                rays_o, rays_d, cam_near_far=cam_near_far)
        return renderer.render_staged(
            self.model, params, rays_o, rays_d,
            cam_near_far=cam_near_far, **kw)

    def evaluate_one_epoch(self, dataset, save_artifacts: bool = True) -> Dict:
        for m in self.metrics:
            m.clear()
        params = self.eval_params()
        out_dir = os.path.join(self.workspace, "validation")
        os.makedirs(out_dir, exist_ok=True)
        for idx in range(len(dataset)):
            frame = dataset.frame(idx)
            out = self._render_eval_frame(
                params, jax.numpy.asarray(frame["rays_o"]),
                jax.numpy.asarray(frame["rays_d"]),
                cam_near_far=_maybe_device(frame.get("cam_near_far")),
            )
            H, W = frame["H"], frame["W"]
            pred = np.asarray(out["image"]).reshape(H, W, 3)
            gt = np.asarray(frame["images"]).reshape(H, W, -1)[..., :3]
            for m in self.metrics:
                m.update(pred, gt)
            if save_artifacts:
                # full per-view artifact dumps — the debugging surface for
                # quality regressions (utils.py:1961-2005 saves pred, gt,
                # error, depth and feature arrays for EVERY val view)
                stem = os.path.join(out_dir, f"ep{self.epoch:04d}_{idx:03d}")
                _save_image(stem + ".png", pred)
                _save_image(stem + "_gt.png", gt)
                err = np.abs(pred - gt).mean(-1)
                _save_image(stem + "_error.png",
                            np.repeat(err[..., None] / max(err.max(), 1e-6), 3, -1))
                depth = np.asarray(out["depth"]).reshape(H, W)
                np.save(stem + "_depth.npy", depth)
                if "samvit" in out:
                    np.save(stem + "_feature.npy", np.asarray(out["samvit"]))
        results = {type(m).__name__: m.measure() for m in self.metrics}
        self.stats["results"].append(results)
        primary = self.metrics[0].measure()
        if self.stats["best_result"] is None or primary > self.stats["best_result"]:
            self.stats["best_result"] = primary
            self.ckpt_mgr.save(
                self.global_step, self.eval_params(), stats=self.stats, best=True,
                full=False,
            )
        self.log(f"[eval epoch {self.epoch}] " + " | ".join(m.report() for m in self.metrics))
        return results

    def test(self, dataset, out_dir: Optional[str] = None, write_video: bool = False,
             return_extra: bool = False):
        """Offline test renders: rgb png + depth npy per frame + pose_dir
        manifest (utils.py:1515-1585); mask models additionally save
        `_mask.npy` + a visualization per `render_mask_type`
        (mask | composition | heatmap, main.py:193-197)."""
        out_dir = out_dir or os.path.join(self.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        params = self.eval_params()
        pose_dir = {}
        frames_rgb = []
        mc = self.cfg.model
        for idx in range(len(dataset)):
            frame = dataset.frame(idx)
            out = self._render_eval_frame(
                params, jax.numpy.asarray(frame["rays_o"]),
                jax.numpy.asarray(frame["rays_d"]),
                cam_near_far=_maybe_device(frame.get("cam_near_far")),
                return_mask=mc.with_mask,
                return_feats=mc.with_sam and return_extra,
            )
            H, W = frame["H"], frame["W"]
            name = frame.get("name", f"{idx:04d}")
            pred = np.asarray(out["image"]).reshape(H, W, 3)
            depth = np.asarray(out["depth"]).reshape(H, W)
            _save_image(os.path.join(out_dir, f"{name}_rgb.png"), pred)
            np.save(os.path.join(out_dir, f"{name}_depth.npy"), depth)
            if mc.with_mask:
                logits = np.asarray(out["instance_mask_logits"]).reshape(H, W, -1)
                np.save(os.path.join(out_dir, f"{name}_mask.npy"), logits)
                _save_image(
                    os.path.join(out_dir, f"{name}_maskvis.png"),
                    render_mask_visualization(
                        pred, logits, self.cfg.render_mask_type,
                        instance_id=self.cfg.render_mask_instance_id,
                    ),
                )
            if mc.with_sam and return_extra and "samvit" in out:
                np.save(os.path.join(out_dir, f"{name}_sam.npy"),
                        np.asarray(out["samvit"]))
            if "pose" in frame:
                pose_dir[name] = np.asarray(frame["pose"]).tolist()
            frames_rgb.append((pred * 255).astype(np.uint8))
        with open(os.path.join(out_dir, "pose_dir.json"), "w") as f:
            json.dump(pose_dir, f)
        if write_video and frames_rgb:
            import imageio

            imageio.mimwrite(
                os.path.join(out_dir, "rgb.mp4"), frames_rgb, fps=24,
                quality=8, macro_block_size=1,
            )
        self.log(f"[test] wrote {len(frames_rgb)} frames to {out_dir}")

    def render_pose(self, pose: np.ndarray, intrinsics: np.ndarray, H: int, W: int,
                    **kwargs) -> Dict[str, np.ndarray]:
        """Single-frame render from an explicit camera (GUI path,
        utils.py:1647-1712 minus the interaction state)."""
        ro, rd = full_frame_rays(
            jax.numpy.asarray(pose), jax.numpy.asarray(intrinsics), H, W
        )
        out = renderer.render_staged(self.model, self.eval_params(), ro, rd, **kwargs)
        return {k: np.asarray(v) for k, v in out.items()}

    # -- checkpoints --------------------------------------------------------

    def save_checkpoint(self, full: bool = True):
        path = self.ckpt_mgr.save(
            self.global_step, self.state.params, self.state.ema_params,
            self.state.opt_state if full else None,
            stats={**self.stats, "epoch": self.epoch}, full=full,
        )
        self.log(f"[ckpt] saved {path}")

    def load_checkpoint(self, mode: str = "latest", model_only: bool = False):
        """Checkpoint restore by mode (utils.py:661-679, 2102-2166).

        `latest_model` (or model_only=True) restores weights/EMA only —
        optimizer state, step and epoch counters start fresh, matching the
        reference's early return in load_checkpoint (utils.py:2130)."""
        model_only = model_only or mode == "latest_model"
        restored = self.ckpt_mgr.load(
            mode, self.state.params, self.state.opt_state, model_only=model_only
        )
        if restored is None:
            if mode not in ("latest", "latest_model", "best"):
                self.log(f"[ckpt] {mode} not found; starting fresh")
            return False
        params, ema, opt_state, meta = restored
        if model_only:
            self.state = self.state._replace(params=params, ema_params=ema)
            self._rereplicate()
            self.log(f"[ckpt] restored model weights only (mode={mode})")
            return True
        self.state = state_lib.TrainState(
            params=params,
            ema_params=ema,
            opt_state=opt_state if opt_state is not None else self.state.opt_state,
            step=jax.numpy.asarray(meta.get("step", 0), jax.numpy.int32),
        )
        self.global_step = int(meta.get("step", 0))
        self.epoch = int(meta.get("stats", {}).get("epoch", 0))
        if meta.get("stats"):
            self.stats.update(meta["stats"])
        self._rereplicate()
        self.log(f"[ckpt] restored step {self.global_step} (mode={mode})")
        return True

    def _rereplicate(self):
        """Keep the train state replicated across the mesh after a restore."""
        if self.mesh is not None:
            from sanerf_tpu.parallel import dp

            self.state = dp.replicate_state(self.state, self.mesh)


def _device_batch(batch: Dict) -> Dict:
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.numpy.asarray(v)
        elif isinstance(v, (int, float)):
            continue  # static metadata (H, W, index) stays host-side
        else:
            out[k] = v
    return out


def _maybe_device(x):
    return None if x is None else jax.numpy.asarray(x)


def render_mask_visualization(rgb: np.ndarray, logits: np.ndarray,
                              mode: str = "heatmap", instance_id: int = 0) -> np.ndarray:
    """Mask visualizations (main.py:193-197 --render_mask_type):
    `mask` = binary argmax mask; `composition` = mask blended over rgb;
    `heatmap` = softmax probability of the chosen instance."""
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    if mode == "mask":
        m = (np.argmax(logits, -1) == instance_id).astype(np.float32)
        return np.repeat(m[..., None], 3, -1)
    if mode == "composition":
        m = np.argmax(logits, -1) == instance_id
        out = rgb.copy()
        out[m] = 0.5 * out[m] + 0.5 * np.array([0.2, 0.5, 1.0], np.float32)
        return out
    # heatmap
    p = probs[..., instance_id]
    heat = np.stack([p, 0.2 * p, 1.0 - p], -1)
    return 0.5 * rgb + 0.5 * heat


def _save_image(path: str, img: np.ndarray):
    import PIL.Image as Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
