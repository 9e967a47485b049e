"""Interactive viewer: orbit camera + live segmentation (+ live training).

Rebuild of nerf/gui.py (NeRFGUI + OrbitCamera): a dearpygui window over the
headless `InteractiveSession`. The two adaptive controllers the reference
ships as product features (SURVEY.md §5 tracing row) are here:

- dynamic train-steps targeting 500 ms per GUI frame (gui.py:127-131);
- dynamic render downscale targeting 200 ms per frame (gui.py:164-169).

dearpygui is optional (absent in headless/TPU pods); `HeadlessViewer` runs
the identical loop without a display (used by tests and the bench), and
`launch_gui` picks whichever is available.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from sanerf_tpu.config import Config
from sanerf_tpu.apps.interactive import InteractiveSession
from sanerf_tpu.utils.camera import OrbitCamera


class AdaptiveController:
    """Reference feedback controllers (gui.py:127-131, 164-169)."""

    def __init__(self, target_train_ms: float = 500.0, target_render_ms: float = 200.0):
        self.target_train_ms = target_train_ms
        self.target_render_ms = target_render_ms
        self.train_steps = 16
        self.downscale = 1

    def update_train_steps(self, elapsed_ms: float):
        full_t = elapsed_ms / max(self.train_steps, 1)
        train_steps = min(16, max(4, int(16 * self.target_train_ms / max(
            full_t * 16, 1e-3))))
        if train_steps > self.train_steps * 1.2 or train_steps < self.train_steps * 0.8:
            self.train_steps = train_steps

    def update_downscale(self, elapsed_ms: float):
        full_render_ms = elapsed_ms * self.downscale**2
        downscale = min(8, max(1, int(np.sqrt(
            full_render_ms / self.target_render_ms))))
        if downscale != self.downscale:
            self.downscale = downscale


class HeadlessViewer:
    """The GUI loop without a window: orbit camera state, frame timing, FPS
    readout, adaptive downscale, live train stepping."""

    def __init__(self, cfg: Config, session: InteractiveSession,
                 trainer=None, train_dataset=None):
        self.cfg = cfg
        self.session = session
        self.trainer = trainer
        self.train_dataset = train_dataset
        self.camera = OrbitCamera(session.W, session.H, r=2.0, fovy=60.0)
        self.ctrl = AdaptiveController()
        self.training = trainer is not None and train_dataset is not None
        self.fps = 0.0
        # GUI-editable render state (gui.py:185-435 control panel)
        b = float(session.model.render_cfg.grid_bound)
        self.aabb = np.asarray([-b, -b, -b, b, b, b], np.float32)
        self.bg_color = 1.0
        self.mode = "image"  # 'image' | 'depth'
        self.max_spp = int(getattr(cfg, "max_spp", 1) or 1)
        self.spp = 0
        self._need_update = True

    def mark_dirty(self):
        """Camera/state changed: restart spp accumulation."""
        self._need_update = True
        self.spp = 0

    def start_training(self):
        self.training = (self.trainer is not None
                         and self.train_dataset is not None)

    def stop_training(self):
        self.training = False

    def save_checkpoint(self):
        if self.trainer is not None:
            self.trainer.save_checkpoint(full=True)

    def frame(self, click=None):
        t0 = time.time()
        # reference loop gate (gui.py:143-145): once spp hit max_spp and
        # nothing changed, skip re-rendering entirely
        if (not self._need_update and not self.training and click is None
                and 1 < self.max_spp <= self.spp
                and getattr(self, "_last_result", None) is not None):
            return self._last_result
        if self.training:
            tt0 = time.time()
            for _ in range(self.ctrl.train_steps):
                batch = self.train_dataset.collate_train(
                    self.trainer.rng, self.cfg.train.num_rays
                )
                from sanerf_tpu.train.trainer import _device_batch

                self.trainer.global_step += 1
                self.trainer.state, _ = self.trainer._train_step(
                    self.trainer.state, _device_batch(batch),
                    self.trainer._next_key(),
                )
            self.ctrl.update_train_steps((time.time() - tt0) * 1e3)
            self.session.params = self.trainer.eval_params()
        # spp accumulation (gui.py:185-190): while the camera is static,
        # keep averaging perturbed renders up to max_spp — the running mean
        # lives ON DEVICE inside `_frame_program` (acc buffer); the host
        # only counts frames and supplies a fresh jitter key per sample
        accumulate = (not self._need_update and not self.training
                      and click is None and self.max_spp > 1
                      and self.spp < self.max_spp)
        key = None
        spp = 0
        if accumulate and self.spp > 0:
            import jax

            key = jax.random.key(self.spp)
            spp = self.spp
        result = self.session.step(
            self.camera.pose, self.camera.intrinsics, click=click,
            downscale=self.ctrl.downscale, aabb=self.aabb,
            bg_color=self.bg_color, mode=self.mode, key=key, spp=spp,
        )
        if self.max_spp > 1:
            self.spp = self.spp + 1 if accumulate else 1
        self._need_update = False
        self._last_result = result
        dt_ms = (time.time() - t0) * 1e3
        self.ctrl.update_downscale(dt_ms)
        self.fps = 1000.0 / max(dt_ms, 1e-3)
        return result

    # input handlers mirroring gui.py:398-416
    def orbit(self, dx, dy):
        self.camera.orbit(dx, dy)
        self.mark_dirty()

    def zoom(self, delta):
        self.camera.scale(delta)
        self.mark_dirty()

    def pan(self, dx, dy):
        self.camera.pan(dx, dy)
        self.mark_dirty()

    def right_click(self, x, y):
        """Right click = add/remove segmentation point (gui.py:398-416)."""
        return self.frame(click=(x, y))


def launch_gui(cfg: Config, trainer, sam_predictor=None, train_dataset=None):
    """Start dearpygui if available, else an interactive-less spin of the
    headless loop (renders a few frames and saves them)."""
    session = InteractiveSession(
        cfg, trainer.model, trainer.eval_params(), sam_predictor,
        H=512, W=512,
        mesh=trainer.mesh,  # --n_devices > 1: frames render ray-sharded
    )
    try:
        import dearpygui.dearpygui as dpg  # noqa: F401

        return _run_dearpygui(cfg, session, trainer, train_dataset)
    except ImportError:
        print("[WARN] dearpygui unavailable; running headless viewer (10 frames)")
        viewer = HeadlessViewer(cfg, session, trainer if train_dataset else None,
                                train_dataset)
        import os

        out_dir = f"{cfg.workspace}/gui_frames"
        os.makedirs(out_dir, exist_ok=True)
        for i in range(10):
            viewer.orbit(30, 0)
            res = viewer.frame()
            import PIL.Image as Image

            Image.fromarray(res.rgb_u8).save(f"{out_dir}/frame_{i:03d}.png")
        print(f"[INFO] headless frames written to {out_dir}; fps~{viewer.fps:.1f}")
        return viewer


def _run_dearpygui(cfg: Config, session: InteractiveSession, trainer,
                   train_dataset):
    """The windowed loop (texture window + control panel + handlers),
    mirroring gui.py:185-445."""
    import dearpygui.dearpygui as dpg

    viewer = HeadlessViewer(cfg, session, trainer if train_dataset else None,
                            train_dataset)
    W, H = session.W, session.H
    buffer = np.ones((H, W, 3), np.float32)

    dpg.create_context()
    with dpg.texture_registry():
        dpg.add_raw_texture(W, H, buffer.ravel(), format=dpg.mvFormat_Float_rgb,
                            tag="_texture")
    with dpg.window(tag="_primary", width=W, height=H):
        dpg.add_image("_texture")
    def set_fovy(s, v):
        viewer.camera.fovy = v
        viewer.mark_dirty()

    def set_mode(s, v):
        viewer.mode = v
        viewer.mark_dirty()

    def set_bg(s, v):
        viewer.bg_color = float(np.mean(v[:3]))
        viewer.mark_dirty()

    def set_aabb(axis):
        def cb(s, v):
            viewer.aabb[axis] = v
            viewer.mark_dirty()
        return cb

    b = float(session.model.render_cfg.grid_bound)
    with dpg.window(label="Control", width=320, height=H, pos=(W, 0)):
        dpg.add_text("", tag="_fps")
        dpg.add_slider_float(label="fovy", default_value=60, min_value=30,
                             max_value=120, callback=set_fovy)
        # display mode + background (gui.py:252-275)
        dpg.add_radio_button(("image", "depth"), default_value="image",
                             horizontal=True, callback=set_mode)
        dpg.add_color_edit((255, 255, 255), label="bg color",
                           no_alpha=True, callback=set_bg)
        # live inference-AABB sliders (gui.py:317-320 -> renderer runtime
        # aabb argument)
        with dpg.collapsing_header(label="AABB", default_open=False):
            for i, name in enumerate(("xmin", "ymin", "zmin",
                                      "xmax", "ymax", "zmax")):
                lo, hi = (-b, b)
                dpg.add_slider_float(label=name, min_value=lo, max_value=hi,
                                     default_value=float(viewer.aabb[i]),
                                     callback=set_aabb(i))
        # train start/stop + checkpoint save (gui.py:226-250)
        if trainer is not None and train_dataset is not None:
            with dpg.group(horizontal=True):
                dpg.add_button(label="start train",
                               callback=lambda: viewer.start_training())
                dpg.add_button(label="stop train",
                               callback=lambda: viewer.stop_training())
                dpg.add_button(label="save ckpt",
                               callback=lambda: viewer.save_checkpoint())

    def on_drag(sender, app_data):
        if dpg.is_item_focused("_primary"):
            viewer.orbit(app_data[1], app_data[2])

    def on_pan(sender, app_data):
        # middle-drag pan (gui.py:417-427)
        if dpg.is_item_focused("_primary"):
            viewer.pan(app_data[1], app_data[2])

    def on_wheel(sender, app_data):
        viewer.zoom(app_data)

    def on_right_click(sender, app_data):
        x, y = dpg.get_mouse_pos()
        viewer.right_click(x, y)

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left, callback=on_drag)
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                   callback=on_pan)
        dpg.add_mouse_wheel_handler(callback=on_wheel)
        dpg.add_mouse_click_handler(button=dpg.mvMouseButton_Right,
                                    callback=on_right_click)

    dpg.create_viewport(title="sanerf_tpu", width=W + 300, height=H)
    dpg.setup_dearpygui()
    dpg.show_viewport()
    while dpg.is_dearpygui_running():
        res = viewer.frame()
        buffer[:] = np.clip(res.composed, 0, 1)
        dpg.set_value("_texture", buffer.ravel())
        dpg.set_value("_fps", f"{viewer.fps:.1f} FPS | downscale "
                      f"{viewer.ctrl.downscale} | spp {viewer.spp}")
        dpg.render_dearpygui_frame()
    dpg.destroy_context()
    return viewer
