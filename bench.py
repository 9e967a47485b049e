"""Headline benchmark: interactive fps AND held-out quality of ONE artifact.

Measures the reference's north-star workload (readme.md:5, SURVEY.md §3.3):
one interactive frame = 512x512 RGB render + low-res (32x32) SAM-feature
render + 3D-point reprojection + SAM prompt-decoder mask + overlay.
Reference: 5 FPS on a V100 — and the model the reference serves IS the
model it trains (nerf/gui.py renders the trained NeRFNetwork directly).

This bench holds itself to the same standard: the primary model is the
TRAINED serving artifact committed at assets/serving_student.* — the
quality-recipe teacher (scripts/train_rgb_grids.sh, 20k iters on-chip)
distilled by tools/distill_serving.py into a VMEM-sized fused-path
student — and the SAME params produce both reported numbers:
  - value (fps): double-buffered steady-state throughput of the product
    loop (`InteractiveSession.step` -> `FramePipeline`, exactly what the
    GUI runs);
  - psnr_db: held-out-ring PSNR of those params on the textured fixture
    (data/synthetic.py, the third-ring protocol of tools/quality_gate.py),
    rendered through the same serving path (bf16, fused kernels, the
    quality-gated inference hierarchy);
  - latency_ms: click-to-pixels latency of a SYNC frame;
  - full_hierarchy_fps: the loop at the reference's full (128, 64, 32)
    sampling hierarchy (apples-to-apples vs the V100's 5 fps).
The SAM head weights are random — no SAM checkpoint ships in this
environment — which moves no measured number: decode cost is
weight-independent and psnr_db scores the RGB render.

If the asset is missing (fresh clone before the first hardware round),
falls back to the randomly initialized flagship and reports psnr_db=null.

Prints ONE JSON line:
  {"metric": "interactive_fps_512", "value": N, "unit": "fps",
   "vs_baseline": N/5, "psnr_db": Q, "latency_ms": L,
   "full_hierarchy_fps": F}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 5.0  # V100, readme.md:5
ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "assets", "serving_student")


def _load_asset():
    """-> (model_cfg, render_cfg, flat_params) or None."""
    import dataclasses

    if not (os.path.exists(ASSET + ".json")
            and os.path.exists(ASSET + ".npz")):
        return None
    from sanerf_tpu.config import ModelConfig, RenderConfig, config_from_dict

    with open(ASSET + ".json") as f:
        meta = json.load(f)
    mc = config_from_dict(ModelConfig, meta["model_config"])
    rc = config_from_dict(RenderConfig, meta["render_config"])
    # the interactive loop serves SAM features too; the student checkpoint
    # is RGB-trained, so the feature head initializes randomly (see module
    # docstring — affects neither fps nor psnr_db)
    mc = dataclasses.replace(mc, with_sam=True, sam_use_view_direction=True)
    flat = dict(np.load(ASSET + ".npz"))
    return mc, rc, flat


def _asset_params(model, flat):
    """Init the (with_sam-extended) param tree, then overlay every asset
    entry; asserts the RGB field params ALL transferred (a renamed field
    param fails loudly). Keys outside the `params/` namespace (`ema/`
    shadows, `__meta__`) ride the npz for provenance and are expected to
    stay unmapped; the random-init SAM head lives only in the template."""
    import jax

    from sanerf_tpu.models import fields
    from sanerf_tpu.train.checkpoints import flatten_tree, unflatten_like

    params = fields.init_params(model, jax.random.key(0))
    tmpl = flatten_tree(params, "")
    unmapped = []
    for k, v in flat.items():
        if not k.startswith("params/"):
            continue
        k2 = k[len("params/"):]
        if k2 in tmpl and tmpl[k2].shape == v.shape:
            tmpl[k2] = v
        else:
            unmapped.append(k)
    assert not unmapped, (
        f"asset params failed to map onto the serving model: {unmapped}")
    return unflatten_like(params, tmpl, "")


def _build_session(num_steps, rc_overrides=None, mc_overrides=None, size=512,
                   use_asset=True):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sanerf_tpu.apps.interactive import InteractiveSession
    from sanerf_tpu.config import Config, ModelConfig, RenderConfig
    from sanerf_tpu.models import fields
    from sanerf_tpu.models.sam import SamConfig, SamPredictor
    from sanerf_tpu.models.sam import predictor as sam_predictor_mod

    asset = _load_asset() if use_asset else None
    if asset is not None:
        mc, rc, flat = asset
        rc = dataclasses.replace(rc, num_steps=num_steps,
                                 max_ray_batch=size * size)
    else:
        rc = RenderConfig(num_steps=num_steps, bound=128.0, contract=True,
                          max_ray_batch=size * size)
        mc = ModelConfig(field_type="mlp", with_sam=True,
                         sam_use_view_direction=True)
    if rc_overrides:
        rc = dataclasses.replace(rc, **rc_overrides)
    if mc_overrides:
        mc = dataclasses.replace(mc, **mc_overrides)
    model = fields.make_model(mc, rc)
    if asset is not None:
        params = _asset_params(model, flat)
    else:
        params = fields.init_params(model, jax.random.key(0))
    params = fields.cast_params(params, jnp.bfloat16)  # bf16 inference path

    # SAM prompt decoder (randomly initialized — decode cost is
    # weight-independent), bf16 like production inference
    sam_cfg = SamConfig()
    sam_params = sam_predictor_mod.init_params(sam_cfg, jax.random.key(1))
    # drop the unused ViT-H encoder (641M params) — the interactive loop
    # only runs the prompt encoder + mask decoder on rendered features
    sam_params["image_encoder"] = jax.tree.map(
        lambda x: x[:0] if hasattr(x, "shape") and x.ndim else x,
        sam_params["image_encoder"],
    )
    sam_params = fields.cast_params(sam_params, jnp.bfloat16)
    sam = SamPredictor(sam_cfg, sam_params)
    session = InteractiveSession(Config(), model, params, sam, H=size, W=size)
    session._bench_model = model
    session._bench_params = params
    return session, asset is not None


def _eval_psnr(session) -> float:
    """Held-out-ring PSNR of the benched params through the benched
    serving path (third-ring protocol of tools/quality_gate.py)."""
    import jax.numpy as jnp

    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import renderer
    from sanerf_tpu.train.metrics import PSNRMeter

    smoke = bool(os.environ.get("BENCH_SMOKE"))
    hh, n_views = (64, 2) if smoke else (128, 8)
    ds = SyntheticSphereDataset(H=hh, W=hh, n_views=n_views, radius=1.8,
                                scene="textured", training=False)
    meter = PSNRMeter()
    for idx in range(len(ds)):
        fr = ds.frame(idx)
        out = renderer.render_staged(
            session._bench_model, session._bench_params,
            jnp.asarray(fr["rays_o"]), jnp.asarray(fr["rays_d"]),
            cam_near_far=jnp.asarray(fr["cam_near_far"]))
        meter.update(np.asarray(out["image"], np.float32), fr["images"])
    return float(meter.measure())


def _eval_mask_miou(num_steps) -> "float | None":
    """Interactive-segmentation quality of the served artifact: held-out
    mIoU of the stage-3 mask head trained ON the serving student
    (tools/mask_asset.py -> assets/serving_student_mask.*), rendered
    through the serving path at the benched inference hierarchy.
    Reference workload: the mask branch, nerf/utils.py:941-1070; eval
    protocol evaluation.py:133-154."""
    import dataclasses

    mask_asset = ASSET + "_mask"
    if not (os.path.exists(mask_asset + ".npz")
            and os.path.exists(ASSET + ".npz")):
        return None
    import jax
    import jax.numpy as jnp

    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields, renderer
    from sanerf_tpu.train.checkpoints import flatten_tree, unflatten_like
    from sanerf_tpu.train.metrics import MeanIoUMeter

    mc, rc, flat = _load_asset()
    with open(mask_asset + ".json") as f:
        mmeta = json.load(f)
    rc = dataclasses.replace(rc, num_steps=num_steps, max_ray_batch=128 * 128)
    mc = dataclasses.replace(mc, with_sam=False, with_mask=True,
                             mask_mlp_type=mmeta["mask_mlp_type"],
                             n_inst=mmeta["n_inst"])
    model = fields.make_model(mc, rc)
    params = fields.init_params(model, jax.random.key(0))
    tmpl = flatten_tree(params, "")
    for src in (flat, dict(np.load(mask_asset + ".npz"))):
        for k, v in src.items():
            if k.startswith("params/"):
                k2 = k[len("params/"):]
                if k2 in tmpl and tmpl[k2].shape == v.shape:
                    tmpl[k2] = v
    params = fields.cast_params(unflatten_like(params, tmpl, ""),
                                jnp.bfloat16)
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    hh, n_views = (64, 2) if smoke else (128, 8)
    ds = SyntheticSphereDataset(H=hh, W=hh, n_views=n_views, radius=1.8,
                                scene="textured", training=False)
    meter = MeanIoUMeter()
    for idx in range(len(ds)):
        fr = ds.frame(idx)
        out = renderer.render_staged(
            model, params, jnp.asarray(fr["rays_o"]),
            jnp.asarray(fr["rays_d"]), return_mask=True,
            cam_near_far=jnp.asarray(fr["cam_near_far"]))
        pred = np.asarray(jnp.argmax(out["instance_mask_logits"], -1))
        meter.update(pred, fr["masks"])
    return float(meter.measure())


def _drive(session, n_frames=7, sync=False):
    """Time steady-state frames through the product loop (one click set)."""
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    intr = session.intrinsics_for(pose)

    def frame():
        return session.step(pose, intr, pipelined=not sync)

    # warm-up / compile; then place one prompt point (the reference's
    # interactive workload always has an active prompt)
    t0 = time.time()
    frame()
    compile_s = time.time() - t0
    if not session.points_3d:
        session.points_3d.append(np.zeros(3, np.float32))
    frame()  # second warm frame (relay variance)
    times = []
    for _ in range(n_frames):
        t0 = time.time()
        frame()
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # BENCH_SMOKE=1: tiny-shape CPU wiring check of the FULL bench path
    # (asset load + psnr + mask miou + probes) without chip-scale compiles
    smoke = bool(os.environ.get("BENCH_SMOKE"))
    size = 64 if smoke else 512

    # primary: quality-gated reduced inference hierarchy, measured on the
    # trained artifact itself. Round 5's serving-hierarchy finetune
    # (tools/serve_finetune.py, 1500 iters AT (32, 16)) removed the
    # sampling-sparsity tax: the asset scores 21.21 dB held-out at
    # (32, 16) — up from 18.88 before the finetune — and 21.39 at the
    # full (128, 64, 32) hierarchy (also improved), so the fastest swept
    # hierarchy now clears the >= 19 dB bar with 2.2 dB of margin and
    # (32, 16) serves (tools/hsweep.py round 5: ~44-48 ms device vs
    # 50 ms at the previous (32, 24)).
    session, has_asset = _build_session((32, 16), size=size)
    dt, compile_s = _drive(session, n_frames=2 if smoke else 7)
    fps = 1.0 / dt
    lat, _ = _drive(session, n_frames=2 if smoke else 5, sync=True)
    # split the sync latency into device compute vs tunnel (VERDICT r4
    # item 3: the relay's RTT swings 27-90 ms between sessions with no
    # code change; the device number is the stable product evidence)
    from tools.relay_probe import probe_device_frame, probe_rtt

    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, 2.0], [0, 0, 0, 1]], np.float32)
    rtt_ms = probe_rtt()
    device_ms = probe_device_frame(session, pose,
                                   session.intrinsics_for(pose),
                                   n=4 if smoke else 16)
    psnr = _eval_psnr(session) if has_asset else None
    miou = _eval_mask_miou((32, 16)) if has_asset else None

    # apples-to-apples: the reference's full sampling hierarchy
    session_full, _ = _build_session((128, 64, 32), size=size)
    dt_full, _ = _drive(session_full, n_frames=2 if smoke else 5)
    fps_full = 1.0 / dt_full

    result = {
        "metric": "interactive_fps_512",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "psnr_db": None if psnr is None else round(psnr, 2),
        "latency_ms": round(lat * 1000, 1),
        "latency_device_ms": round(device_ms, 1),
        "device_fps": round(1000.0 / max(device_ms, 1e-9), 2),
        "relay_rtt_ms": round(rtt_ms, 1),
        "mask_miou": None if miou is None else round(miou, 3),
        "full_hierarchy_fps": round(fps_full, 3),
    }
    print(json.dumps(result))
    print(
        f"# artifact: {'assets/serving_student (trained)' if has_asset else 'random-init flagship (no asset)'} | "
        f"median frame {dt*1000:.0f} ms (sync latency {lat*1000:.0f} ms wall"
        f" = {device_ms:.0f} ms device + tunnel, rtt {rtt_ms:.0f} ms; "
        f"full hierarchy {dt_full*1000:.0f} ms) | compile {compile_s:.0f} s | "
        f"device {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
