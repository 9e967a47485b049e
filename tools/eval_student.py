"""Held-out fixture PSNR of a serving-student workspace.

Renders the quality-gate's held-out third ring (tools/quality_gate.py
protocol: textured fixture, radius 1.8, 8 views, 128^2) through the
student's own serving path and reports PSNR/SSIM at BOTH the serving
inference hierarchy and the full training hierarchy — the numbers that
decide which student shape ships as the bench asset.

Usage: python tools/eval_student.py /tmp/serving_cponly [more...]
       (each dir needs serving_meta.json + checkpoints/ngp_*.npz)
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def eval_workspace(ws: str, num_steps=None, bf16=True) -> dict:
    from sanerf_tpu.config import ModelConfig, RenderConfig, config_from_dict
    from sanerf_tpu.data.synthetic import SyntheticSphereDataset
    from sanerf_tpu.models import fields, renderer
    from sanerf_tpu.train.checkpoints import CheckpointManager
    from sanerf_tpu.train.metrics import PSNRMeter, SSIMMeter

    with open(os.path.join(ws, "serving_meta.json")) as f:
        meta = json.load(f)
    mc = config_from_dict(ModelConfig, meta["model_config"])
    rc = config_from_dict(RenderConfig, meta["render_config"])
    if num_steps is not None:
        rc = dataclasses.replace(rc, num_steps=tuple(num_steps))
    model = fields.make_model(mc, rc)
    template = fields.init_params(model, jax.random.key(0))
    mgr = CheckpointManager(ws, name="ngp")
    params, ema, _, _ = mgr.load("latest", template, model_only=True)
    params = ema if ema is not None else params
    if bf16:
        params = fields.cast_params(params, jnp.bfloat16)

    ds = SyntheticSphereDataset(H=128, W=128, n_views=8, radius=1.8,
                                scene="textured", training=False)
    psnr, ssim = PSNRMeter(), SSIMMeter()
    for idx in range(len(ds)):
        fr = ds.frame(idx)
        out = renderer.render_staged(
            model, params, jnp.asarray(fr["rays_o"]),
            jnp.asarray(fr["rays_d"]),
            cam_near_far=jnp.asarray(fr["cam_near_far"]))
        img = np.asarray(out["image"], np.float32)
        psnr.update(img, fr["images"])
        ssim.update(img.reshape(128, 128, 3),
                    fr["images"].reshape(128, 128, 3))
    return {"workspace": ws, "num_steps": list(rc.num_steps),
            "psnr": round(float(psnr.measure()), 3),
            "ssim": round(float(ssim.measure()), 4)}


def main(argv=None):
    wss = (argv or sys.argv[1:]) or ["/tmp/serving_student"]
    for ws in wss:
        for steps in ((24, 16), (32, 24), None):
            print(json.dumps(eval_workspace(ws, num_steps=steps)), flush=True)


if __name__ == "__main__":
    main()
