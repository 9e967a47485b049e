"""Hardware parity check for the fused inference kernels.

The interpret-mode parity tests (tests/test_cpgrid.py,
tests/test_vmgrid.py, tests/test_sigma_grid.py) prove the kernel MATH;
this tool proves the MOSAIC LOWERING: it runs `run_rays` with
`cp_fused=True` (fused transposed Pallas kernels incl. the in-kernel
CP/VM/sigma grid blocks) against the XLA reference path on the real
device, at the serving-student shape, and reports max abs error.

Usage: python tools/hw_parity.py [--rays 4096] [--steps 32,24]
Exit code 0 iff every output agrees within the bf16 tolerance.
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sanerf_tpu.config import ModelConfig, RenderConfig
from sanerf_tpu.models import fields, renderer

SHAPES = {
    # the distill_serving student (depth-3 decoder, VMEM-sized tables)
    "serving": dict(mlp_field_depth=3, mlp_cp_rank=96, mlp_cp_res=256,
                    mlp_vm_rank=16, mlp_vm_res=64,
                    mlp_sigma_cp_rank=32, mlp_sigma_cp_res=256),
    # CP-only and multi-level ladders exercise the other kernel blocks
    "cp_ladder": dict(mlp_cp_rank=96, mlp_cp_res=256, mlp_cp_levels=2),
    "vm_ladder": dict(mlp_cp_rank=48, mlp_cp_res=128, mlp_vm_rank=16,
                      mlp_vm_res=64, mlp_vm_levels=2),
    "flagship": dict(),  # plain MLP (no tables) — the tables-off fast path
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--steps", default="32,24")
    ap.add_argument("--tol", type=float, default=3e-2,
                    help="bf16 fused vs f32 XLA tolerance on [0,1] rgb")
    ap.add_argument("--packed", action="store_true",
                    help="also set packed_epilogue on the fast config")
    ap.add_argument("--flatten", action="store_true",
                    help="also set flatten_kernel on the fast config")
    args = ap.parse_args()
    steps = tuple(int(s) for s in args.steps.split(","))

    print(f"device: {jax.devices()[0].device_kind}")
    key = jax.random.key(0)
    o = jnp.zeros((args.rays, 3)) + jnp.array([0.0, 0.0, 2.0])
    d = jax.random.normal(jax.random.key(1), (args.rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    failures = 0
    for name, mc_over in SHAPES.items():
        rc = RenderConfig(num_steps=steps, bound=128.0, contract=True,
                          cp_fused=True, packed_epilogue=args.packed,
                          flatten_kernel=args.flatten)
        rc_slow = dataclasses.replace(rc, use_fused_mlp=False,
                                      cp_fused=False)
        mc = ModelConfig(field_type="mlp", **mc_over)
        model_f = fields.make_model(mc, rc)
        model_s = fields.make_model(mc, rc_slow)
        params = fields.init_params(model_f, key)
        fast = jax.jit(lambda p: renderer.run_rays(model_f, p, o, d))(params)
        slow = jax.jit(lambda p: renderer.run_rays(model_s, p, o, d))(params)
        errs = {}
        for k in ("image", "depth", "weights_sum"):
            a = np.asarray(fast[k], np.float32)
            b = np.asarray(slow[k], np.float32)
            err = float(np.max(np.abs(a - b)))
            if k == "depth":  # depth spans [0, ~bound]; report relative
                err /= max(float(np.max(np.abs(b))), 1e-6)
            errs[k] = err
        ok = all(v <= args.tol for v in errs.values())
        failures += 0 if ok else 1
        print(f"{name:12s} {'OK ' if ok else 'FAIL'} "
              + "  ".join(f"{k}={v:.2e}" for k, v in errs.items()),
              flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
