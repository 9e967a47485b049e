"""A/B the opt-in inference kernels on the interactive frame.

Runs the SAME product loop bench.py times (InteractiveSession.step ->
FramePipeline, 512x512 + SAM decode) once per RenderConfig flag combo and
prints a table of steady-state frame times, so a hardware session can decide
which opt-in kernels (flatten_kernel, packed_epilogue, cp_fused) to promote
to defaults. Each combo builds a fresh session (fresh compile).

Usage: python tools/ab_flags.py [--frames N] [--steps 32,24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")  # repo root

from bench import _build_session, _drive  # noqa: E402

COMBOS = [
    ("baseline", {}, {}),
    ("flatten_kernel", {"flatten_kernel": True}, {}),
    ("packed_epilogue", {"packed_epilogue": True}, {}),
    ("flatten+packed", {"flatten_kernel": True, "packed_epilogue": True}, {}),
    # grid-augmented flagship through the fused kernels (different model —
    # measures the in-kernel CP/VM feature cost, not comparable to baseline)
    ("cp96_fused", {"cp_fused": True},
     {"mlp_cp_rank": 96, "mlp_cp_res": 256}),
    ("cp96+vm16_fused", {"cp_fused": True, "packed_epilogue": True},
     {"mlp_cp_rank": 96, "mlp_cp_res": 256, "mlp_vm_rank": 16,
      "mlp_vm_res": 64}),
    # the serving-student shape tools/distill_serving.py produces from the
    # hi-res quality recipe (depth-3 decoder, VMEM-sized tables incl. a
    # direct-density sigma grid) — its fps is the quality family's
    # interactive number
    ("serving_grids", {"cp_fused": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 96, "mlp_cp_res": 256,
      "mlp_vm_rank": 16, "mlp_vm_res": 64,
      "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256}),
    # student-shape frontier: CP-only variants dodge the VM plane cost
    ("serving_cponly", {"cp_fused": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 96, "mlp_cp_res": 256,
      "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256}),
    ("serving_cp512", {"cp_fused": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 128, "mlp_cp_res": 512,
      "mlp_cp_levels": 2, "mlp_sigma_cp_rank": 32,
      "mlp_sigma_cp_res": 512}),
    # round-5: the opt-in kernels ON TOP of the actual served shape (the
    # CP-only student bench.py serves) — the 30 fps attack surface
    ("serving+packed", {"cp_fused": True, "packed_epilogue": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 96, "mlp_cp_res": 256,
      "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256}),
    ("serving+flatten", {"cp_fused": True, "flatten_kernel": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 96, "mlp_cp_res": 256,
      "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256}),
    ("serving+pk+fl", {"cp_fused": True, "packed_epilogue": True,
                       "flatten_kernel": True},
     {"mlp_field_depth": 3, "mlp_cp_rank": 96, "mlp_cp_res": 256,
      "mlp_sigma_cp_rank": 32, "mlp_sigma_cp_res": 256}),
    # T=24 block retune (the 4096/16384 defaults were tuned at T=32)
    ("block2048", {"fused_block": 2048}, {}),
    ("block8192", {"fused_block": 8192}, {}),
    ("propblock8192", {"fused_prop_block": 8192}, {}),
    ("propblock32768", {"fused_prop_block": 32768}, {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--steps", default="32,24")
    ap.add_argument("--size", type=int, default=512,
                    help="render resolution (small for CPU smoke tests)")
    ap.add_argument("--combos", default=None,
                    help="comma list of combo names (default: all)")
    args = ap.parse_args()
    steps = tuple(int(s) for s in args.steps.split(","))
    want = None if args.combos is None else set(args.combos.split(","))

    rows = []
    for name, rc_over, mc_over in COMBOS:
        if want is not None and name not in want:
            continue
        t0 = time.time()
        try:
            # use_asset=False: A/B measures SHAPES with random params — the
            # committed serving asset must not leak its config into combos
            sess, _ = _build_session(steps, rc_over, mc_over, size=args.size,
                                     use_asset=False)
            dt, compile_s = _drive(sess, n_frames=args.frames)
            rows.append((name, dt * 1000, compile_s))
            print(f"{name:20s} {dt*1000:8.1f} ms/frame  "
                  f"({1.0/dt:5.2f} fps, compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # Mosaic rejections are a finding, not a crash
            rows.append((name, None, time.time() - t0))
            msg = str(e).splitlines()[0][:160]
            print(f"{name:20s} FAILED: {type(e).__name__}: {msg}", flush=True)

    print("\n== ab_flags summary ==")
    base = next((r[1] for r in rows if r[0] == "baseline" and r[1]), None)
    for name, ms, _ in rows:
        if ms is None:
            print(f"  {name:20s} FAILED")
        elif base and name != "baseline":
            print(f"  {name:20s} {ms:7.1f} ms  ({ms - base:+.1f} ms vs baseline)")
        else:
            print(f"  {name:20s} {ms:7.1f} ms")


if __name__ == "__main__":
    main()
