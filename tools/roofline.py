"""Roofline / utilization analysis for the flagship lane-major solve.

VERDICT r4 next #5: "publish an updated roofline/utilization analysis for the
42.6k headline ... a number, not an adjective, for the remaining headroom."

Method (runs on the real TPU through the tunnel):
  * build the EXACT headline program (bench.build, lane backend, batch 512,
    robust 14x3+6+4 budget) and AOT-compile it;
  * read XLA's own cost model from ``compiled.cost_analysis()`` — flops and
    bytes accessed of the optimized HLO (post-fusion, the program actually
    dispatched);
  * measure wall device time per iteration (pipelined reps, same protocol as
    bench.bench_solves);
  * compare achieved FLOP/s and bytes/s against TPU v5e peaks
    (bf16 MXU ~197 TFLOP/s, HBM ~819 GB/s — public numbers from the v5e
    spec; the package's f32 matmul-precision policy costs ~3x MXU passes, so
    the honest compute ceiling for this program is ~197/3 ~ 66 TFLOP/s) and
    derive the speed-of-light time per solve batch;
  * report the binding constraint: compute-bound / bandwidth-bound /
    DEPENDENCY-bound (the measured time exceeds both rooflines' floors —
    the program is a serial chain of small fused steps whose latency, not
    throughput, sets the rate).

Prints one JSON object and a short text summary. The STATUS.md utilization
section quotes this output; rerun after solver-shape changes.

Usage:  python tools/roofline.py [--batch 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

# v5e public peaks (How to Scale Your Model / TPU v5e spec)
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9
# the package pins f32 matmul precision (3-pass bf16 decomposition on the
# MXU) — see runtime/__init__ matmul-precision policy
F32_MXU_FACTOR = 3.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n-max", type=int, default=128)
    ap.add_argument("--n-data", type=int, default=64)
    ap.add_argument("--n-safe", type=int, default=5)
    args = ap.parse_args()

    from bench import build

    solve, ssm, x0s, warm = build(args.batch, args.n_max, args.n_data,
                                  args.n_safe, jnp.float32)

    lowered = solve.lower(x0s, warm)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    bytes_acc = float(cost.get("bytes accessed", float("nan")))

    out = compiled(x0s, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = compiled(x0s, warm)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters  # s per batch solve

    solves_per_sec = args.batch / dt
    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    f32_peak = PEAK_BF16_FLOPS / F32_MXU_FACTOR
    sol_compute_s = flops / f32_peak
    sol_bw_s = bytes_acc / PEAK_HBM_BYTES
    sol_s = max(sol_compute_s, sol_bw_s)

    util_flops = achieved_flops / f32_peak
    util_bw = achieved_bw / PEAK_HBM_BYTES
    if util_flops > 0.5:
        binding = "compute-bound"
    elif util_bw > 0.5:
        binding = "bandwidth-bound"
    else:
        binding = "dependency-bound (serial small-step latency)"

    rec = {
        "batch": args.batch,
        "solves_per_sec": round(solves_per_sec, 1),
        "time_per_batch_ms": round(dt * 1e3, 3),
        "hlo_flops_per_batch": flops,
        "hlo_bytes_per_batch": bytes_acc,
        "achieved_tflops": round(achieved_flops / 1e12, 3),
        "achieved_gbps": round(achieved_bw / 1e9, 2),
        "mxu_util_pct_f32peak": round(100 * util_flops, 2),
        "hbm_util_pct": round(100 * util_bw, 2),
        "speed_of_light_ms": round(sol_s * 1e3, 4),
        "headroom_x_vs_sol": round(dt / sol_s, 1) if sol_s > 0 else None,
        "binding_constraint": binding,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    print(
        f"\n{solves_per_sec:,.0f} solves/s  |  {dt*1e3:.2f} ms / batch-{args.batch}\n"
        f"HLO cost: {flops/1e9:.2f} GFLOP, {bytes_acc/1e6:.1f} MB accessed per batch\n"
        f"achieved: {achieved_flops/1e12:.3f} TFLOP/s "
        f"({100*util_flops:.2f}% of the ~{f32_peak/1e12:.0f} TFLOP/s f32 ceiling), "
        f"{achieved_bw/1e9:.1f} GB/s ({100*util_bw:.2f}% of HBM)\n"
        f"speed of light: {sol_s*1e3:.3f} ms "
        f"(compute {sol_compute_s*1e3:.3f} / bw {sol_bw_s*1e3:.3f}) "
        f"-> measured is {dt/sol_s:.0f}x above SOL\n"
        f"binding constraint: {binding}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
