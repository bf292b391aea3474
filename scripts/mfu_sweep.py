#!/usr/bin/env python
"""MFU / step-time sweep of the compute-heavy bf16 sparse PSD config.

Sweeps batch rows x conv width on the SubM gather-GEMM stack and reports
step time, analytic TFLOP/s, and MFU per point, to locate the knee where
the GEMMs start to dominate the fixed dispatch/memory floor
(docs/PERF_NOTES.md "MFU accounting"). Emits a markdown table.

Usage: python scripts/mfu_sweep.py [--events 4096,16384,65536]
                                   [--widths 64,256,512] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(n_events: int, width: int, n_conv: int, steps: int) -> dict:
    """One sweep point, run inside its own process (a failed point's leaked
    device buffers must not poison the next)."""
    from waveformml_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    from bench import (_chained_train_wps, _sparse_block, _sparse_cfg,
                       _sparse_train_flops, N_SAMPLES, PEAK_TFLOPS)
    from waveformml_tpu.engineering.tasks import LitPSD

    block = _sparse_block(n_events=n_events)
    n_rows = block.coords.shape[0]
    cfg = _sparse_cfg(out_planes=width, n_conv=n_conv, half_precision=1)
    wps, step_s, _ = _chained_train_wps(cfg, LitPSD(cfg), block,
                                        n_warmup=3, n_steps=steps)
    flops = _sparse_train_flops(n_rows, n_events, 2 * N_SAMPLES, width, n_conv)
    flops_exec = _sparse_train_flops(n_rows, n_events, 2 * N_SAMPLES, width,
                                     n_conv, executed=True)
    tflops = flops / step_s / 1e12
    tflops_exec = flops_exec / step_s / 1e12
    return {"events": n_events, "rows": n_rows, "width": width,
            "step_ms": round(step_s * 1e3, 3), "wps": round(wps, 1),
            "tflops": round(tflops, 3),
            "mfu_pct": round(tflops / PEAK_TFLOPS * 100, 3),
            "tflops_exec": round(tflops_exec, 3),
            "mfu_exec_pct": round(tflops_exec / PEAK_TFLOPS * 100, 3)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", default="4096,16384,65536")
    ap.add_argument("--widths", default="64,256,512")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n_conv", type=int, default=4)
    ap.add_argument("--point", default=None,
                    help="internal: run one 'events,width' point and print JSON")
    ap.add_argument("--budget", type=int, default=600,
                    help="seconds per point subprocess")
    args = ap.parse_args()

    if args.point:
        ev, w = (int(s) for s in args.point.split(","))
        print("POINT " + json.dumps(run_point(ev, w, args.n_conv, args.steps)))
        return 0

    import subprocess

    events = [int(s) for s in args.events.split(",")]
    widths = [int(s) for s in args.widths.split(",")]
    print("| events | rows | width | step ms | wf/s | TFLOP/s | MFU | MFU(exec) |")
    print("|---|---|---|---|---|---|---|---|")
    results = []
    for n_events in events:
        for width in widths:
            cmd = [sys.executable, "-u", os.path.abspath(__file__),
                   "--point", f"{n_events},{width}",
                   "--steps", str(args.steps), "--n_conv", str(args.n_conv)]
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.budget)
            except subprocess.TimeoutExpired:
                print(f"| {n_events} | | {width} | TIMEOUT {args.budget}s |",
                      flush=True)
                continue
            point = None
            for line in r.stdout.splitlines():
                if line.startswith("POINT "):
                    point = json.loads(line[6:])
            if point is None:
                err = (r.stderr or "").strip().splitlines()
                tail = err[-1][:90] if err else f"rc={r.returncode}"
                print(f"| {n_events} | — | {width} | FAILED: {tail} "
                      f"| — | — | — | — |", flush=True)
                continue
            print(f"| {point['events']} | {point['rows']} | {point['width']} "
                  f"| {point['step_ms']:.2f} | {point['wps']:,.0f} "
                  f"| {point['tflops']:.2f} | {point['mfu_pct']:.2f}% "
                  f"| {point.get('mfu_exec_pct', 0):.2f}% |",
                  flush=True)
            results.append(point)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "mfu_sweep.json")
    if not results:
        # every point failed (e.g. stalled link): keep the last good sweep
        print("no successful points; leaving mfu_sweep.json untouched",
              file=sys.stderr)
        return 1
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(out)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
