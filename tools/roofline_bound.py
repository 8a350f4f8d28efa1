#!/usr/bin/env python
"""Per-op attainable-bound analysis of a captured device trace.

For every XLA op in a jax.profiler trace (as captured by
tools/profile_model.py --trace-dir), computes the op's speed-of-light
bound on the local chip:

    bound_ms = max(model_flops / peak_flops, bytes_accessed / peak_hbm_bw)

and compares it with the measured device time. The summed bounds are the
*attainable* latency of the compiled graph as scheduled (no fusion
changes), so "stage X is at Y% of peak" becomes a per-op checkable claim:
an op near its own bound cannot be made faster without changing what XLA
materializes; the optimization candidates are exactly the ops with low
bound/actual efficiency.

  python tools/profile_model.py --trace-dir /tmp/t ...   # capture
  python tools/roofline_bound.py /tmp/t --runs 3 [--top 20]

Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); model_flops in
the trace already accounts dtype, so f32 convs would need --peak-tflops.
"""

import argparse
import glob
import gzip
import json
from collections import defaultdict

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from centermask2_tpu.utils.trace_sections import section_of  # noqa: E402


def load_ops(trace_dir: str):
    f = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    op_tids = {e["tid"] for e in data["traceEvents"]
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("pid") == 3 and e["args"]["name"] == "XLA Ops"}
    return [e for e in data["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") == 3 and "dur" in e
            and e.get("tid") in op_tids
            and not e["name"].startswith("jit_")]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--runs", type=int, default=1,
                   help="fn invocations inside the trace window")
    p.add_argument("--top", type=int, default=20,
                   help="worst headroom ops to list")
    p.add_argument("--peak-tflops", type=float, default=197.0)
    p.add_argument("--peak-gbps", type=float, default=819.0)
    args = p.parse_args()

    per_op = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, ""])
    for e in load_ops(args.trace_dir):
        a = e.get("args") or {}
        rec = per_op[e["name"]]
        rec[0] += e["dur"] / 1000.0  # actual ms (summed over runs)
        rec[1] += float(a.get("model_flops") or 0)
        rec[2] += float(a.get("bytes_accessed") or 0)
        rec[4] = a.get("tf_op", "")

    rows = []
    for name, (ms, flops, byts, _, tf_op) in per_op.items():
        ms /= args.runs
        flops /= args.runs
        byts /= args.runs
        mxu = flops / (args.peak_tflops * 1e9)  # ms
        hbm = byts / (args.peak_gbps * 1e6)  # ms
        rows.append((name, tf_op, ms, mxu, hbm, max(mxu, hbm)))

    total = sum(r[2] for r in rows)
    total_bound = sum(r[5] for r in rows)
    print(f"device total: {total:.2f} ms   attainable bound: "
          f"{total_bound:.2f} ms   headroom: {total - total_bound:.2f} ms "
          f"({(total - total_bound) / total * 100:.0f}%)")

    print("\nper section (ms):")
    print(f"{'section':>20} {'actual':>7} {'bound':>7} {'mxu':>6} "
          f"{'hbm':>6} {'eff%':>5}")
    sec = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    for name, tf_op, ms, mxu, hbm, bound in rows:
        s = sec[section_of(tf_op)]
        s[0] += ms
        s[1] += bound
        s[2] += mxu
        s[3] += hbm
    for k, (ms, bound, mxu, hbm) in sorted(sec.items(),
                                           key=lambda kv: -kv[1][0]):
        print(f"{k:>20} {ms:7.3f} {bound:7.3f} {mxu:6.3f} {hbm:6.3f} "
              f"{bound / ms * 100 if ms else 0:5.0f}")

    print(f"\nworst headroom ops (actual - bound, top {args.top}):")
    print(f"{'ms':>7} {'bound':>6} {'flop%':>5} {'hbm%':>5}  op")
    for name, tf_op, ms, mxu, hbm, bound in sorted(
            rows, key=lambda r: -(r[2] - r[5]))[:args.top]:
        print(f"{ms:7.3f} {bound:6.3f} {mxu / ms * 100 if ms else 0:5.0f} "
              f"{hbm / ms * 100 if ms else 0:5.0f}  {name[:36]} "
              f"{tf_op.split('jit(<lambda>)/')[-1][:70]}")


if __name__ == "__main__":
    main()
