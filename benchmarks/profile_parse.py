"""Parse a jax.profiler Perfetto trace into a device-kernel breakdown.

Usage:
    python benchmarks/profile_parse.py /tmp/xprof   # newest trace within

Round-3 findings from the first successful device profile of one c3
trace.trace call (524k strided rays, 162 ms — the profiler DOES capture
the TPU lane through the axon relay):

    span 162.0 ms, kernel-busy 161.1 ms, GAP 1.0 ms, 93,965 kernels

    duration histogram        count      total
        < 1 us                76,656     22.1 ms   (avg ~0.3 us)
        1-2 us                 6,397      8.8 ms
        2-5 us                 6,015     17.5 ms
        5-20 us                3,606     31.1 ms
        20-100 us              1,117     41.6 ms
        >= 100 us                174     40.0 ms

    by op kind:  fusion x37.5k 45.7 ms | iota_reduce (drain dense MT +
    winner one-hot) x786 40.9 ms | slice_reduce (phase-A slab+lane-any,
    exactly rounds*ADV = 9517) x9.5k 22.4 ms | select_reduce x1.6k
    20.3 ms | copy (while-carry) x14.5k 10.6 ms | ...

MODEL REVISION this forces (BASELINE.md "device-profile addendum"):
the device lane has NO idle gaps — the per-round "serialized link
latency" is not latency at all, it is ~94k kernels of real execution,
and sub-us kernels average ~0.3 us (not the 2-4 us the link model
estimated). Phase A (node stepping: slice_reduce + ~4 small fusions
per step) is ~68 ms = 42% of the frame, drains ~41 ms = 25%. Every
reschedule refutation is re-explained: there is no idle time to
overlap into (probe_chain's K-chains-cost-Kx follows trivially), and
reschedules conserve the kernel count. The levers this opens for
round 4: fewer kernels per adv step (fusion-boundary surgery), and
the 10.6 ms of while-carry copies.
"""

from __future__ import annotations

import collections
import gzip
import json
import re
import sys
from pathlib import Path


def load_events(root: str):
    traces = sorted(Path(root).rglob("*.trace.json.gz"))
    assert traces, f"no *.trace.json.gz under {root}"
    d = json.load(gzip.open(traces[-1]))
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if n and "TPU" in n]
    assert dev, f"no TPU process in {pids}"
    return [e for e in ev if e.get("ph") == "X" and e["pid"] == dev[0]]


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof"
    ev = load_events(root)

    def is_container(n):
        return n.startswith(("while", "jit", "conditional"))

    kern = [e for e in ev if not is_container(e.get("name", ""))]
    t0 = min(e["ts"] for e in ev)
    t1 = max(e["ts"] + e["dur"] for e in ev)
    busy = sum(e["dur"] for e in kern)
    print(json.dumps({
        "span_ms": round((t1 - t0) / 1e3, 2),
        "kernel_busy_ms": round(busy / 1e3, 2),
        "gap_ms": round((t1 - t0 - busy) / 1e3, 2),
        "kernels": len(kern),
    }))

    hist = collections.Counter()
    hdur = collections.Counter()
    for e in kern:
        us = e["dur"]
        b = ("<1us" if us < 1 else "1-2us" if us < 2 else
             "2-5us" if us < 5 else "5-20us" if us < 20 else
             "20-100us" if us < 100 else ">=100us")
        hist[b] += 1
        hdur[b] += us
    for b in ("<1us", "1-2us", "2-5us", "5-20us", "20-100us", ">=100us"):
        print(json.dumps({"bucket": b, "count": hist[b],
                          "ms": round(hdur[b] / 1e3, 2)}))

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in kern:
        kind = re.sub(r"[.\d]+$", "", e["name"])
        agg[kind] += e["dur"]
        cnt[kind] += 1
    # Optional second arg: how many kinds to print (default 15; pass a
    # big number to decompose the census's "other" tail completely).
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    for kind, dur in agg.most_common(top_n):
        print(json.dumps({"kind": kind, "count": cnt[kind],
                          "ms": round(dur / 1e3, 2),
                          "avg_us": round(dur / cnt[kind], 2)}))


if __name__ == "__main__":
    main()
