"""Regression-gate behavior (round-3 VERDICT item 8).

The gate must (a) trip on a genuine 20% slowdown, (b) NOT trip on the
measured ±35% relay noise pattern that broke the round-2 best-of-3 gate
(the 1786940609 sweep: one noisy-low pass vs an all-time-best record).
Pure-host logic — no device work.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from bench_render import gate_failures  # noqa: E402


def rec(name, ts, median, backend="tpu"):
    return {"name": name, "backend": backend, "ts": ts,
            "mrays_per_s": median * 1.15, "mrays_median": median}


def test_trips_on_20pct_slowdown():
    history = [rec("c3-mesh", t, 5.6) for t in range(5)]
    now = rec("c3-mesh", 10, 5.6 * 0.8)
    assert gate_failures([now], history + [now])


def test_passes_on_relay_noise():
    # medians of healthy runs scatter ~±10%; one all-time-best outlier in
    # history must not gate later normal runs (the round-2 failure mode)
    history = [rec("c3-mesh", 0, 5.2), rec("c3-mesh", 1, 5.9),
               rec("c3-mesh", 2, 7.4),   # lucky outlier
               rec("c3-mesh", 3, 5.4), rec("c3-mesh", 4, 5.7)]
    now = rec("c3-mesh", 10, 5.3)
    assert gate_failures([now], history + [now]) == []


def test_first_record_never_gates():
    now = rec("c9-new", 10, 1.0)
    assert gate_failures([now], [now]) == []


def test_backend_isolation():
    history = [rec("c3-mesh", t, 50.0, backend="cpu") for t in range(5)]
    now = rec("c3-mesh", 10, 5.6)  # tpu record, cpu history is faster
    assert gate_failures([now], history + [now]) == []


def test_falls_back_to_best_for_old_records():
    old = {"name": "c3-mesh", "backend": "tpu", "ts": 0,
           "mrays_per_s": 5.6}  # pre-round-3: no mrays_median
    now = rec("c3-mesh", 10, 4.0)
    assert gate_failures([now], [old, now])
