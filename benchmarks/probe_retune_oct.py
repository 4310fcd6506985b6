"""Traversal-schedule retune for the octant tree (round-5 VERDICT item 2).

Every schedule knob (ADV_STEPS=8, DRAIN_N=(4,2,1), MC_PACKETS=64,
BOUNCE_STAGE_MAX=4) was gridded in rounds 2-3 on the PRE-octant tree;
octant (OCT_ENABLE=True since round 4) changed the walk itself
(primaries 24->17 rounds, node visits 3904->2784), so the joint optimum
may have moved.

Protocol — END TO END, not isolated. This probe was first drafted
around device_time_fused on isolated bounce workloads; that protocol is
exactly what the repo's own history discredits (PACKET_LEAF_N and the
slim-carry epilogue both won isolated and lost the full frame, and
probe_hostchain quarantined the fused-vs-chained disagreement at
sub-10 ms nested-while granularity). Each grid point is therefore ONE
subprocess of quick_tpu.py on the c3 CONTRACT workload (128 spp,
~35 s/pass — the bench.py statistic itself), knobs injected via env
(TPURT_ADV / TPURT_STAGEMAX / TPURT_DRAIN / TPURT_MC; module globals
are read at trace time, so a fresh process per point keeps jit caches
honest). The law predicts flatness; we test for a MOVED optimum, and
any point beating baseline re-runs before belief (CLAUDE.md protocol).

RESULTS (2026-08-19, c3 CONTRACT 128 spp, one process per point,
Mrays/s):

    baseline (ADV=8, STAGE=4, DRAIN=4,2,1, MC=64)   8.281
    ADV=6                                           8.347  (+0.8%)
    ADV=10                                          7.878  (-4.9%)
    STAGE=3                                         8.296  (tie)
    STAGE=5                                         8.204  (-0.9%)
    DRAIN=8,4,2                                     7.306  (-11.8%)
    MC=32                                           8.282  (tie)
    MC=128                                          8.286  (tie)

Confirmation (interleaved, fresh processes, same evening):
baseline 8.281 / ADV=6 8.347 / baseline 8.285 / ADV=6 8.347 —
a reproducible +0.8% with rays_cast identical (282936301) at 283M
rays, i.e. bit-exact on this workload. VERDICT: the law mostly holds
(5 of 7 non-baseline points are ties or losses tracking volume), but
the optimum DID move one notch: octant's shorter chains (primaries
24->17 rounds) shift the full-width ADV/backlog balance down a step.
The TPURT_ADV knob sets ADV_STEPS *and* ADV_MID/ADV_TAIL
(quick_tpu.py), so the grid's winner above is the UNGRADED schedule
at 6. DRAIN=(8,4,2)'s -11.8% independently re-confirms
probe_drainbatch's round-2 tuning from the other side post-octant.

GRADED-TAIL A/B (same evening, after a contract_rows run under an
accidental {full=6, tail/mid=8} hybrid read FASTER than ungraded-6;
interleaved, one process per point, TPURT_ADVTAIL knob):

    {6,6,6} ungraded:   8.344 / 8.346 Mrays/s  (walls 33.908/33.899)
    {6,8,8} graded:     8.475 / 8.473 Mrays/s  (walls 33.385/33.393)

The graded-DOWN schedule wins another +1.6% (+2.3% total over all-8),
rays_cast identical again. This does NOT contradict probe_advstage's
round-3 refutation — that refuted raising tail/mid ABOVE the
full-width value (extra masked links); here the full-width value
drops below the tail's. Mechanism: wide stages are step-VOLUME-bound
(octant's shorter chains favour 6), narrow tail stages are
ROUND-floor-bound (8 steps/round minimises rounds at ~free masked
cost). ADOPTED: ADV_STEPS=6, ADV_MID=ADV_TAIL=8 (traverse.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

GRID = [
    ("baseline", {}),
    ("ADV=6", {"TPURT_ADV": "6"}),
    ("ADV=10", {"TPURT_ADV": "10"}),
    ("STAGE=3", {"TPURT_STAGEMAX": "3"}),
    ("STAGE=5", {"TPURT_STAGEMAX": "5"}),
    ("DRAIN=8,4,2", {"TPURT_DRAIN": "8,4,2"}),
    ("MC=32", {"TPURT_MC": "32"}),
    ("MC=128", {"TPURT_MC": "128"}),
]


def run_point(label: str, env_extra: dict) -> dict:
    env = dict(os.environ, TPURT_SPP="128", **env_extra)
    out = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks" / "quick_tpu.py"),
         "c3-mesh"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["point"] = label
    rec["env"] = env_extra
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    only = sys.argv[1:]
    for label, env_extra in GRID:
        if only and label not in only:
            continue
        run_point(label, env_extra)


if __name__ == "__main__":
    main()
