"""Find the workload where wavefront beats the megakernel — or close it.

Round-3 VERDICT item 7: BASELINE config 4 names "wavefront mode with
ray compaction", and the staged wavefront now runs at ~97% of the
megakernel on c4 itself — but its raison d'être (work SHRINKAGE beating
dead-lane masking) had never been demonstrated on any workload. The
regime where shrinkage should pay: deep bounce budgets + early Russian
roulette + dielectric-heavy scenes (glass never absorbs; paths run
long; RR kills lanes stochastically, so live population decays
geometrically while the megakernel's arrays stay full-size until a
stage cap is crossed).

Measures mega vs wavefront, identical physics/RNG, on:
  * c4 proper:   blob, 1080p slice, max_depth 16, rr_start 3
  * deep-glass:  glassblob (dielectric body), max_depth 32, rr_start 2

Each run: one sample batch, best-of-3 wall via the render path (the
bounce loop IS the program; device_time_fused cannot wrap the staged
while_loops without re-tracing), plus mean live-fraction per bounce
from the wavefront's own occupancy metric.

Appends history-style records; numbers + verdict recorded below.

MEASURED (TPU v5e via axon relay, 2026-08-17):

    c4_mega            7.157 Mrays/s   wall 1.337 s
    c4_wavefront       5.696 Mrays/s   wall 1.680 s   live_frac 0.081
    deepglass_mega     2.969 Mrays/s   wall 3.171 s
    deepglass_wavefront 2.682 Mrays/s  wall 3.510 s   live_frac 0.043

(live_frac = mean live fraction over bounce slots that saw work; the
run printed 1.29/0.34 under the occupancy denominator that forgot the
pixel-block axis — fixed in render.py the same day; the values above
divide by the n_blocks of each config, 16 and 8, which is exact.)

VERDICT: the question is CLOSED — the staged megakernel dominates on
this hardware, including on the workload built to favor shrinkage.
Deep-glass (max_depth 32, rr_start 2, dielectric body) drives mean
occupancy down to 4.3% — the exact regime where per-bounce queue
compaction should shine — and wavefront still loses by 11% (2.68 vs
2.97); on c4 proper it loses by 26%. The reason is that the megakernel
is not a dead-lane masker: trace.py's staged bounce compaction already
shrinks its arrays geometrically as paths die, capturing the shrinkage
benefit, while the wavefront pays queue bookkeeping (pack/unpack,
film-scatter indirection) per bounce on top. Wavefront mode remains the
BASELINE config-4 surface (queue semantics, occupancy metrics,
per-bounce compaction are all real and tested) but is not the
throughput path; c4's bench mode stays as specified and the conclusion
is recorded in BASELINE.md.

RE-MEASURED after the round-3 scatter fixes (both modes got faster —
wavefront lost its per-commit segment_sum, mega its identity-scatter
epilogue — so the question was reopened and re-closed, same protocol):

    c4_mega             9.153 Mrays/s   wall 1.046 s   (was 7.157)
    c4_wavefront        7.445 Mrays/s   wall 1.285 s   (was 5.696)
    deepglass_mega      3.952 Mrays/s   wall 2.382 s   (was 2.969)
    deepglass_wavefront 3.363 Mrays/s   wall 2.800 s   (was 2.682)

VERDICT UNCHANGED: staged-mega wins by 23% on c4 and 18% on deep-glass.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import config, render


def run_one(name, kw):
    cfg = config.RenderConfig(seed=0, **kw)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    sink: dict = {}
    film, _ = render.render_samples(cfg, scene, cam, 0, 1)  # warm/compile
    jax.block_until_ready(film)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        film, rays = render.render_samples(
            cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film),
            stats_sink=sink)
        float(jnp.sum(film))
        best = min(best, time.perf_counter() - t0)
    rec = {"probe": name, "mode": cfg.mode,
           "mrays_per_s": round(rays / best / 1e6, 3),
           "rays": int(rays), "wall_s": round(best, 3)}
    if "live_history" in sink:
        cap = max(sink.get("queue_capacity", 1), 1)
        hist = sink["live_history"]
        # mean live fraction over the bounce slots that saw any work
        occ = [h / cap for h in hist if h > 0]
        rec["mean_live_frac"] = round(sum(occ) / max(len(occ), 1), 4)
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    c4 = dict(width=1920, height=1080, spp=2, scene="blob",
              mesh_subdiv=6, max_depth=16, rr_start=3)
    deep = dict(width=1280, height=720, spp=4, scene="glassblob",
                mesh_subdiv=6, max_depth=32, rr_start=2)
    for base, tag in ((c4, "c4"), (deep, "deepglass")):
        for mode in ("mega", "wavefront"):
            run_one(f"{tag}_{mode}", dict(base, mode=mode))


if __name__ == "__main__":
    main()
