"""Benchmark harness with JSON history (SURVEY.md §4 "Perf regression").

Runs reduced-size versions of the five BASELINE configs on the local
accelerator, measures steady-state throughput (compile excluded via a
warmup pass), appends one record per run to ``benchmarks/results/
history.jsonl``, and asserts the headline metric hasn't regressed >10%
against the best recorded run on the same backend.

Usage:
    python benchmarks/bench_render.py            # all configs, append
    python benchmarks/bench_render.py --quick    # config 3 only
    python benchmarks/bench_render.py --check    # also fail on regression
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent / "results"

# Reduced-size bench variants: same scenes/mode/physics as the presets,
# smaller sample budgets so a full sweep stays minutes, not hours.
BENCH_CONFIGS = {
    "c1-primary": dict(width=640, height=480, spp=4, scene="spheres_plane",
                       mode="primary"),
    "c2-cornell": dict(width=512, height=512, spp=8, scene="cornell",
                       mode="mega", max_depth=8),
    "c3-mesh": dict(width=1280, height=720, spp=4, scene="blob",
                    mesh_subdiv=6, mode="mega", max_depth=8),
    "c4-wavefront": dict(width=1920, height=1080, spp=2, scene="blob",
                         mesh_subdiv=6, mode="wavefront", max_depth=16,
                         rr_start=3),
}
HEADLINE = "c3-mesh"  # the north-star scene (BVH triangle mesh)


def run_one(name: str, kw: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from tpurt import config, render

    cfg = config.RenderConfig(seed=0, **kw)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    # warmup: compile + 1 sample
    film, _ = render.render_samples(cfg, scene, cam, 0, 1)
    jax.block_until_ready(film)

    t0 = time.perf_counter()
    film, rays = render.render_samples(cfg, scene, cam, 1, 1 + cfg.spp,
                                       jnp.zeros_like(film))
    float(jnp.sum(film))  # host fetch = reliable sync on this backend
    wall = time.perf_counter() - t0

    from tpurt import metrics

    stats = metrics.build_stats(rays, wall, cfg.width, cfg.height, cfg.spp)
    rec = {
        "name": name,
        "ts": round(time.time(), 1),
        "backend": jax.default_backend(),
        "mrays_per_s": round(stats["mrays_per_s"], 3),
        "spp_per_s_1080p": round(stats["spp_per_s_1080p"], 4),
        "rays": stats["rays"],
        "wall_s": round(wall, 3),
        "config": kw,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if headline regresses >10%% vs best")
    ap.add_argument("--configs", nargs="*", default=None)
    args = ap.parse_args()

    names = ([HEADLINE] if args.quick else
             args.configs or list(BENCH_CONFIGS))
    RESULTS.mkdir(parents=True, exist_ok=True)
    hist_path = RESULTS / "history.jsonl"

    records = [run_one(n, BENCH_CONFIGS[n]) for n in names]
    with open(hist_path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    if args.check:
        history = [json.loads(line) for line in open(hist_path)]
        for rec in records:
            prior = [h["mrays_per_s"] for h in history
                     if h["name"] == rec["name"]
                     and h["backend"] == rec["backend"]
                     and h["ts"] < rec["ts"]]
            if prior and rec["mrays_per_s"] < 0.9 * max(prior):
                print(f"REGRESSION: {rec['name']} {rec['mrays_per_s']} "
                      f"< 0.9 * best {max(prior)}", file=sys.stderr)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
