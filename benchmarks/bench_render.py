"""Benchmark harness with JSON history (SURVEY.md §4 "Perf regression").

Runs reduced-size versions of the five BASELINE configs on the local
accelerator, measures steady-state throughput (compile excluded via a
warmup pass) AND image RMSE vs the NumPy oracle at a fixed sub-resolution
(the BASELINE ``metric`` is the triple Mrays/s/chip + 1080p-spp/s + RMSE,
so every history record carries all three), appends one record per run to
``benchmarks/results/history.jsonl``, and — by default — fails if the
metric regressed >10% against the best recorded run on the same backend.

Usage:
    python benchmarks/bench_render.py            # all configs, append+check
    python benchmarks/bench_render.py --quick    # config 3 only
    python benchmarks/bench_render.py --no-check # measure only
    python benchmarks/bench_render.py --no-rmse  # skip the oracle pass
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
    # config 5 at bench scale: full 4K frame, reduced spp, tile-sharded
    # over whatever mesh exists (the 1-chip TPU mesh here; the fake
    # 8-device CPU mesh in tests)
    "c5-multichip": dict(width=3840, height=2160, spp=2, scene="blob",
                         mesh_subdiv=6, mode="mega", max_depth=16,
                         rr_start=3, shard="tiles"),
}
HEADLINE = "c3-mesh"  # the north-star scene (BVH triangle mesh)

# RMSE probe: same scene/physics at a fixed small frame so the NumPy
# oracle finishes in seconds; records parity for every bench config.
RMSE_W, RMSE_H, RMSE_SPP = 96, 54, 2


def rmse_vs_oracle(kw: dict) -> float:
    from tpurt import config, cpu_ref, film as film_mod, mesh, render

    cfg = config.RenderConfig(seed=0, **kw).replace(
        width=RMSE_W, height=RMSE_H,
        spp=min(RMSE_SPP, kw.get("spp", RMSE_SPP)),
    )
    scene, cam = config.build_scene(cfg)
    if cfg.shard != "none":
        f_dev, _ = mesh.render_sharded(cfg, scene, cam)
    else:
        f_dev, _ = render.render(cfg, scene, cam)
    f_ref, _ = cpu_ref.render(cfg, scene.device(), cam)
    return float(film_mod.rmse(f_dev, f_ref))


def run_one(name: str, kw: dict, with_rmse: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt import config, mesh, render

    cfg = config.RenderConfig(seed=0, **kw)
    scene, cam = config.build_scene(cfg)

    # best-of-REPS timing: wall times through the axon relay vary +-35%
    # run to run (measured in round 2), so a single pass cannot gate
    # regressions; the best pass is the stable device-speed estimate.
    REPS = 3
    if cfg.shard != "none":
        m = mesh.make_mesh()
        # warmup: compile + 1 sample over the mesh
        film, _ = mesh.render_samples_sharded(cfg, scene, cam, 0, 1, mesh=m)
        wall = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            film, rays = mesh.render_samples_sharded(
                cfg, scene, cam, 1, 1 + cfg.spp,
                np.zeros_like(film), mesh=m,
            )  # returns a host array: already synced
            wall = min(wall, time.perf_counter() - t0)
        devices = m.size
    else:
        scene = scene.device()
        # warmup: compile + 1 sample
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        wall = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))  # host fetch = reliable sync here
            wall = min(wall, time.perf_counter() - t0)
        devices = 1

    from tpurt import metrics

    stats = metrics.build_stats(rays, wall, cfg.width, cfg.height, cfg.spp,
                                devices=devices)
    rec = {
        "name": name,
        "ts": round(time.time(), 1),
        "backend": jax.default_backend(),
        "mrays_per_s": round(stats["mrays_per_s"], 3),
        "mrays_per_s_per_chip": round(stats["mrays_per_s"] / devices, 3),
        "spp_per_s_1080p": round(stats["spp_per_s_1080p"], 4),
        "rays": stats["rays"],
        "wall_s": round(wall, 3),
        "devices": devices,
        "config": kw,
    }
    if with_rmse:
        rec["rmse_vs_oracle"] = round(rmse_vs_oracle(kw), 6)
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--check", dest="check", action="store_true",
                    default=True,
                    help="exit 1 if a config regresses >10%% vs best "
                         "(DEFAULT; see --no-check)")
    ap.add_argument("--no-check", dest="check", action="store_false")
    ap.add_argument("--no-rmse", dest="rmse", action="store_false",
                    default=True)
    ap.add_argument("--configs", nargs="*", default=None)
    args = ap.parse_args()

    names = ([HEADLINE] if args.quick else
             args.configs or list(BENCH_CONFIGS))
    RESULTS.mkdir(parents=True, exist_ok=True)
    hist_path = RESULTS / "history.jsonl"

    records = [run_one(n, BENCH_CONFIGS[n], with_rmse=args.rmse)
               for n in names]
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
