"""Contract-spp throughput rows (round-4 VERDICT item 5 / missing #4).

The bench protocol times the presets at reduced spp (BENCH_SPP) so a
sweep stays minutes; this script runs a config at the PRESET's full
contract sample count (c2 64, c3 128, c4 256, c5 1024 — config.PRESETS
is the one source of truth) and appends a ``<name>-contract`` history
row, settling whether the protocol numbers under- or over-state
contract-scale throughput (the c1 precedent: 87.9 -> 137.4 Mrays/s from
32 -> 128 spp on dispatch-floor amortization alone; c3 at 4 spp already
runs ~8 batches, so the model predicts ~no change there — this measures
it).

Usage:
    python benchmarks/contract_rows.py c2-cornell c3-mesh c4-wavefront
    python benchmarks/contract_rows.py c5-multichip --spp 256

Long walls => reps=2 (best-of; the relay's noise is one-sided) and the
regression gate is not consulted (contract rows are a separate series).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_render import RESULTS, rmse_vs_oracle  # noqa: E402


def run_contract(name: str, spp: int | None, reps: int,
                 with_rmse: bool = True, span: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt import config, mesh, metrics, render

    cfg = config.PRESETS[name].replace(seed=0)
    if spp is not None:
        cfg = cfg.replace(spp=spp)

    scene, cam = config.build_scene(cfg)
    # span: samples per render_samples call (the checkpointable unit).
    # One >2 min single dispatch crashed the TPU worker (c4 at 256 spp:
    # the whole-frame wavefront fori is ONE device program); spanning
    # keeps each dispatch bounded while timing the identical total work.
    span = span or cfg.spp
    walls: list[float] = []
    if cfg.shard != "none":
        m = mesh.make_mesh()
        film, _ = mesh.render_samples_sharded(cfg, scene, cam, 0, 1, mesh=m)
        for _ in range(reps):
            t0 = time.perf_counter()
            film = np.zeros_like(film)
            rays = 0
            for s0 in range(1, 1 + cfg.spp, span):
                film, r = mesh.render_samples_sharded(
                    cfg, scene, cam, s0, min(s0 + span, 1 + cfg.spp),
                    film, mesh=m)
                rays += r
            walls.append(time.perf_counter() - t0)
        devices = m.size
    else:
        scene = scene.device()
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        for _ in range(reps):
            t0 = time.perf_counter()
            film = jnp.zeros_like(film)
            rays = 0
            for s0 in range(1, 1 + cfg.spp, span):
                film, r = render.render_samples(
                    cfg, scene, cam, s0, min(s0 + span, 1 + cfg.spp),
                    film)
                rays += r
            float(jnp.sum(film))
            walls.append(time.perf_counter() - t0)
        devices = 1
    wall = min(walls)
    stats = metrics.build_stats(rays, wall, cfg.width, cfg.height, cfg.spp,
                                devices=devices)
    rec = {
        "name": f"{name}-contract",
        "ts": round(time.time(), 1),
        "backend": jax.default_backend(),
        "mrays_per_s": round(stats["mrays_per_s"], 3),
        "mrays_per_s_per_chip": round(stats["mrays_per_s"] / devices, 3),
        "spp_per_s_1080p": round(stats["spp_per_s_1080p"], 4),
        "rays": stats["rays"],
        "wall_s": round(wall, 3),
        "walls_s": [round(w, 3) for w in walls],
        "devices": devices,
        "config": {"preset": name, "spp": cfg.spp, "span": span},
    }
    if with_rmse:
        rec["rmse_vs_oracle"] = round(rmse_vs_oracle(cfg), 6)
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--spp", type=int, default=None,
                    help="override the preset spp (c5 wall-budget runs)")
    ap.add_argument("--span", type=int, default=None,
                    help="samples per dispatch-group call (bound single-"
                         "dispatch walls under ~2 min; see run_contract)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-rmse", dest="rmse", action="store_false",
                    default=True)
    args = ap.parse_args()

    RESULTS.mkdir(parents=True, exist_ok=True)
    with open(RESULTS / "history.jsonl", "a") as f:
        for name in args.configs:
            rec = run_contract(name, args.spp, args.reps,
                               with_rmse=args.rmse, span=args.span)
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
