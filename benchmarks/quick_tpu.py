"""Quick steady-state TPU measurement of selected bench configs.

Same protocol as bench_render.run_one (warmup 1 sample, timed spp range,
host-fetch sync) without the RMSE pass or history append — for fast
iteration between perf commits. Usage:

    python benchmarks/quick_tpu.py c1-primary c3-mesh

Env toggles for adoption measurements (each process times one setting,
so jit caches can never go stale across a flag flip):
    TPURT_OCT=0/1     set kernels.traverse.OCT_ENABLE before scene build
    TPURT_BF16PACK=0/1  set bvh.PK_BF16_PACK before scene build
    TPURT_SPP=N       override the timed sample budget (e.g. contract 128)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_render import bench_config  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt import bvh, config, mesh, render
    from tpurt.kernels import traverse

    if os.environ.get("TPURT_OCT") in ("0", "1"):
        traverse.OCT_ENABLE = os.environ["TPURT_OCT"] == "1"
    if os.environ.get("TPURT_BF16PACK") in ("0", "1"):
        bvh.PK_BF16_PACK = os.environ["TPURT_BF16PACK"] == "1"
    # traversal-schedule knobs (probe_retune_oct.py's end-to-end grid);
    # module globals are read at trace time, so one process per setting
    if os.environ.get("TPURT_ADV"):
        traverse.ADV_STEPS = int(os.environ["TPURT_ADV"])
        traverse.ADV_MID = traverse.ADV_TAIL = traverse.ADV_STEPS
    if os.environ.get("TPURT_ADVTAIL"):
        # grade the narrow (tail/mid) stages separately from full width
        # (probe_retune_oct A/B: ungraded 6 vs full=6, tail/mid=8)
        traverse.ADV_MID = traverse.ADV_TAIL = int(
            os.environ["TPURT_ADVTAIL"])
    if os.environ.get("TPURT_MC"):
        traverse.MC_PACKETS = int(os.environ["TPURT_MC"])
    if os.environ.get("TPURT_DRAIN"):
        traverse.DRAIN_N = tuple(
            int(x) for x in os.environ["TPURT_DRAIN"].split(","))
    if os.environ.get("TPURT_STAGEMAX"):
        from tpurt import trace
        trace.BOUNCE_STAGE_MAX = int(os.environ["TPURT_STAGEMAX"])
    spp_over = int(os.environ.get("TPURT_SPP", "0"))

    names = sys.argv[1:] or ["c3-mesh"]
    for name in names:
        cfg = bench_config(name)
        if spp_over:
            cfg = cfg.replace(spp=spp_over)
        scene, cam = config.build_scene(cfg)
        if cfg.shard != "none":
            m = mesh.make_mesh()
            film, _ = mesh.render_samples_sharded(cfg, scene, cam, 0, 1,
                                                  mesh=m)
            t0 = time.perf_counter()
            film, rays = mesh.render_samples_sharded(
                cfg, scene, cam, 1, 1 + cfg.spp, np.zeros_like(film), mesh=m)
            wall = time.perf_counter() - t0
        else:
            scene = scene.device()
            film, _ = render.render_samples(cfg, scene, cam, 0, 1)
            float(jnp.sum(film))
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            wall = time.perf_counter() - t0
        print(json.dumps({
            "name": name, "mrays_per_s": round(rays / wall / 1e6, 3),
            "rays": int(rays), "wall_s": round(wall, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
