"""Cross-batch tail coalescing A/B on the c3 bench config (round 4).

The frame loop paid the round-floor-bound deep-bounce tail once per
512k batch (~43% of the c3 frame is bounces 3+, probe_breakdown /
BASELINE round-3 frame profile, and the tail is width-insensitive);
render._accum_frame_coalesced pays it once per TAIL_GROUP batches.
This probe times the full c3 bench config (1280x720, 4 spp, ~8 batch
iterations) with coalescing OFF vs ON at cut bounce {2, 3, 4} and
group {8, 16}, interleaved in ONE process so relay drift is shared.
Protocol: warmup 1-sample pass, then best of 3 timed spp-range passes
(the quick_tpu protocol).

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_render import bench_config  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpurt import config, render

    cfg = bench_config("c3-mesh")
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    def run(tag):
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        print(json.dumps({
            "probe": tag, "mrays_per_s": round(rays / wall / 1e6, 3),
            "wall_best_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls]}), flush=True)

    render.TAIL_COALESCE = False
    run("coalesce_off")
    render.TAIL_COALESCE = True
    for cut in (2, 3, 4):
        render.TAIL_CUT = cut
        render.TAIL_GROUP = 8
        run(f"coalesce_cut{cut}_g8")
    render.TAIL_CUT = 3
    render.TAIL_GROUP = 16
    run("coalesce_cut3_g16")
    render.TAIL_COALESCE = False
    run("coalesce_off_again")  # drift control bracket


if __name__ == "__main__":
    main()
