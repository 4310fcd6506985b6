"""Device-profile attribution of the c4 wavefront-vs-mega gap.

probe_wavefront_win.py settled WHICH backend is faster (staged mega,
+23% on the c4 workload); the contract pins config 4 to the wavefront
surface, so the round-4 VERDICT asks where the wavefront's residual
overhead lives (item 6: >= 8.5 Mrays/s or a structural attribution).
This captures one warm frame pass per mode under jax.profiler.trace on
the identical c4 bench config and prints quick-protocol timings; diff
the two with profile_parse.py.

Usage:
    python benchmarks/profile_c4.py [outdir=/tmp/xprof-c4]
    python benchmarks/profile_parse.py /tmp/xprof-c4/wavefront
    python benchmarks/profile_parse.py /tmp/xprof-c4/mega

RESULTS (2026-08-18, post rad_out-carry fix + round-4 fusion fixes):

    c4_wavefront 8.75 Mrays/s (best 1.094 s) — up from round 3's 7.68;
    c4_mega      9.376 (1.021 s) — the gap narrowed -19% -> -6.7%.

    Profile diff (identical workload, one frame pass each):
      kernels 257,053 vs 257,546 — SAME; every traversal class equal
      (iota_reduce 220 vs 222 ms, or_reduce 137 vs 135, slice_reduce
      131.8 vs 132.4, select_reduce 98 vs 99).
      Residual: generic 'fusion' 218.6 vs 175.3 ms (+43) and reshape
      43.5 vs 34.4 (+9) — the per-bounce queue bookkeeping: the queue
      carries pix/slot/rad planes the megakernel does not, and step()
      updates 8 SoA planes per bounce vs the mega body's 7.

VERDICT: the wavefront's remaining ~6% vs mega is STRUCTURAL to the
queue surface (its per-bounce elementwise plane traffic), not to
compaction scheduling (deleted round 4), radiance commits (packet-row
since round 3), or traversal (bit-shared). Config 4's contract mode is
within ~7% of the repo's own optimum for the same physics.
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

    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof-c4")
    base = bench_config("c4-wavefront")

    for tag in ("wavefront", "mega"):
        cfg = base.replace(mode=tag)
        scene, cam = config.build_scene(cfg)
        scene = scene.device()
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            walls.append(time.perf_counter() - t0)
        print(json.dumps({
            "probe": f"c4_{tag}",
            "mrays_per_s": round(rays / min(walls) / 1e6, 3),
            "walls_s": [round(w, 3) for w in walls]}), flush=True)
        d = out / tag
        d.mkdir(parents=True, exist_ok=True)
        with jax.profiler.trace(str(d)):
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
        print(tag, "profile ->", str(d), flush=True)


if __name__ == "__main__":
    main()
