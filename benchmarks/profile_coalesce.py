"""Capture device profiles of the c3 frame with tail coalescing OFF/ON.

probe_tailcoalesce.py measured the coalesced frame ~12% SLOWER at every
(cut, group) point — the opposite of the round-floor model's
prediction. This captures one warm frame pass per variant under
jax.profiler.trace (the relay passes the TPU lane through,
profile_parse.py decodes it) so the regression is attributed
per-kernel instead of argued about.

Usage:
    python benchmarks/profile_coalesce.py [outdir=/tmp/xprof-coalesce]
    python benchmarks/profile_parse.py /tmp/xprof-coalesce/off
    python benchmarks/profile_parse.py /tmp/xprof-coalesce/on
"""

from __future__ import annotations

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

    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof-coalesce")
    cfg = bench_config("c3-mesh")
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    # The TAIL_COALESCE engine was DELETED from render.py in round 5
    # (refutation stands; the engine lives at round-4 commit 69c49fb).
    # The "on" variant can only be reproduced from that commit — fail
    # loudly rather than silently profiling the same code twice.
    engine_present = hasattr(render, "TAIL_COALESCE")
    if not engine_present:
        print("render.TAIL_COALESCE was deleted (round 5); profiling the "
              "'off' (production) variant only. For 'on', check out "
              "commit 69c49fb.", flush=True)

    for tag, on in (("off", False), ("on", True)):
        if on and not engine_present:
            continue
        render.TAIL_COALESCE = on
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        # one warm timed pass (compile cached by the warmup)
        film, rays = render.render_samples(
            cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
        float(jnp.sum(film))
        d = out / tag
        d.mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(str(d)):
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
        print(tag, "wall", round(time.perf_counter() - t0, 3), "->", d,
              flush=True)


if __name__ == "__main__":
    main()
