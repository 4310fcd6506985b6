"""Bounce-ladder stage count: can fewer stages keep the tail win?

probe_megadepth's ablation priced the 4-stage bounce ladder at ~7.6 ms
of FIXED cost per trace (argsorts + compaction gathers + 0-iteration
stage loops + carry copies ~= 1.9 ms/stage) against a 14.3 ms tail-
compaction win at depth 8. A 2-stage ladder with the same floor
([n/2, n/16]) keeps the big first shrink and the deep floor while
halving the fixed cost; [n/4, n/16] probes a cheaper first stage.
Packets dwell longer between compactions (up to 4x oversize), but the
bounce bodies only shrink when PACKET liveness drops — which happens
late on this workload (89k live rays after bounce 2 still touch most
packets), so early-dwell waste should be small.

Full megakernel, 524k STRIDED rays (bench protocol), depth 8.

MEASURED (TPU v5e via axon relay, 2026-08-18, device_time_fused,
524288 strided rays, full megakernel depth 8):

    baseline [2048,1024,512,256]   161.15 ms   307.4 ns/primary
    caps [2048, 256]               159.61 ms   304.4 ns/primary
    caps [1024, 256]               165.64 ms   315.9 ns/primary

VERDICT: MARGINAL, not adopted. Dropping the two middle stages returns
~half the predicted 3.8 ms fixed saving (1%); the other half is eaten
by oversize dwell, and a cheaper first stage ([1024,...]) loses
outright (bounces 1-2 still touch >1024 live packets and would run
truncated). A 1% c3-only win does not justify re-tuning the ladder
shape across c2/c5's 1024-pk geometry; the BOUNCE_STAGE_CAPS hook
stays for future probes.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path[:0] = [str(Path(__file__).resolve().parent.parent),
                str(Path(__file__).resolve().parent)]

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import camera as camera_mod, config, render, rng, trace

N = 524288


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    order_full = np.asarray(render.tile_order(cfg.width, cfg.height))
    pix_all = np.tile(order_full, 4)
    smp_all = np.repeat(np.arange(4, dtype=np.int32), order_full.size)
    n_tiles = pix_all.size // 128
    step = n_tiles // (N // 128)
    sel = np.arange(n_tiles)[::step][: N // 128]
    pix = jnp.asarray(pix_all.reshape(n_tiles, 128)[sel].reshape(-1))
    smp = jnp.asarray(smp_all.reshape(n_tiles, 128)[sel].reshape(-1))
    keys = rng.make_streams(jnp.uint32(0), pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    for caps in (None, (2048, 256), (1024, 256)):
        trace.BOUNCE_STAGE_CAPS = caps
        jax.clear_caches()
        fn = jax.jit(lambda o, d, k: trace.trace(scene, o, d, k, 8)[0])
        sec = device_time_fused(fn, o, d, keys, iters=4)
        name = "baseline_4stage" if caps is None else \
            "caps_" + "_".join(str(c) for c in caps)
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 2),
                          "ns_per_primary": round(sec / N * 1e9, 1)}),
              flush=True)
    trace.BOUNCE_STAGE_CAPS = None


if __name__ == "__main__":
    main()
