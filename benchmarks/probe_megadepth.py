"""Where does the FULL megakernel's 183 ms/batch go, bounce by bounce?

probe_breakdown measures each bounce's traversal in ISOLATION (fresh
full-width arrays); probe_stagecaps measured the full 8-bounce
megakernel at 349 ns/primary = 183 ms per 512k batch. The isolated
bounce-0/1 traversals (4.7 + 24.6 ms) leave ~150 ms unattributed —
either the mid bounces (2-3, still wide AND more divergent) dominate,
or the bounce-loop machinery (staged compactions, cond chains) eats a
share the isolated probes never see.

This probe times trace.trace at the c3 blob workload (tile-ordered
primary rays, 512k batch) with max_depth = 1..8; successive differences
are the marginal cost of each bounce INCLUSIVE of everything the real
render pays (its traversal at the bounce-stage width, shading, RNG,
bounce-ladder compactions). Cross-checks against probe_breakdown's
isolated traversal numbers pin the machinery share.

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused,
524288 first-4096-tiles rays — NOTE: a cheaper ray set than the
strided-4spp one probe_stagecaps used, so totals are not comparable
across the two probes; the marginal STRUCTURE is the result):

    depth   total ms   marginal ms   (isolated bounce body, breakdown)
      1       38.92       38.92        5.07
      2       51.59       12.67        8.84
      3       59.10        7.51        6.21
      4       66.13        7.03        5.47
      5       69.76        3.64        3.67
      6       72.20        2.44         —
      7       73.36        1.16         —
      8       74.60        1.24         —

RE-MEASURED after the scatter fix (same protocol, same ray set):

    depth 1: 16.87 ms (was 38.92)   depth 2: 31.11 (was 51.59)
    depth 8: 53.09 ms (was 74.60)   -> full megakernel 1.40x

~12 ms of depth-1 fixed cost remains above the isolated body. The
ladder ablation (BOUNCE_STAGE_MAX 0 vs 4, same protocol) attributes it:

    depth 1:  no ladder  9.28 ms   4-stage ladder 16.89 ms
    depth 8:  no ladder 67.00 ms   4-stage ladder 52.71 ms

i.e. the bounce ladder carries ~7.6 ms of fixed cost (argsorts +
compaction gathers + 0-iteration stage loops + carry copies) but buys
14.3 ms of tail compaction at full depth — net +27% — so it stays; the
last ~4 ms is bounce-0-in-while_loop context vs the isolated jit.

STRIDED profile (bench-representative ray set, post-scatter-fix,
2026-08-18, `probe_megadepth.py 524288 1,2,3,4,8 strided`):

    depth   total ms   marginal ms   share of depth-8 frame
      1       17.84       17.84       11%  (bounce-0 + machinery)
      2       61.17       43.33       27%  (bounce-1)
      3       92.11       30.94       19%
      4      116.69       24.58       15%
      8      161.40       44.71       28%  (bounces 4-7 combined)

Total 307.8 ns/primary — exactly probe_stagecaps' pre-fix 349.2 minus
the 40 ns/primary identity scatter, cross-validating both. The frame is
divergent-bounce traversal end to end: no single bounce exceeds 27%,
the deep tail (4-7, <2% occupancy) costs as much as bounce-1, and
bounce-1 in-context (43.3) runs ~29% above its isolated cost (33.6,
probe_packetwidth) — ladder/context overhead consistent with the
cheap-set attribution below.

VERDICT: the megakernel's unattributed cost is a ~34 ms FIXED term —
depth-1 trace costs 38.9 ms where the isolated bounce-0 body costs
5.1 ms, and every later marginal roughly matches its isolated body
(sum of marginals 2..8 = 35.7 ms vs ~34 ms of bodies). The fixed term
is trace's EPILOGUE, not the bounce loop: the final
`zeros.at[slot].set(rad)` full-width unshuffle — an IDENTITY scatter on
the staged path (the stage unwind already restores original order) that
XLA cannot elide because slot is a runtime value. probe_scatter.py
prices the primitive (~58 ns/row => ~30 ms at 524k rows) and the fix
(delete it; keep an inverse gather only under resort). The ~4 ms
residue is the ladder argsorts/merges + the marginal-2 inflation
(ladder stages engage between bounces 1-2).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path[:0] = [str(Path(__file__).resolve().parent.parent),
                str(Path(__file__).resolve().parent)]

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import camera as camera_mod, config, render, rng, trace

N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
DEPTHS = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 \
    else [1, 2, 3, 4, 5, 6, 7, 8]
# "strided" (argv[3]): sample tiles across the whole frame x 4 spp — the
# bench-representative set (~3x costlier per ray than the default
# first-4096-tiles set; see probe_packetwidth's VERDICT note)
STRIDED = len(sys.argv) > 3 and sys.argv[3] == "strided"


def main() -> None:
    import numpy as np

    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    if STRIDED:
        order_full = np.asarray(render.tile_order(cfg.width, cfg.height))
        pix_all = np.tile(order_full, 4)
        smp_all = np.repeat(np.arange(4, dtype=np.int32), order_full.size)
        n_tiles = pix_all.size // 128
        step = n_tiles // (N // 128)
        sel = np.arange(n_tiles)[::step][: N // 128]
        pix = jnp.asarray(pix_all.reshape(n_tiles, 128)[sel].reshape(-1))
        smp = jnp.asarray(smp_all.reshape(n_tiles, 128)[sel].reshape(-1))
    else:
        order_full = render.tile_order(cfg.width, cfg.height)
        n_tiles = order_full.size // 128
        step = n_tiles // (N // 128)
        pix = jnp.asarray(
            order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1))
        smp = jnp.zeros(N, jnp.int32)
    keys = rng.make_streams(jnp.uint32(0), pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    prev = 0.0
    for depth in DEPTHS:
        fn = jax.jit(
            lambda o, d, k, _depth=depth: trace.trace(
                scene, o, d, k, _depth)[0])
        sec = device_time_fused(fn, o, d, keys, iters=4)
        ms = sec * 1e3
        print(json.dumps({
            "probe": f"megadepth{depth}", "n": N,
            "ms": round(ms, 2),
            "marginal_ms": round(ms - prev, 2),
            "ns_per_primary": round(sec / N * 1e9, 1),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
