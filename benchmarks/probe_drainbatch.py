"""Batched multi-drain: how many ring entries should one round drain?

probe_fanout's counter analysis overturned the round-2 wall story: at
c3 bounce-1, phase A (the advance chain) is ~15% of traversal wall —
the dominant terms are the DENSE leaf phase (~50%, run n_drains times
per round as separate ~15-link chains) and the fixed per-round cost
(~30%) multiplied by the leaf-gated round count. Round 3 therefore
batches the drains: D ring entries pop into ONE dense (P, D*LN, R)
phase (kernels/traverse.py drain_batch; winner order proven identical,
tests pass bit-exact for D in {1,2,4,8}).

This probe grids DRAIN_N = (tail, mid, full) over both layouts on the
c3 bounce-1 workload + primary rays. Expectation: draining D>1 at
mid/full widths divides the drain-gated round count at ~constant round
cost, until the dense volume (which scales with D * sum_pp) becomes the
bound.

MEASURED (TPU v5e via axon relay, 2026-08-17):

    bounce-1 (131072 rays), binary layout:      ms   rounds  sum_pp
      D=(4,2,1)  [== round-2 drain schedule]  10.49   124    32208
      D=(4,2,2)                               11.26   119    26000
      D=(8,4,2)                               13.66   119    24848
      D=(8,8,4)                               19.72   118    23936
      D=(16,8,4)                              21.84   118    23936
      D=(16,16,8)                             35.70   118    23936
    bounce-1, wide layout (ADV_STEPS_WIDE=3):
      D=(8,8,4)  21.94 | D=(16,8,4) 23.45 | D=(16,16,8) 38.36
    primary: binary (16,8,4) 3.51 ms | wide (16,8,4) 4.56 ms
    (useful row-drains ~24.5k CONSTANT across the whole grid)

VERDICT: REFUTED — batching is implemented, bit-exact, and STRICTLY
MONOTONICALLY WORSE. Two model corrections fall out of the counters:
(1) rounds did NOT fall (124 -> 118 despite 8x drain capacity), so the
round count is gated by the STRAGGLER'S WALK LENGTH (992 node steps /
ADV_STEPS = 124), not by leaf backlog — the round-2 "drain-gated"
reading held only under the old 1-drain rounds; (2) wall rises ~ 3-4 ms
per extra full-width drain unit = 1024 packets x 4096 pairs x ~60 flops
= 250 MFLOP at ~3.2 Tflop/s — the dense phase is VPU-COMPUTE-BOUND, so
any drain capacity beyond keep-up is pure volume loss. The D=(4,2,1)
schedule was already matched to the enqueue rate. Batched drain_batch
STAYS (same cost as sequential at equal D, fewer links) but the
schedule keeps D=(4,2,1). Next levers, from this data:
rounds = walk/ADV (probe_advdrain.py grids ADV with keep-up drains,
where the wide layout's 2.9x-shorter walk gets its real audition) and
moving the dense volume off the VPU (probe_mxudense.py).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, rng, trace
from tpurt import render
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    traverse.WIDE_ENABLE = True   # pk8 is built lazily, only when
    # the flag is set at BUILD time (round-4: no eager pk8 build)
    scene, cam = config.build_scene(cfg)
    traverse.WIDE_ENABLE = False
    scene = scene.device()
    scene_bin = scene._replace(pk8_nodes=None, pk8_leaves=None,
                               pk8_cut=None)

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def one_bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)
    tinf = jnp.full(N, jnp.inf, jnp.float32)

    def run(name, sc, rays, iters=16):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            sc, o, d, t)[0])
        sec = device_time_fused(trav, *rays, iters=iters)
        cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            sc, o, d, t, with_counters=True)[5:9])
        r, a, s_pp, s_pend = (int(x) for x in cnt(*rays))
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3),
                          "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                          "sum_row_drains": s_pend}), flush=True)

    traverse.WIDE_ENABLE = True   # wide runs use the pk8 arrays
    grid = [(4, 2, 1), (4, 2, 2), (8, 4, 2), (8, 8, 4), (16, 8, 4),
            (16, 16, 8)]
    for dn in grid:
        traverse.DRAIN_N = dn
        run(f"b1_bin_D{dn[0]}-{dn[1]}-{dn[2]}", scene_bin, (o2, d2, tcap2))
    for dn in [(8, 8, 4), (16, 8, 4), (16, 16, 8)]:
        traverse.DRAIN_N = dn
        run(f"b1_wide_D{dn[0]}-{dn[1]}-{dn[2]}", scene, (o2, d2, tcap2))
    traverse.DRAIN_N = (16, 8, 4)
    run("primary_bin_D16-8-4", scene_bin, (o, d, tinf))
    run("primary_wide_D16-8-4", scene, (o, d, tinf))
    traverse.DRAIN_N = (4, 2, 1)
    traverse.WIDE_ENABLE = False


if __name__ == "__main__":
    main()
