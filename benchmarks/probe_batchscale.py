"""Does a larger ray batch amortize the per-round link term?

The round-3 ceiling model (BASELINE.md) decomposes the c3 bounce-1
traversal at the production batch (N=131072, pp=1024 packets) as

    wall ~= dense MT volume (3.0 ms)  -- scales with N
          + phase-A step volume (1.3 ms)  -- scales with N
          + serial op links (~5-6 ms)  -- ~55 links/round x rounds,
            INDEPENDENT of packet width (probe_lanereduce: a link costs
            the same at any width; rounds track the straggler packet's
            walk length, a property of the scene/tree, not of N)

If that model is right, the link term is a per-batch FIXED cost and the
batch size — parked at 1<<17 since round 1, when "batch size was a wash"
under the old per-dispatch-sync economics — is a live lever: 4x the
batch should pay ~4x the volume terms but ~1x the link term, i.e.
~1.7x throughput on bounce-1. This probe measures bounce-1 traversal
wall + round counters at N = 128k/256k/512k/1M (tile-order rays, the
production ordering) and primary rays at the same widths.

The model PREDICTS (at 131k = 10.2 ms): 256k ~14.6, 512k ~23.5,
1M ~41 ms. Flat ns/ray instead means rounds/links grow with N and the
model's link-term independence is wrong.

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused):

    bounce-1 (tile-strided post-bounce rays, blob subdiv=6):
          N        ms     ns/ray   rounds   sum_pp   sum_pending
      131072     10.39     79.3      125     31376      25166
      262144     18.13     69.2      143     71904      50116
      524288     24.56     46.9      166    101376      70732
     1048576     54.55     52.0      197    263168     178581
    primary:
      131072      1.54     11.7       20      3840       2770
     1048576      9.23      8.8       38     38400      19650

VERDICT: CONFIRMED, with a measured optimum at 512k. Rounds grow only
~15%/2x (the straggler walk is a scene/tree property; extra packets add
stragglers sublinearly) while the volume terms scale with N, so the
per-round link term amortizes: bounce-1 ns/ray falls 41% at 512k and
primary 25% at 1M. Past 512k the compaction tail turns: sum_pp jumps
2.6x from 512k to 1M (relative stage caps mean the tail runs at 2x the
widths, and 1M's straggler set is big enough to hold the early stages
live longer), costing back most of the link amortization. ray_batch
default moved 1<<17 -> 1<<19 (config.py); end-to-end effect is in the
round-3 history.jsonl sweep. The ceiling-model reading (BASELINE.md):
the ~5-6 ms link term is real but is a PER-BATCH constant, not a
per-ray tax — the model's "implied ceiling" paragraph now carries the
batch-size clause.

SCOPE (measured after adoption, same day): the win is specific to the
BVH traversal's link term. Brute-force scenes (c2-cornell) measured 29%
SLOWER at 512k (35.2 -> 25.0 Mrays/s median-of-5, reproduced twice) —
no rounds, no links, pure volume — so render.py caps no-BVH bounce
paths at BRUTE_RAY_BATCH = 128k. The sharded per-chip sub-block
(mesh.SUB_BLOCK) stays 128k as well: on c5 (4K, depth 16, rr 3) a 512k
sub-block measured a wash-to-25%-loss (3.97/3.83/2.98 vs 3.89-3.97
Mrays/s across reps) — at contract depth the round-floor-bound deep
tail dominates and fresh-bounce amortization buys nothing.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, rng, trace
from tpurt import render
from tpurt.kernels import traverse

WIDTHS = (131072, 262144, 524288, 1048576)


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    # Tile-strided subsets of the full 4-spp ray set (the probe_fanout
    # protocol, generalized to widths): every width samples whole
    # 128-ray tiles evenly across ALL pixels x samples, so each width
    # sees the same image statistics — a contiguous tile-order prefix
    # would cover only a corner of the frame (mostly sky at small n,
    # rounds=1, measured in the CPU smoke test of this probe).
    order_full = np.asarray(render.tile_order(cfg.width, cfg.height))
    npix = order_full.size
    max_reps = -(-max(WIDTHS) // npix)
    pix_all = np.tile(order_full, max_reps)
    smp_all = np.repeat(np.arange(max_reps, dtype=np.int32), npix)
    n_tiles = pix_all.size // 128

    def rays_at(n):
        step = n_tiles // (n // 128)
        sel = (np.arange(n_tiles)[::step][: n // 128])
        pix = jnp.asarray(pix_all.reshape(n_tiles, 128)[sel].reshape(-1))
        smp = jnp.asarray(smp_all.reshape(n_tiles, 128)[sel].reshape(-1))
        keys = rng.make_streams(jnp.uint32(0), pix, smp)
        jit2 = rng.camera_draws(keys)
        o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix,
                                        jit2)
        return o, d, keys

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

    def run(name, rays, iters=8):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, *rays, iters=iters)
        cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t, with_counters=True)[5:9])
        r, a, s_pp, s_pend = (int(x) for x in cnt(*rays))
        n = rays[0].shape[0]
        print(json.dumps({"probe": name, "n": n,
                          "ms": round(sec * 1e3, 3),
                          "ns_per_ray": round(sec / n * 1e9, 2),
                          "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                          "sum_pending": s_pend}), flush=True)

    for n in WIDTHS:
        o, d, keys = rays_at(n)
        o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
        tcap2 = jnp.where(alive2, jnp.inf, 0.0)
        run(f"bounce1_n{n}", (o2, d2, tcap2))

    for n in (WIDTHS[0], WIDTHS[-1]):
        o, d, _ = rays_at(n)
        tinf = jnp.full(n, jnp.inf, jnp.float32)
        run(f"primary_n{n}", (o, d, tinf))


if __name__ == "__main__":
    main()
