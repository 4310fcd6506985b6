"""Measure the per-bounce coherence-resort trade with trustworthy timing.

Round 1 rejected per-bounce ray resorting using a ~9 ns/row permute
estimate; device_time_fused now measures narrow gathers at ~1.2-1.6
ns/row, so re-decide with data:

  1. cost of the resort itself (key + argsort + permute of the bounce
     carry) at 131k rays;
  2. packet traversal time on bounce-1 rays AS-IS vs RESORTED — the
     coherence win it buys.

MEASURED (TPU v5e, c3 blob scene, 131072 bounce-1 rays):

    resort_cost             0.891 ms   (cheap — the round-1 ~15 ms
                                        estimate was dispatch floor)
    traverse_bounce1_asis  10.236 ms   236 rounds / 1416 adv steps
    traverse_bounce1_sorted 11.647 ms  320 rounds / 1920 adv steps
    traverse_primary        1.645 ms    52 rounds /  312 adv steps

Verdict: the resort LOSES even though it is nearly free — pixel-tile
order already groups rays by origin; sorting by the (octant, cell)
coherence key trades origin locality for direction locality and WIDENS
the per-packet node-set union (+36% rounds). Resort stays off
(trace.render_pixels default) and the 8-octant layouts stay deleted.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import config, materials, render, rng, trace
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    from tpurt import camera as camera_mod
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
    print(json.dumps({"probe": "live_bounce1", "live": int(alive2.sum())}))

    def probe(name, fn, *args, iters=32):
        sec = device_time_fused(jax.jit(fn), *args, iters=iters)
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3)}))

    # 1. resort cost: key + argsort + permute the full bounce carry
    #    (o, d, atten, rad, slot, alive + 3-row keys)
    def resort(o, d, tcap, keys, variant="octant"):
        key = trace.ray_coherence_key(scene, o, d, tcap > 0, variant)
        orderi = jnp.argsort(key, stable=True)
        return (o[orderi], d[orderi], tcap[orderi], keys[:, orderi],
                orderi)

    probe("resort_cost", lambda o, d, t, k: resort(o, d, t, k)[0],
          o2, d2, tcap2, keys)

    trav = jax.jit(
        lambda o, d, t: traverse.packet_nearest_tri(scene, o, d, t)[0])
    probe("traverse_bounce1_asis", trav, o2, d2, tcap2, iters=16)

    o3, d3, t3, _, _ = jax.block_until_ready(resort(o2, d2, tcap2, keys))
    probe("traverse_bounce1_sorted", trav, o3, d3, t3, iters=16)

    o4, d4, t4, _, _ = jax.block_until_ready(
        resort(o2, d2, tcap2, keys, "morton"))
    probe("traverse_bounce1_morton", trav, o4, d4, t4, iters=16)

    # primary for reference
    probe("traverse_primary", trav, o, d,
          jnp.full(N, jnp.inf, jnp.float32), iters=16)

    # counters: rounds with and without the resort
    cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t, with_counters=True)[5:9])
    for name, (oo, dd, tt) in [("rounds_asis", (o2, d2, tcap2)),
                               ("rounds_sorted", (o3, d3, t3)),
                               ("rounds_morton", (o4, d4, t4)),
                               ("rounds_primary",
                                (o, d, jnp.full(N, jnp.inf, jnp.float32)))]:
        r, a, s_pp, s_pend = (int(x) for x in cnt(oo, dd, tt))
        print(json.dumps({"probe": name, "rounds": r, "adv_steps": a,
                          "sum_pp": s_pp, "sum_pending": s_pend}))


if __name__ == "__main__":
    main()
