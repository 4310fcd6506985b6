"""Ray-level stable liveness compaction for deep bounces.

probe_breakdown (round 3 rerun) shows the deep-bounce inefficiency:
bounce 2 has 28% of rays live but costs 71% of bounce-1 traversal;
bounce 3 has 15% live and still costs 60%. Live rays stay scattered
across all 1024 packets, so almost every packet keeps a live straggler
and the full-width walk persists (rounds 102-104 at every depth).

Round-2 rejected per-bounce ray REORDERING (coherence sorts WIDEN the
packet node-union — probe_resort.py) and noted (N,)-row permutes are
expensive. This probe tests the cheaper thing left: STABLE partition by
liveness only — relative order (and thus tile origin-coherence) is
preserved, dead rays just close ranks at the tail. Packets become
either mostly-live or all-dead; all-dead packets exit traversal after
one visit and the existing staged compaction collapses the array set.
Cost: gather o/d/t_cap into the partition order + scatter 7 hit outputs
back (~10 row-permute-class ops).

Measures plain vs compacted traversal on the REAL bounce-2/3/4 states
of the c3 workload (one jit each, permutes included in the compacted
timing).

MEASURED (TPU v5e via axon relay, 2026-08-17):

    bounce 2 (37k/131k live): plain 7.52 ms | compacted 11.83 ms
    bounce 3 (19k live):      plain 6.50 ms | compacted 11.81 ms
    bounce 4 ( 6k live):      plain 3.72 ms | compacted  9.51 ms

VERDICT: REFUTED, decisively — compaction LOSES 1.6-2.6x, and not
just on permute overhead: packing the survivors shrinks the packet
count but the packed packets mix rays from distant tiles (stable order
preserves tile SEQUENCE, not tile ADJACENCY, once most neighbors are
dead), so the per-packet node-set union widens and the walk lengthens —
the same mechanism that sank the octant/morton resorts
(probe_resort.py) and persistent regeneration (wavefront.py). The
repo-wide law this completes: PACKET MEMBERSHIP IS SACRED on this
architecture — every transformation that changes which rays share a
traversal cursor has lost to the tile order it replaced. Deep-bounce
cost stays bounded instead by packet-level staging (already in). This
closes the last c3 scheduling lever; see BASELINE.md "ceiling model".
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
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def bounce(o, d, keys, alive, b):
        h = trace.intersect(scene, o, d,
                            t_cap=jnp.where(alive, jnp.inf, 0.0))
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, b)
        nd, _, s_alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        alive2 = alive & h.ok & s_alive
        return (jnp.where(h.ok[:, None], p, o),
                jnp.where(h.ok[:, None], nd, d), alive2)

    states = {}
    alive = jnp.ones(N, bool)
    ob, db = o, d
    for b in range(4):
        ob, db, alive = bounce(ob, db, keys, alive, jnp.int32(b))
        states[b + 1] = (ob, db, alive)
    for k, (a, bb, al) in states.items():
        states[k] = jax.block_until_ready((a, bb, al))

    def plain(o, d, alive):
        tcap = jnp.where(alive, jnp.inf, 0.0)
        return traverse.packet_nearest_tri(scene, o, d, tcap)[0]

    def compacted(o, d, alive):
        ordr = jnp.argsort(~alive, stable=True)
        tcap = jnp.where(alive, jnp.inf, 0.0)
        t = traverse.packet_nearest_tri(
            scene, o[ordr], d[ordr], tcap[ordr])[0]
        return jnp.zeros_like(t).at[ordr].set(t)

    for b in (2, 3, 4):
        o_b, d_b, al_b = states[b]
        live = int(jnp.sum(al_b))
        for name, fn in (("plain", plain), ("compact", compacted)):
            sec = device_time_fused(jax.jit(fn), o_b, d_b, al_b, iters=16)
            print(json.dumps({
                "probe": f"b{b}_{name}", "live": live,
                "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
