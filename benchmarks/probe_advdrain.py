"""(ADV_STEPS x DRAIN_N) grid under the round-3 walk-gated regime.

probe_drainbatch.py's negative result rewrote the round model AGAIN:
with keep-up drains, the round count is gated by the STRAGGLER PACKET'S
WALK LENGTH (binary ~990 node visits / ADV_STEPS = 124 rounds; extra
drain capacity leaves rounds unchanged and its dense volume is pure
loss — each additional full-width drain costs ~79 us = 250 MFLOP at
VPU f32 peak). Consequences tested here:

  1. MORE ADV_STEPS with drains that just keep up should cut rounds
     toward walk/ADV — trading per-round link+slab cost against the
     per-round fixed cost. (probe_roundcost's round-2 "adv12 doesn't
     cut rounds" verdict was measured under 1-drain rounds, where
     drains, not the walk, gated.)
  2. The WIDE layout's walk is 2.9x shorter (330 vs 990 visits,
     probe_fanout) — useless when drains gate, decisive if rounds =
     walk/ADV. Wide entries bank up to 8 leaf rows each, so wide needs
     deeper mid/tail drains to keep up.
  3. Full-width drains stay at D<=2: their volume is the VPU-bound
     dense floor.

MEASURED (TPU v5e via axon relay, 2026-08-17):

    binary:                          ms   rounds  adv_steps  sum_pp
      adv8  D4-2-1 [baseline]      10.49   124      992      32208
      adv12 D4-2-1                 11.32   106     1272      28272
      adv12 D8-4-1                 12.81   101     1212      26304
      adv16 D8-4-1                 13.76    90     1440      25312
      adv16 D8-4-2                 12.06    76     1216      16592
      adv24 D8-4-2                 15.65    68     1632      15168
    wide:
      adv4  D8-4-2                 14.13    86      344      23520
      adv6  D8-4-2                 13.30    66      396      18768
      adv8  D8-8-2                 14.03    54      432      15280

VERDICT: REFUTED — the entire grid loses to the baseline. Rounds DO
fall as walk/ADV predicts (124 -> 54) and sum_pp halves, yet wall only
rises: the counters show total phase-A op volume is INVARIANT
(sum_pp x ADV ~ 258k packet-steps at adv8 and 265k at adv16 — longer
rounds run more masked steps on not-yet-compacted widths) while bigger
D adds dense volume. Conclusion of the round-3 scheduling campaign
(fanout, drainbatch, advdrain): every schedule knob sits at the
measured joint optimum; the traversal cost is a volume integral that
scheduling only redistributes. Real gains must change the WORK or the
RATE: dense phase on the MXU (probe_mxudense.py) or tighter culling.
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
    for adv, dn in [(12, (4, 2, 1)), (12, (8, 4, 1)), (16, (8, 4, 1)),
                    (16, (8, 4, 2)), (24, (8, 4, 2))]:
        traverse.ADV_STEPS = adv
        traverse.DRAIN_N = dn
        run(f"b1_bin_adv{adv}_D{dn[0]}-{dn[1]}-{dn[2]}", scene_bin,
            (o2, d2, tcap2))
    traverse.ADV_STEPS = 8

    for adv, dn in [(4, (8, 4, 2)), (6, (8, 4, 2)), (6, (8, 8, 2)),
                    (8, (8, 8, 2))]:
        traverse.ADV_STEPS_WIDE = adv
        traverse.DRAIN_N = dn
        run(f"b1_wide_adv{adv}_D{dn[0]}-{dn[1]}-{dn[2]}", scene,
            (o2, d2, tcap2))
    traverse.ADV_STEPS_WIDE = 3
    traverse.DRAIN_N = (4, 2, 1)
    traverse.WIDE_ENABLE = False


if __name__ == "__main__":
    main()
