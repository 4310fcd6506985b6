"""Wide-fanout (8-ary) vs binary CIP traversal on the c3 workload.

Round-2 VERDICT item 1: rounds are bound by the serial
gather->slab->select chain (~2-4 us/link) and row gathers cost the same
nearly independent of width, so ONE 64-f32 row holding 8 child boxes
(bvh.PacketBVH8) should buy the same pruning with ~1/3 the advance steps
per round. This probe measures, on the exact c3 bounce-1 workload
(131072 post-bounce rays, blob subdiv=6, 81920 tris) and on primary
rays:

  * binary (pk8 stripped) vs wide, wall via device_time_fused + round /
    advance-step / array-packet counters;
  * an ADV_STEPS_WIDE sweep (the steps/round knob re-tuned for a tree
    ~1/3 the depth).

Run on the TPU; prints one JSON line per probe. Numbers + verdict are
appended below after each run (the round-2 probe discipline).

MEASURED (TPU v5e via axon relay, 2026-08-17, under the round-2 drain
regime D=(4,2,1) sequential — i.e. BEFORE drain batching):

    bounce-1 (131072 rays):         ms    rounds  adv_steps  sum_pp
      binary adv8                 10.23    124       992      32208
      wide   adv2                 12.47    170       340      46880
      wide   adv3                 12.40    128       384      37040
      wide   adv4                 12.84    111       444      32736
      wide   adv6                 15.29    103       618      29648
    primary:
      binary adv8                  1.75     24       192       3904
      wide   adv3                  2.08     26        78       4784

VERDICT on the round-2 hypothesis: REFUTED AS STATED — and that refutal
is the round's key measurement. Wide cut total advance steps 2.6x
(992 -> 384 at equal rounds) yet LOST 21% of wall: the serial-link
count is NOT the bound. (The first reading here blamed drain-gated
rounds; probe_drainbatch.py then falsified that too — rounds track the
straggler's WALK LENGTH once drains keep up, and the dense phase is
VPU-volume-bound. Wide's loss decomposes as: +50% box-test volume per
round (3x8 vs 8x2 boxes) and +15% sum_pp from its deeper leaf banking.)
CONSEQUENCE: attack rounds x volume, not links — see probe_drainbatch
and probe_advdrain for the follow-ups this measurement triggered.
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
                          "sum_pending": s_pend}), flush=True)

    traverse.WIDE_ENABLE = True   # wide runs use the pk8 arrays
    run("bounce1_binary_adv8", scene_bin, (o2, d2, tcap2))
    for adv in (2, 3, 4, 6):
        traverse.ADV_STEPS_WIDE = adv
        run(f"bounce1_wide_adv{adv}", scene, (o2, d2, tcap2))
    traverse.ADV_STEPS_WIDE = 3

    run("primary_binary_adv8", scene_bin, (o, d, tinf))
    run("primary_wide_adv3", scene, (o, d, tinf))
    traverse.WIDE_ENABLE = False


if __name__ == "__main__":
    main()
