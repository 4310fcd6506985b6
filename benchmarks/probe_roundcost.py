"""Isolate the per-round fixed cost of the packet traversal loop.

probe_resort/breakdown show ~25 us/round of cost the component model
(gathers + slab + dense MT) does not explain; at 500+ rounds that floor IS
the traversal time. Bisect it:

  1. one outer() round as a standalone jit at several widths -> per-round
     cost vs width (the model predicts ~17 us at pp=180, ~95 us at 1024);
  2. a while_loop with the SAME carry structure but a trivial body ->
     pure loop-iteration overhead (carry shuffling, cond eval);
  3. bounce-1 traversal with an (ADV_STEPS, LEAF_COMPACT_DIV) grid ->
     which knob actually moves wall time.

MEASURED (TPU v5e, c3 blob, 131072 bounce-1 rays, 2026-08-16):

    grid_adv6_div4   21.9 ms  521 rounds   <- compaction cap = drain-rate
    grid_adv6_div1   10.8 ms  228 rounds   <- best; == the original design
    grid_adv12_div1  15.3 ms  216 rounds   <- 2x adv steps, rounds ~flat!
    grid_adv12_div4  35.2 ms  531 rounds
    grid_adv18_div1  20.3 ms  215 rounds

Conclusions: (a) rounds are gated by the STRAGGLER packet's banked-leaf
backlog (1 drain/round), NOT by node-chain length — more ADV steps per
round don't cut rounds, they just add slab work; (b) pending-packet
compaction turns its cap into a drain-rate limit and inflates rounds;
(c) the fix that survived: drain SEVERAL ring entries per round at tail
widths (traverse.py n_drains), where the straggler lives and the dense
phase is cheap. LEAF_COMPACT_DIV was removed from traverse.py after this
measurement; the grid entries that reference it document why.

Run on the TPU; prints one JSON line per probe.
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
from tpurt import config, materials, render, rng, trace
from tpurt.geometry import INF
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

    # ---- 3. (ADV, DIV) grid on the full bounce-1 traversal ---------------
    for adv, div in ((6, 1),):
        traverse.ADV_STEPS = adv
        traverse.LEAF_COMPACT_DIV = div  # no-op since removal; kept for the record
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, o2, d2, tcap2, iters=16)
        cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t, with_counters=True)[5:9])
        r, a, s_pp, s_pend = (int(x) for x in cnt(o2, d2, tcap2))
        print(json.dumps({"probe": f"grid_adv{adv}_div{div}",
                          "ms": round(sec * 1e3, 3), "rounds": r,
                          "sum_pp": s_pp, "sum_pending": s_pend}),
              flush=True)
    traverse.ADV_STEPS = 6
    traverse.LEAF_COMPACT_DIV = 4  # no-op since removal

    # ---- 2. empty-body while_loop with the same carry shape --------------
    p = N // 128
    zf = jnp.zeros((p, 128), jnp.float32)
    zi = jnp.zeros(p, jnp.int32)
    carry = ((jnp.int32(0),)
             + tuple(zi for _ in range(8))
             + tuple(zf for _ in range(16))
             + (jnp.zeros((p, 128), bool),))

    def loop(n_iter, carry):
        def cond(c):
            return c[0] < n_iter

        def body(c):
            return (c[0] + 1,) + tuple(
                a + 1 if a.dtype != jnp.bool_ else a for a in c[1:])

        return jax.lax.while_loop(cond, body, carry)[1]

    def f(x):
        # build the carry from the (perturbable) scalar so
        # device_time_fused's input-perturbation protocol applies
        c = ((jnp.int32(0),)
             + tuple(zi for _ in range(8))
             + tuple(zf + x for _ in range(16))
             + (jnp.zeros((p, 128), bool),))
        return loop(jnp.int32(500), c)

    sec = device_time_fused(jax.jit(f), jnp.float32(0), iters=4)
    print(json.dumps({"probe": "empty_loop_500_full_carry",
                      "ms": round(sec * 1e3, 3),
                      "us_per_iter": round(sec / 500 * 1e6, 2)}), flush=True)

    # ---- 1. one outer round standalone at several widths -----------------
    # approximate: run packet_nearest_tri but with an end-bound that makes
    # every cursor exit after ~1 round (end=1 => nodes beyond row 1 are
    # clamped); instead simply time traversal of all-dead rays (1 round)
    # at several widths: the per-invocation fixed cost.
    for w in (131072, 32768, 8192):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, o2[:w], d2[:w],
                                jnp.zeros(w, jnp.float32), iters=32)
        print(json.dumps({"probe": f"dead_invocation_n{w}",
                          "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
