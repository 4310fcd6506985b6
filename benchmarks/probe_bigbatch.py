"""Big ray batches x deeper traversal stage ladders (round 4).

probe_batchscale.py confirmed the per-batch link term amortizes with N
(bounce-1 46.9 ns/ray at 512k, optimum) but found 1M TURNS: sum_pp
jumps 2.6x because the stage ladder's caps are RELATIVE (p//2 ..
p//2^STAGE_MAX) — at 2x the batch the tail dwells at 2x the widths.
probe_stagecaps.py refuted deeper ladders at 128k/512k (each stage is a
real fixed cost: one more while_loop + compaction gather + cond chain),
but the two results together leave the obvious corner unprobed: BIG
batches WITH a ladder deep enough to reach the same absolute tail
widths 512k enjoys. If the batchscale diagnosis is right, 1M/2M +
STAGE_MAX 8/10 should recover the relative-cap losses and push ns/ray
below 46.9 — the first end-to-end lever on the fresh-bounce share
since the batch bump itself.

Grid: N in {512k, 1M, 2M} x STAGE_MAX in {6 (baseline), 8, 10} on the
c3 bounce-1 workload + primaries at the winner. device_time_fused wall
+ round counters; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, TPU v5e via axon relay, post-fusion-surgery):

    bounce-1 ns/ray (rounds):
        N        SM=6          SM=8          SM=10
      524288   53.6 (161)    52.2 (161)    53.0 (161)
     1048576   50.2 (197)    49.3 (188)    49.4 (188)
     2097152   49.1 (212)    48.5 (206)    48.2 (206)
    primaries: 8.62 ns/ray at 512k/SM6, 8.16 at 1M/SM8.

VERDICT: the round-3 "1M turns" result is GONE post-surgery — ns/ray
now falls monotonically with N (the surgery cut the per-round kernel
cost, so the relative-cap dwell that used to eat the amortization no
longer dominates; sum_pp still grows 129k->259k->527k but each unit is
cheaper). Deeper ladders are a consistent but small ~1-2% (rounds
197->188 at 1M). Absolute gains over 512k are ~7-9% ISOLATED — and the
round-3 adoption caveat applies unchanged (the deep-bounce tail is
round-floor-bound; probe_batchscale's end-to-end test showed fresh-
bounce amortization compresses only ~1/3 of the frame). Superseded in
priority by cross-batch tail coalescing (render._accum_frame_coalesced,
probe_tailcoalesce.py), which attacks the same per-batch floor without
widening any live array; re-audition ray_batch=1M + SM=8 only AFTER the
coalesced frame is the baseline (probe_tailcoalesce grid).

END-TO-END ADOPTION TEST (2026-08-18, after coalescing was itself
refuted; c3 contract preset at 16 spp, 2 timed passes each, 512k
brackets both sides):

    512k           7.943  [bracket 2: 7.987]
    ~922k (1M cap) 7.669          sm8: 7.672
    ~1.84M sm8     7.711

VERDICT: REFUTED end-to-end, same shape as round 3's adoption test —
the isolated bounce-1 win does not survive the full frame (the
deep-bounce tail is round-floor-bound and pays the wider arrays'
volume; probe_tailcoalesce measured the general law). ray_batch stays
1 << 19 and STAGE_MAX stays 6.
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

WIDTHS = (524288, 1048576, 2097152)
STAGE_MAXES = (6, 8, 10)


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

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
                          "stage_max": traverse.STAGE_MAX,
                          "ms": round(sec * 1e3, 3),
                          "ns_per_ray": round(sec / n * 1e9, 2),
                          "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                          "sum_pending": s_pend}), flush=True)

    old_sm = traverse.STAGE_MAX
    try:
        for n in WIDTHS:
            o, d, keys = rays_at(n)
            o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
            tcap2 = jnp.where(alive2, jnp.inf, 0.0)
            for sm in STAGE_MAXES:
                traverse.STAGE_MAX = sm
                run(f"bounce1_n{n}_sm{sm}", (o2, d2, tcap2))
        traverse.STAGE_MAX = old_sm
        o, d, _ = rays_at(WIDTHS[0])
        run(f"primary_n{WIDTHS[0]}_sm{old_sm}",
            (o, d, jnp.full(WIDTHS[0], jnp.inf, jnp.float32)))
        traverse.STAGE_MAX = 8
        o, d, _ = rays_at(1048576)
        run("primary_n1048576_sm8",
            (o, d, jnp.full(1048576, jnp.inf, jnp.float32)))
    finally:
        traverse.STAGE_MAX = old_sm


if __name__ == "__main__":
    main()
