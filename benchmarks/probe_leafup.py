"""PACKET_LEAF_N upward re-tune under the round-3 links regime.

probe_leafsize (round 2) measured LN in {32, 16, 8} — smaller leaves —
and found 32 best. Since then the cost model inverted: wall tracks the
straggler packet's walk length (rounds x serialized links,
probe_advstage), while dense MT volume is near-free at tail widths and
only ~25% of bounce-1 at full width. BIGGER leaves make a SHALLOWER
tree: leaf count /2 per doubling, walks shorten, rounds fall — paying
dense volume, which the regime says is the cheap currency.

Grid: LN in {32, 48, 64, 96} on the STRIDED 524k ray set (bench
protocol; the first-4096-tiles set is 3x cheap, probe_packetwidth),
primary + bounce-1, with round counters.

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused,
524288 strided rays):

    LN     bounce-1 ms / rounds / Mpairs     primary ms / rounds
    32       33.60 / 169 / 411  [prod]         5.24 / 32
    48       37.26 / 156 / 576                 4.91 / 25   (-6%)
    64       40.82 / 144 / 734                 5.30 / 20
    96       46.68 / 129 / 1012                6.21 / 18

(Mpairs = sum_row_drains x LN x 128 lanes — the dense MT volume.)

VERDICT: REFUTED for the bench workloads — LN stays 32. Rounds do fall
with bigger leaves (169 -> 129) but on DIVERGENT bounce rays the dense
volume is the larger term at full width: at 524k strided, bounce-1's
411 Mpairs already cost ~7.8 ms of its 33.6 (53 Gpairs/s roofline), and
every LN step grows pairs faster than it cuts link cost. On COHERENT
primaries LN=48 wins 6% (dense volume per ray is tiny there), but no
bench config traces BVH primaries alone, and a per-entry dual layout
would double HBM and compile. Model refinement recorded: the round-2
"dense volume is free" held at 131k on the cheap ray set; at the 512k
strided batch the bounce-1 dense share is ~25-40%, so volume and links
are now the SAME order — neither is a free currency.

DOWNWARD rows (same protocol): LN=24 bounce-1 31.96 ms / 181 rounds,
primary 5.27 (neutral); LN=16 bounce-1 31.72 / 206 rounds, primary
5.65 (+8%). LN=24 was then ADOPTION-TESTED end-to-end and LOST: quick
c3 6.18-6.28 at LN=24 vs 6.25 at LN=32 on the same build
(within noise, i.e. the isolated 5% bounce-1 win does not survive the
full kernel — deep-bounce tails are round/link-bound and pay 24's +7%
rounds without collecting its volume saving). 32 stands. General
lesson recorded in CLAUDE.md: isolated-kernel wins must be re-measured
end-to-end before adoption.
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

from tpurt import bvh, camera as camera_mod, config, render, rng, trace

N = 524288
SIZES = [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 \
    else [32, 48, 64, 96]


def main() -> None:
    from tpurt.kernels import traverse

    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene_h, cam = config.build_scene(cfg)
    src = np.asarray(scene_h.tri_src)
    keep = src >= 0
    v0 = np.asarray(scene_h.tri_v0)[keep]
    e1 = np.asarray(scene_h.tri_e1)[keep]
    e2 = np.asarray(scene_h.tri_e2)[keep]
    tm = np.asarray(scene_h.tri_mat)[keep]
    scene = scene_h.device()

    order_full = np.asarray(render.tile_order(cfg.width, cfg.height))
    npix = order_full.size
    pix_all = np.tile(order_full, 4)
    smp_all = np.repeat(np.arange(4, dtype=np.int32), npix)
    n_tiles = pix_all.size // 128
    step = n_tiles // (N // 128)
    sel = np.arange(n_tiles)[::step][: N // 128]
    pix = jnp.asarray(pix_all.reshape(n_tiles, 128)[sel].reshape(-1))
    smp = jnp.asarray(smp_all.reshape(n_tiles, 128)[sel].reshape(-1))
    keys = rng.make_streams(jnp.uint32(0), pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def one_bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        nd, _, alive = trace.materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)
    tinf = jnp.full(N, jnp.inf, jnp.float32)

    old_ln = bvh.PACKET_LEAF_N
    try:
        for ln in SIZES:
            pk = bvh.build_packet(v0, v0 + e1, v0 + e2, tm, leaf_n=ln)
            bvh.PACKET_LEAF_N = ln   # traverse reads it at trace time
            s2 = scene_h._replace(pk_nodes=pk.nodes, pk_leaves=pk.leaves,
                                  pk8_nodes=None, pk8_leaves=None,
                                  pk8_cut=None, pk_cut=pk.cut).device()
            trav = jax.jit(lambda o, d, t, s2=s2: traverse.packet_nearest_tri(
                s2, o, d, t)[0])
            cnt = jax.jit(lambda o, d, t, s2=s2: traverse.packet_nearest_tri(
                s2, o, d, t, with_counters=True)[5:9])
            for name, (oo, dd, tt) in (("bounce1", (o2, d2, tcap2)),
                                       ("primary", (o, d, tinf))):
                sec = device_time_fused(trav, oo, dd, tt, iters=8)
                r, a, s_pp, s_pend = (int(x) for x in cnt(oo, dd, tt))
                print(json.dumps({
                    "probe": f"ln{ln}_{name}", "ms": round(sec * 1e3, 3),
                    "rounds": r, "sum_pp": s_pp, "sum_row_drains": s_pend,
                    "leaf_rows": int(pk.leaves.shape[0]),
                    "nodes": int(pk.nodes.shape[0])}), flush=True)
    finally:
        bvh.PACKET_LEAF_N = old_ln


if __name__ == "__main__":
    main()
