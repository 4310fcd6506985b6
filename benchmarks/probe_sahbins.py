"""SAH bin count: does a finer-binned tree shorten the straggler walk?

The round-3 device profile pinned the frame to kernel count x real
execution, and every reschedule conserves it; the one lever that
reduces the count is the straggler packet's WALK (rounds = walk/ADV,
drains track leaf visits). Tree QUALITY is the only walk knob left
un-probed: SAH_BINS has been 16 since round 1, and builds are now cheap
enough (native/sah.cpp takes the bin count as a parameter) to afford
finer splits.

Grid: bins in {16, 32, 64} on the 524k STRIDED ray set, primary +
bounce-1, with round counters.

MEASURED (TPU v5e via axon relay, 2026-08-18, device_time_fused,
524288 strided rays):

    bins    bounce-1 ms / rounds / drains      primary ms / rounds
     16       33.64 / 169 / 100450  [prod]       5.32 / 32
     32       33.44 / 169 /  99373               5.30 / 32
     64       33.76 / 173 /  99665               5.17 / 31

VERDICT: REFUTED — 16 bins stays. The blob's near-uniform triangle
distribution means SAH-16 already finds near-optimal splits: 32 bins
moves bounce-1 by -0.6% (noise) with rounds UNCHANGED, and 64 is
slightly worse. With schedules, layouts, packet/leaf sizes, fanout and
now split quality all at measured optima, the straggler walk itself is
saturated for this scene class — tree-quality gains would need a
different algorithm class (spatial splits on overlap-heavy scenes),
not a finer knob.
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
BINS = [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 \
    else [16, 32, 64]


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
    pix_all = np.tile(order_full, 4)
    smp_all = np.repeat(np.arange(4, dtype=np.int32), order_full.size)
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

    old_bins = bvh.SAH_BINS
    try:
        for bins in BINS:
            bvh.SAH_BINS = bins
            pk = bvh.build_packet(v0, v0 + e1, v0 + e2, tm)
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
                    "probe": f"bins{bins}_{name}",
                    "ms": round(sec * 1e3, 3), "rounds": r,
                    "sum_pp": s_pp, "sum_row_drains": s_pend,
                    "nodes": int(pk.nodes.shape[0])}), flush=True)
    finally:
        bvh.SAH_BINS = old_bins


if __name__ == "__main__":
    main()
