"""PACKET_LEAF_N re-tune under the multi-drain round structure.

Round 1 tuned the packet leaf size to 32 triangles per row when rounds
were strictly drain-1-per-round (fewer leaf visits == fewer rounds). The
tail multi-drain (traverse.py n_drains) weakens that coupling, and the
dense phase volume scales linearly with LN — so re-measure LN in
{32, 16, 8} on the c3 bounce-1 workload.

Prints one JSON line per (LN, probe).
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

from tpurt import bvh, camera as camera_mod
from tpurt import config, materials, render, rng, trace
from tpurt.kernels import traverse

N = int(_sys.argv[1]) if len(_sys.argv) > 1 else 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene_h, cam = config.build_scene(cfg)

    # original (unpadded) triangle soup for rebuilding the packet layout
    src = np.asarray(scene_h.tri_src)
    keep = src >= 0
    v0 = np.asarray(scene_h.tri_v0)[keep]
    e1 = np.asarray(scene_h.tri_e1)[keep]
    e2 = np.asarray(scene_h.tri_e2)[keep]
    tm = np.asarray(scene_h.tri_mat)[keep]

    scene = scene_h.device()

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

    old_ln = bvh.PACKET_LEAF_N
    try:
        for ln in (32, 16, 8):
            pk = bvh.build_packet(v0, v0 + e1, v0 + e2, tm, leaf_n=ln)
            bvh.PACKET_LEAF_N = ln   # traverse reads it at trace time
            s2 = scene_h._replace(pk_nodes=pk.nodes, pk_leaves=pk.leaves,
                                  pk8_nodes=None, pk8_leaves=None,
                                  pk8_cut=None,
                                  pk_cut=pk.cut).device()
            trav = jax.jit(lambda o, d, t, s2=s2: traverse.packet_nearest_tri(
                s2, o, d, t)[0])
            cnt = jax.jit(lambda o, d, t, s2=s2: traverse.packet_nearest_tri(
                s2, o, d, t, with_counters=True)[5:9])
            for name, (oo, dd, tt) in (("bounce1", (o2, d2, tcap2)),
                                       ("primary", (o, d, tinf))):
                sec = device_time_fused(trav, oo, dd, tt, iters=16)
                r, a, s_pp, s_pend = (int(x) for x in cnt(oo, dd, tt))
                print(json.dumps({
                    "probe": f"ln{ln}_{name}", "ms": round(sec * 1e3, 3),
                    "rounds": r, "sum_pp": s_pp, "sum_pending": s_pend,
                    "leaf_rows": int(pk.leaves.shape[0])}), flush=True)
    finally:
        bvh.PACKET_LEAF_N = old_ln


if __name__ == "__main__":
    main()
