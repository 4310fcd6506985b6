"""Breakdown of c3 (81920-tri BVH mesh) time: traversal vs leaf vs shading.

Prints one JSON object per probe. Protocol per microbench.device_time
(chained dispatches, one sync).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]
import json
from functools import partial

import jax
import jax.numpy as jnp

from tpurt import config, render, rng, trace
from tpurt import camera as camera_mod
from tpurt.kernels import traverse

from microbench import device_time


def main() -> None:
    cfg = config.RenderConfig(
        width=1280, height=720, spp=4, scene="blob", mesh_subdiv=6,
        mode="mega", max_depth=8, seed=0,
    )
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    n = 131072  # 1024 packets
    # Contiguous 128-ray tiles sampled evenly across the whole frame:
    # packet coherence is preserved (each 128-run is one 16x8 tile) while
    # the sample covers sky, mesh, and ground regions representatively.
    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles_total = order_full.size // 128
    step = n_tiles_total // (n // 128)
    tiles = order_full.reshape(n_tiles_total, 128)[::step][: n // 128]
    order = tiles.reshape(-1)
    pix = jnp.asarray(order)
    smp = jnp.zeros(n, jnp.int32)
    keys = rng.make_streams(jnp.uint32(0), pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)
    o, d = jax.block_until_ready((o, d))

    inf = jnp.full(n, jnp.inf, jnp.float32)

    trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(scene, o, d, t)[0])

    t_prim = device_time(trav, o, d, inf, iters=5)
    print(json.dumps({"probe": "traverse_primary_131k", "ms": round(t_prim * 1e3, 2),
                      "mrays_s": round(n / t_prim / 1e6, 1)}))

    # counters on primary rays
    cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t, with_counters=True)[5:7])
    r_out, r_adv = cnt(o, d, inf)
    print(json.dumps({"probe": "rounds_primary", "rounds": int(r_out),
                      "adv_steps": int(r_adv)}))

    # one-bounce scattered rays (divergent diffuse directions)
    @jax.jit
    def one_bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        from tpurt import materials
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)
    t_div = device_time(trav, o2, d2, tcap2, iters=5)
    print(json.dumps({"probe": "traverse_bounce1_131k", "ms": round(t_div * 1e3, 2),
                      "mrays_s": round(float(alive2.sum()) / t_div / 1e6, 1),
                      "live": int(alive2.sum())}))
    r_out, r_adv = cnt(o2, d2, tcap2)
    print(json.dumps({"probe": "rounds_bounce1", "rounds": int(r_out),
                      "adv_steps": int(r_adv)}))

    # full trace (8 bounces) on the same batch
    tr = jax.jit(partial(trace.trace, max_depth=8))
    t_full = device_time(lambda o, d, k: tr(scene, o, d, k)[0], o, d, keys,
                         iters=3)
    rad, nrays = tr(scene, o, d, keys)
    nrays = int(nrays)
    print(json.dumps({"probe": "trace_full_131k", "ms": round(t_full * 1e3, 2),
                      "rays": nrays,
                      "mrays_s": round(nrays / t_full / 1e6, 1)}))

    # shading-only estimate: full trace with a 5-sphere scene (trivial
    # intersect) — bounds the non-traversal share of the bounce loop
    cfg1 = config.RenderConfig(width=1280, height=720, spp=4,
                               scene="spheres_plane", mode="mega")
    scene1, cam1 = config.build_scene(cfg1)
    scene1 = scene1.device()
    t_shade = device_time(lambda o, d, k: tr(scene1, o, d, k)[0], o, d, keys,
                          iters=3)
    rad, nrays1 = tr(scene1, o, d, keys)
    print(json.dumps({"probe": "trace_full_nomesh_131k",
                      "ms": round(t_shade * 1e3, 2),
                      "rays": int(nrays1)}))


if __name__ == "__main__":
    main()
