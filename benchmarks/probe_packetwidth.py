"""PACKET_R 128 vs 256: fewer, wider cursors on the same tree.

The packet width was fixed at 128 (one lane tile) in round 1 and never
re-measured under the round-3 regime (keep-up drains, 512k batches,
walk-gated rounds). Doubling it halves the packet count — every
per-round O(pp) term (node gathers, slab flops, drain rows) halves at
full width — while the per-packet ray-union widens (more box hits, a
longer straggler walk, i.e. MORE rounds) and each dense drain covers
256 lanes (two lane tiles, same pairs/lane). Which side wins is a pure
measurement; packets are internal to packet_nearest_tri (the BVH layout
is packet-width independent, rays are padded/reshaped inside), so a
monkeypatch suffices.

Workload: c3 blob bounce-1 (divergent post-bounce rays) AND fresh
primaries, both at 524288 rays in STRIDED tile order (the bench ray
set — probe_megadepth's first-4096-tiles set measured 3x cheaper and
is not representative).

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused,
524288 STRIDED-tile rays):

    PACKET_R        primary ms / rounds     bounce-1 ms / rounds
      128 [prod]      5.30 / 32               33.55 / 169
      256             6.05 / 46               42.31 / 250
      512             8.48 / 57               64.51 / 357

VERDICT: REFUTED — 128 stands. Halving the packet count does halve the
per-round O(pp) volume (sum_pp 153k -> 136k -> 114k on bounce-1), but
the widened per-packet ray union lengthens the straggler walk so much
that ROUNDS rise 169 -> 250 -> 357, and per probe_advstage wall tracks
total serialized links ∝ rounds. Narrower packets (R=64) were not run:
the trend is monotone against width in this direction too — half-empty
128-lane tiles would double the effective dense volume per useful ray.
Also recorded: bounce-1 at 524k on the STRIDED (bench-representative)
ray set costs 33.5 ms — probe_megadepth's first-4096-tiles set (8.2 ms
isolated) is ~3x cheaper per ray; use strided sets for absolute
numbers.
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

from tpurt import camera as camera_mod, config, materials, render, rng, trace
from tpurt.kernels import traverse

N = 524288


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    # strided tile order over 4 samples (the bench protocol,
    # probe_stagecaps.rays_at)
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
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)
    tcap0 = jnp.full(N, jnp.inf, jnp.float32)

    for R in (128, 256, 512):
        traverse.PACKET_R = R
        for name, rays in (("primary", (o, d, tcap0)),
                           ("bounce1", (o2, d2, tcap2))):
            trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                scene, o, d, t)[0])
            sec = device_time_fused(trav, *rays, iters=8)
            cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                scene, o, d, t, with_counters=True)[5:9])
            r, a, s_pp, s_pend = (int(x) for x in cnt(*rays))
            print(json.dumps({"probe": f"{name}_R{R}",
                              "ms": round(sec * 1e3, 3), "rounds": r,
                              "sum_pp": s_pp, "sum_row_drains": s_pend}),
                  flush=True)
    traverse.PACKET_R = 128


if __name__ == "__main__":
    main()
