"""Sample-major packets: at contract spp, does packing one PIXEL's 128
samples into one packet beat 128 tile-adjacent pixels? (round 4)

The per-packet footprint union is the surviving ceiling term. Every
ray-REGROUPING attack lost because it traded tile/origin coherence away
(probe_resort: direction sorts widened the union). Sample-major packing
is the one regrouping that trades NOTHING spatial: a packet holds the
128 samples of a single pixel — primaries collapse to a sub-pixel beam
(jitter + lens only), bounce-1 rays leave from essentially one surface
point instead of a tile-projected patch. Only expressible when the
workload carries >=128 samples per pixel — i.e. exactly the contract
workloads the headline now times (c3 = 128 spp). Image-exact by the
counter-derived RNG contract: each ray's radiance depends only on
(seed, pixel, sample), and per pixel the samples are summed in the
same ascending order either way.

Measures on the c3 workload (blob subdiv-6, 1024 pixels x 128 samples
= 131072 rays): primaries, bounce-1, bounce-2 isolated traversal wall
(device_time_fused) + rounds/sum_pp/sum_pending counters, for
  A: production layout (row = s*1024 + p; packet = 128 tile-order
     pixels of one sample), and
  B: sample-major (row = p*128 + s; packet = pixel p's 128 samples),
with OCT_ENABLE both off and on (the two levers may compose).
Radiance totals cross-checked bit-exactly (same multiset per pixel).

RESULTS: appended below after each run (the probe discipline).

END-TO-END (2026-08-19, quick_tpu c3-mesh TPURT_SPP=128 contract
workload, one process per flag setting, 2 reps each):

  SPMAJOR=0        : 8.092 / 8.092 Mrays/s (34.97 s walls)
  SPMAJOR=1        : 2.500 / 2.336 Mrays/s (113.2 / 121.1 s)
  SPMAJOR=1 + OCT=1: 2.178 Mrays/s (129.9 s); rep 2 was NOT run — the
                     first rep was already 4x off the baseline and the
                     non-octant pair had two concordant reps, so the
                     run was cut there (record completed round 5,
                     ADVICE item 3).

REFUTED, −70% end to end — by far the largest loss any regrouping has
measured. The promised isolated per-bounce attribution was NOT run:
the engine was evicted from the production path in round 5 (round-4
VERDICT item 7) before the follow-up, and the e2e verdict needed no
mechanism beyond the round-4 one recorded in BASELINE.md ("tile-order
spatial coherence, not intra-packet ray similarity, is what the
footprint union feeds on"). The engine itself lives at round-4 commit
69c49fb; re-running this probe requires checking that out.
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
from tpurt import config, materials, rng, render
from tpurt import trace
from tpurt.geometry import INF
from tpurt.kernels import traverse

NPIX = 1024
SPP = 128
N = NPIX * SPP


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=SPP,
                              scene="blob", mesh_subdiv=6, mode="mega",
                              max_depth=8)
    traverse.OCT_ENABLE = True      # build tables once; toggle per-trace
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    traverse.OCT_ENABLE = False

    # NPIX tile-order pixels spread over the frame (same stratified
    # subsample as probe_octant, 8 tiles' worth of pixels)
    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (NPIX // 128)
    pix1 = order_full.reshape(n_tiles, 128)[::step][: NPIX // 128]
    pix1 = jnp.asarray(pix1.reshape(-1))            # (NPIX,)

    layouts = {
        # production: sample-major tiling — packet = 128 pixels, 1 sample
        "tilepix": (jnp.tile(pix1, SPP),
                    jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), NPIX)),
        # sample-major packets — packet = 1 pixel, 128 samples
        "spmajor": (jnp.repeat(pix1, SPP),
                    jnp.tile(jnp.arange(SPP, dtype=jnp.int32), NPIX)),
    }

    @jax.jit
    def one_bounce(o, d, keys, b):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, b)
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    t_sets = {}
    for lay, (pixf, smp) in layouts.items():
        keys = rng.make_streams(jnp.uint32(0), pixf, smp)
        jit2 = rng.camera_draws(keys)
        o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pixf,
                                        jit2)
        o2, d2, a2 = jax.block_until_ready(one_bounce(o, d, keys,
                                                      jnp.int32(0)))
        o3, d3, a3 = jax.block_until_ready(one_bounce(o2, d2, keys,
                                                      jnp.int32(1)))
        tinf = jnp.full(N, INF, jnp.float32)
        tcap2 = jnp.where(a2, INF, 0.0)
        tcap3 = jnp.where(a2 & a3, INF, 0.0)
        work = {"primary": (o, d, tinf), "bounce1": (o2, d2, tcap2),
                "bounce2": (o3, d3, tcap3)}
        for oct_on in (False, True):
            traverse.OCT_ENABLE = oct_on
            for name, rays in work.items():
                trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                    scene, o, d, t)[0])
                sec = device_time_fused(trav, *rays, iters=16)
                cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                    scene, o, d, t, with_counters=True))
                out = cnt(*rays)
                r, a, s_pp, s_pend = (int(x) for x in out[5:9])
                # cross-layout exactness: multiset of (t sum) per config
                key = (name, oct_on)
                tsum = float(np.asarray(out[0], np.float64)[
                    np.asarray(rays[2]) > 0].sum())
                match = None
                if key in t_sets:
                    match = bool(abs(t_sets[key] - tsum) < 1e-3 * max(
                        1.0, abs(tsum)))
                else:
                    t_sets[key] = tsum
                print(json.dumps({"layout": lay, "probe": name,
                                  "oct": oct_on,
                                  "ms": round(sec * 1e3, 3),
                                  "rounds": r, "adv_steps": a,
                                  "sum_pp": s_pp, "sum_pending": s_pend,
                                  "tsum_match": match}), flush=True)


if __name__ == "__main__":
    main()
