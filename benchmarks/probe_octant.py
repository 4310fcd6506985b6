"""Octant-ordered (front-to-back) packet traversal — does per-packet
direction-adapted child order shrink the footprint union? (round 4)

The ceiling model's surviving term is the per-packet footprint union —
the node/leaf volume a packet actually walks. Every RESCHEDULING of
that volume is refuted (probe_advstage's conservation law), and every
ray-REGROUPING attack lost to tile order (probe_resort). This probe
attacks the union itself from the remaining side: the t windows. The
production CIP flatten descends left-first regardless of ray direction,
so ~half of all descents visit the FAR child first and pay its subtree
before the near hit tightens t_best. bvh.build_packet(octants=True)
emits 8 re-flattens of the SAME topology where the L slots always hold
the near child by the node's SAH split axis for that direction-sign
octant; each packet walks the table of its majority-sign octant
(kernels.traverse.OCT_ENABLE). Exactness: closest-hit is
order-independent (strict < on both the slab t window and MT), so only
exact f32 t-ties can differ.

History this extends: round-1's octant layouts lost under the old
one-box-per-row PER-RAY design and were deleted (bvh.PacketBVH
docstring); round-2's probe_resort refuted direction SORTING (it trades
tile/origin coherence away, widening the union). Neither measured
per-packet table SELECTION under CIP + per-round drains, where t_best
tightens every round.

Measures on the c3 workload (blob subdiv-6, 81920 tris, 131072 rays):
primaries, bounce-1, bounce-2 — isolated wall (device_time_fused) +
rounds/adv/sum_pp counters, OFF vs ON, plus a gid-match cross-check.

RESULTS (two full runs, 2026-08-18, c3 blob subdiv-6, 131072 rays;
identical counter values both runs, walls within relay noise):

  row      | oct=false ms | oct=true ms | rounds     | sum_pp
  primary  | 1.616/1.751  | 1.226/1.287 | 24 -> 17   | 3904 -> 2784
  bounce1  | 9.551/9.643  | 9.038/9.092 | 124 -> 115 | 32208 -> 29760
  bounce2  | 6.824/6.779  | 6.372/6.356 | 102 -> 81  | 22192 -> 21584

gid_match = 1.0 on every row (bit-exact winners, as argued above).
Scene build: the logged 1.6-1.9 s -> 6.3-9.8 s delta was HOST
CONTENTION (concurrent sessions), not emit cost — re-measured idle:
all 8 emits cumulative 0.37 s via cProfile on an 81920-tri soup
(0.046 s/table), full blob build 4.4 s base vs 3.6 s oct (noise).
No native emit needed. VERDICT: the first
probe in three rounds that shrinks the footprint-union volume integral
itself — fewer rounds AND fewer node visits (sum_pp) at unchanged array
widths, winning −24%/−5.4%/−6.4% isolated. End-to-end c3 adoption
decision appended below per the CLAUDE.md protocol.

END-TO-END ADOPTION (2026-08-19, quick_tpu c3-mesh, TPURT_SPP=128
contract workload, one process per flag setting, 2 reps each):

  OCT=0: 8.092 / 8.092 Mrays/s   (walls 34.966 / 34.963 s)
  OCT=1: 8.281 / 8.284 Mrays/s   (walls 34.166 / 34.156 s)

+2.35%, exactly reproducible across reps — ADOPTED
(kernels.traverse.OCT_ENABLE = True). The e2e share is smaller than
the isolated wins because the deep-bounce tail's wall is its ROUND
floor at narrow widths (BASELINE.md ceiling model), where octant's
sum_pp cut buys less; rays_cast moved 282936300 -> 282936301 (one
exact f32 t-tie winner flipped one path's RR stream — the documented
exactness boundary; films stay bit-identical on every pinned test).
Composition with SPMAJOR measured in probe_spmajor.py (both lose —
the loss is SPMAJOR's own).

Build-cost delta (round-4 ADVICE item 2, measured 2026-08-19 on this
host): the 7 extra Python _emit_table re-flattens cost +0.10 s at the
c3 scale (81,920 tris, Mi=3695 inner rows; base build 0.21 s ->
octants 0.31 s), and the node-table upload is 8x Mi x 64 B = 1.9 MB
(halved to 0.95 MB by bf16 packing, probe_bf16.py). Both are per-
scene-build one-offs ~1000x below a single c3 frame's wall; native
emission is not warranted at this scale.
"""

from __future__ import annotations

import sys as _sys
import time
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
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    t0 = time.time()
    traverse.OCT_ENABLE = True  # build the tables once; toggle per-trace
    scene, cam = config.build_scene(cfg)
    build_oct = time.time() - t0
    traverse.OCT_ENABLE = False
    t0 = time.time()
    config.build_scene(cfg)
    build_base = time.time() - t0
    scene = scene.device()
    print(json.dumps({"build_s_base": round(build_base, 2),
                      "build_s_oct": round(build_oct, 2),
                      "mi": int(scene.pk_nodes.shape[0])}), flush=True)

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

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

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys,
                                                      jnp.int32(0)))
    o3, d3, alive3 = jax.block_until_ready(one_bounce(o2, d2, keys,
                                                      jnp.int32(1)))
    # t_max contract is geometry.INF (3e38), matching trace.intersect —
    # jnp.inf lets an all-miss drain "win" at t=INF with a drain-order-
    # dependent garbage gid (found stays comparable, t stays bit-equal,
    # but the gid cross-check below would false-alarm)
    from tpurt.geometry import INF
    tcap2 = jnp.where(alive2, INF, 0.0)
    tcap3 = jnp.where(alive2 & alive3, INF, 0.0)
    tinf = jnp.full(N, INF, jnp.float32)

    work = {"primary": (o, d, tinf), "bounce1": (o2, d2, tcap2),
            "bounce2": (o3, d3, tcap3)}
    gids = {}
    for oct_on in (False, True):
        traverse.OCT_ENABLE = oct_on
        for name, rays in work.items():
            trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                scene, o, d, t)[0])
            sec = device_time_fused(trav, *rays, iters=16)
            cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
                scene, o, d, t, with_counters=True))
            out = cnt(*rays)
            gid = np.asarray(out[4])
            r, a, s_pp, s_pend = (int(x) for x in out[5:9])
            match = None
            if oct_on:
                match = float((gid == gids[name]).mean())
            else:
                gids[name] = gid
            print(json.dumps({"probe": name, "oct": oct_on,
                              "ms": round(sec * 1e3, 3),
                              "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                              "sum_pending": s_pend,
                              "gid_match": match}), flush=True)


if __name__ == "__main__":
    main()
