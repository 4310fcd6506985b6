"""Per-(bounce, stage) volume attribution of c3 traversals (round-5
VERDICT item 3, stage half; the bounce half at contract scale is
probe_bouncewall.py).

packet_nearest_tri(with_counters=True) now returns a STAGE LOG:
cumulative (rounds, Σpp) snapshots at every stage boundary of the
compaction ladder (tpurt/kernels/traverse.py run_stages). Diffing
consecutive entries attributes the traversal volume integral — the
quantity the round-3/4 conservation law says wall tracks — to each
array width, per bounce workload. Combined with the measured per-round
cost model (wall ≈ rounds x (floor + k x pp); floor and k fit from the
same data across bounces), this is the (bounce, stage) wall table the
round-4 verdict asked for, with no trace parsing.

Workloads: isolated bounce-0..4 traversals of a 512k c3 batch (the
contract frame's batch shape; survivor sets from the real material
chain, as probe_retune_oct.py).

MEASURED (TPU v5e via axon relay, 2026-08-19, device_time_fused,
shipped defaults, OCT_ENABLE=True; 512k batch, real survivor sets kept
IN PLACE in tile order — dead lanes t_cap=0, packet membership intact):

    workload  live    wall_ms  rounds  sum_pp   dominant stages
    bounce0   524288    3.451    16    13632    1024x5r, 4096x1r
    bounce1   398079    7.589    51    30208    1024x12r, 2048x4r, 64x20r
    bounce2    89182    4.878    44    17600    1024x6r, 512x8r, 64x19r
    bounce3    43426    4.756    51    15616    1024x5r, 64x30r
    bounce4     5258    3.420    41    10240    4096x1r, 64x30r

    cost fit: wall = rounds x 31.25 us + sum_pp x 201.65 ns
              (least squares over the 5 workloads, residuals <= 0.2 ms)

Observations the fit prices:
  * The width-64 tail stages of bounces 1-4 run 99 rounds = 3.1 ms of
    round floors against only 1.3 ms of volume — the narrow tail is
    latency-bound (the floor is ~8 ADV serial links/round), consistent
    with probe_advstage's links conservation law.
  * Every workload pays one full-width 4096 opening round (0.86 ms) —
    at bounce 4 (5258 live rays) that single round is 25% of the
    bounce. In PRODUCTION the bounce-stage ladder (trace._run) has
    already shrunk deep bounces below full width, so this is an
    entry-width artifact of the isolated protocol, not a frame cost.
  * The first draft's headline — "isolated traversal is ~24 of the
    frame's ~133 ms/batch, so an in-context multiplier owns the
    frame" — was REFUTED by probe_hostchain.py the same session: this
    probe's survivor sets are all derived from the BLOCK-0 batch (the
    first 512k pixels of tile order = the sky-heavy cheap half of the
    720p frame, 46.9-51.7 ms standalone), while the frame-average
    batch costs 137.5 ms; the gap is batch content, and the fori nest
    itself measures ZERO overhead (bit-exact tie vs host-chained
    dispatches). The per-round/per-pp cost FIT above is unaffected —
    it is internally consistent across its five workloads — but its
    absolute constants are calibrated on cheap-half content and the
    fused timer (quarantined at sub-10 ms nested-while granularity by
    probe_hostchain); treat them as lower-bound shape parameters, not
    frame-level prices.

VERDICT: the (bounce, stage) wall table is attributed (BASELINE.md
round-5 addendum); the conservation law holds within traversal AND —
after probe_hostchain's correction — still owns the frame. The
schedule itself is re-gridded end-to-end by probe_retune_oct.py.
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

N = 1 << 19   # the contract frame's BVH batch width


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    order_full = render.tile_order(cfg.width, cfg.height)
    npix = order_full.size
    reps = (N + npix - 1) // npix
    pix = jnp.asarray(
        jnp.tile(jnp.asarray(order_full), reps)[:N], jnp.int32)
    smp = jnp.repeat(jnp.arange(reps, dtype=jnp.int32), npix)[:N]
    keys = rng.make_streams(jnp.uint32(0), pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def one_bounce(o, d, keys, bounce):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, bounce)
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    workloads = {"bounce0": (o, d, jnp.full(N, jnp.inf))}
    oc, dc, alive = o, d, jnp.ones(N, bool)
    for b in range(4):
        oc, dc, ali = one_bounce(oc, dc, keys, jnp.int32(b))
        alive = alive & ali
        oc = jax.block_until_ready(oc)
        workloads[f"bounce{b + 1}"] = (oc, dc,
                                       jnp.where(alive, jnp.inf, 0.0))

    fit = []   # (rounds, sum_pp, wall_ms) per workload for the cost fit
    for name, rays in workloads.items():
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, *rays, iters=8, reps=3)
        cntf = jax.jit(
            lambda o, d, t: traverse.packet_nearest_tri(
                scene, o, d, t, with_counters=True)[5:])
        r, a, s_pp, s_pend, log = cntf(*rays)
        r, s_pp = int(r), int(s_pp)
        live = int(jnp.sum(rays[2] > 0))
        stages = []
        prev_r = prev_pp = 0
        for width, rc, ppc in log:
            rc, ppc = int(rc), int(ppc)
            stages.append({"width": int(width), "rounds": rc - prev_r,
                           "sum_pp": ppc - prev_pp})
            prev_r, prev_pp = rc, ppc
        fit.append((r, s_pp, sec * 1e3))
        print(json.dumps({"probe": name, "live_rays": live,
                          "wall_ms": round(sec * 1e3, 3),
                          "rounds": r, "sum_pp": s_pp,
                          "stages": stages}), flush=True)

    # per-round cost model wall = rounds*floor + k*sum_pp (least squares
    # over the measured workloads) -> per-stage wall attribution
    import numpy as np

    A = np.array([[r, pp] for r, pp, _ in fit], float)
    y = np.array([w for _, _, w in fit], float)
    (floor_ms, k_ms), *_ = np.linalg.lstsq(A, y, rcond=None)
    print(json.dumps({"probe": "cost_fit",
                      "round_floor_us": round(floor_ms * 1e3, 2),
                      "per_pp_ns": round(k_ms * 1e6, 2),
                      "residual_ms": [round(float(p - m), 3) for p, m in
                                      zip(A @ np.array([floor_ms, k_ms]),
                                          y)]}), flush=True)


if __name__ == "__main__":
    main()
