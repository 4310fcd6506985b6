"""Stage-graded ADV_STEPS: deepen phase A only where latency gates.

probe_advdrain refuted a GLOBAL ADV raise: rounds fall as walk/ADV but
total phase-A volume sum_pp*ADV is invariant — the extra steps run
masked on not-yet-compacted widths and wall rises. That grid shared one
ADV across every compaction stage. But the per-stage width pp is STATIC
(run_stages), and at tail widths (pp <= 64..256 packets) a round is
pinned to its ~25 us latency floor regardless of volume — there, extra
node steps per round are nearly free and round-count cuts are pure win.
DRAIN_N is already graded this way; ADV was not.

Grid: (ADV_MID for pp <= DRAIN2_MAX=256, ADV_TAIL for pp <= DRAIN4_MAX
= 64), full-width stages stay at the tuned ADV_STEPS=8. Workload =
probe_advdrain's: c3 blob bounce-1, 131072 divergent post-bounce rays
(baseline 10.49 ms, 124 rounds), then the full 8-bounce megakernel at
524288 for the winning point (the deep-bounce tail — 29-104 rounds per
late bounce at tail widths, BASELINE.md — is where grading should pay
most).

Byte-exactness: ADV only changes WHEN leaves drain, not enqueue order
(FIFO rings, DFS order per cursor); winners resolve by strict < against
t_best in pop order, so goldens are unaffected (same argument as the
batched drains, traverse.drain_batch docstring).

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused):

    bounce-1 @131k       ms    rounds  sum_adv_steps  sum_pp
      mid8  tail8      10.48    124        992        32208   [baseline]
      mid8  tail16     10.68    114       1200        31760
      mid8  tail32     14.92    111       1680        31616
      mid12 tail24     13.17    103       1476        30464
      mid16 tail32     15.07    101       1832        30064
      mid16 tail48     16.48    100       2264        30032
    full megakernel @524k      ms    ns/primary
      mid8  tail8            53.11     101.3         [baseline]
      mid8  tail32           63.38     120.9
      mid12 tail24           60.01     114.5
      mid16 tail32           63.65     121.4

VERDICT: REFUTED, and the mechanism is now precise — there is no
"latency floor" that extra phase-A steps hide under, because each
phase-A step IS a serial dependence link (gather -> slab -> select,
~2-4 us): a round's latency is proportional to its ADV depth, so the
thing wall time tracks is TOTAL LINKS = sum over rounds of
(ADV_stage + drain/bookkeeping links). Grading the tail cuts rounds
(124 -> 100) but RAISES total adv links (992 -> 2264: walks don't
shorten; the extra steps run masked on straggler packets that already
stalled on full rings) — wall follows the links, up 57%. ADV_STEPS=8
balances per-round fixed links against step links and the round-2
global tune already found that optimum; the graded knobs stay at 8
(= OFF). Together with probe_advdrain this closes scheduling for good:
round count is NOT a cost in itself — serialized link count is, and it
is conserved by every reschedule.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path[:0] = [str(Path(__file__).resolve().parent.parent),
                str(Path(__file__).resolve().parent)]

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import camera as camera_mod, config, materials, render, rng, trace
from tpurt.kernels import traverse

N = 131072
NFULL = 524288


def rays_at(cfg, cam, n):
    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (n // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: n // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(n, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)
    return o, d, keys


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    o, d, keys = rays_at(cfg, cam, N)

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

    def run_b1(name):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, o2, d2, tcap2, iters=16)
        cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t, with_counters=True)[5:9])
        r, a, s_pp, s_pend = (int(x) for x in cnt(o2, d2, tcap2))
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3),
                          "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                          "sum_row_drains": s_pend}), flush=True)

    for mid, tail in [(8, 8), (8, 16), (8, 32), (12, 24), (16, 32),
                      (16, 48)]:
        traverse.ADV_MID, traverse.ADV_TAIL = mid, tail
        run_b1(f"b1_mid{mid}_tail{tail}")

    # full megakernel at the winning grade vs baseline
    of, df, kf = rays_at(cfg, cam, NFULL)
    for mid, tail in [(8, 8), (8, 32), (12, 24), (16, 32)]:
        traverse.ADV_MID, traverse.ADV_TAIL = mid, tail
        jax.clear_caches()
        fn = jax.jit(lambda o, d, k: trace.trace(scene, o, d, k, 8)[0])
        sec = device_time_fused(fn, of, df, kf, iters=4)
        print(json.dumps({"probe": f"fullmega_mid{mid}_tail{tail}",
                          "ms": round(sec * 1e3, 2),
                          "ns_per_primary": round(sec / NFULL * 1e9, 1)}),
              flush=True)
    traverse.ADV_MID = traverse.ADV_TAIL = 8


if __name__ == "__main__":
    main()
