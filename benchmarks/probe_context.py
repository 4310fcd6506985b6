"""In-context vs isolated per-bounce cost of the c3 megakernel (round 5).

The round-5 contract-scale attribution exposed a gap no prior probe had
priced. probe_bouncewall.py (contract frame, depth-differenced): the
marginal cost of bounce 1 is 9.184 s / 256 batches = **35.9 ms per 512k
batch**. probe_stagewalls.py (same session): the ISOLATED traversal of
the real bounce-1 survivor set, in place in tile order at 512k, is
**7.6 ms** — and summing isolated traversal over bounces 0-4 gives only
~24 ms/batch against a 133 ms/batch frame. Either trace()'s loop
context (bounce while_loop + bounce-stage ladder wrapped around the
nested traversal while_loops, all inside _accum_frame's double
fori_loop) multiplies kernel cost by ~4x, or the isolated timings
understate the production distribution. Every prior "in-context
overhead" estimate (round 3: +29%) predates the fusion surgery + octant
— traversal got 3-4x cheaper and the context term did not, so whatever
it is, it now DOMINATES the frame.

Bisection, all on the exact production block-0 batch (first 512k pixels
of tile order, sample 0, 4096 packets, all lanes live):

  A. isolated traversal per bounce 0..3   (stagewalls re-check; bounce-1
     also cross-timed with the chained-dispatch timer to rule out a
     slope-method artifact)
  B. isolated FULL bounce body per bounce (intersect + sky/emissive
     accumulation + mat gather + scatter + RR + carry selects — every op
     of trace.body except the while/ladder machinery)
  C. standalone jit(trace.trace) at max_depth 1,2,3,8
       -> in-context marginal(b) = C(b+1) - C(b)
  D. trace.trace with stage_max=0 (bounce ladder OFF -> plain
     while_loop) at depths 1,2
  E. 2-bounce STRAIGHT-LINE body chain (no while_loop at all, same ops
     as two trace.body iterations) vs C(depth=2)

Reading the gaps: C-B per bounce is the total context multiplier;
D vs C separates the bounce-ladder's share from the while_loop's;
E vs C(2) separates while_loop carry/loop overhead from the ops
themselves (E keeps ALL the arithmetic including both traversals).

MEASURED (TPU v5e via axon relay, 2026-08-19, block-0 batch = first
512k pixels of tile order, sample 0; fused timer unless noted):

    iso_b0  trav  3.465  body  5.902      trace_d1        15.465
    iso_b1  trav  7.590  body 10.641      trace_d2        27.927
            (chained cross-check: 2.81)   trace_d3        34.011
    iso_b2  trav  4.855  body  7.507      trace_d8        46.899
    iso_b3  trav  5.248  body  7.471      trace_nostage_d1 7.331
                                          trace_nostage_d2 19.575
    (all ms per call)                     straightline_d2 17.123

VERDICT (settled by probe_hostchain.py, which this probe triggered):
the "~4x in-context multiplier" was CONTENT, not context. This probe's
block-0 batch is the sky-heavy cheap half of the 720p frame
(trace_d8 = 46.9-51.7 ms standalone on both timers), while the
frame-average batch costs 137.5 ms and probe_hostchain measured the
production fori nest at ZERO overhead vs host-chained dispatches
(bit-exact tie). The bouncewall marginals remain the honest frame
attribution. What this probe DID price, on block-0 content:

  * the bounce-stage ladder's fixed cost is ~8.1-8.35 ms/batch at
    depths 1-2 (trace_d1 15.47 vs nostage 7.33; d2 27.93 vs 19.58) —
    the ladder is pure overhead until the deep tail repays it, so its
    value is entirely a tail trade (re-gridded under octant by
    probe_retune_oct.py);
  * the bounce while_loop itself costs ~2.5 ms/batch at depth 2
    (nostage_d2 19.58 vs straightline 17.12) — small;
  * trav_chained 2.81 vs fused 7.59 on the same call is quarantined in
    probe_hostchain.py ("unexplained residue"): the two timers agree at
    trace granularity, disagree 2.7x at sub-10 ms nested-while
    granularity; neither is trusted there, full-config walls decide.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp

from microbench import device_time, device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, rng, trace
from tpurt import render
from tpurt.geometry import INF
from tpurt.kernels import traverse

N = 1 << 19


def main() -> None:
    cfg = config.PRESETS["c3-mesh"]
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    # production block-0 batch: first 512k pixels of tile order, sample 0
    order = render.tile_order(cfg.width, cfg.height)[:N]
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(cfg.seed), pix,
                            jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    def full_body(o, d, atten, rad, alive, bounce):
        """Every op of one trace.body iteration (sans while machinery)."""
        h = trace.intersect(scene, o, d, t_cap=jnp.where(alive, INF, 0.0))
        live_hit = alive & h.ok
        live_miss = alive & ~h.ok
        rad = rad + jnp.where(live_miss[:, None],
                              atten * trace.sky(scene, d), 0.0)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        rad = rad + jnp.where(live_hit[:, None], atten * mp[:, 4:7], 0.0)
        draws = rng.bounce_draws(keys, bounce)
        p = o + h.t[:, None] * d
        new_d, att, s_alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        atten = jnp.where(live_hit[:, None], atten * att, atten)
        alive = live_hit & s_alive
        o = jnp.where(live_hit[:, None], p, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        return o, d, atten, rad, alive

    # advance real states bounce by bounce
    states = []
    st = (o, d, jnp.ones((N, 3), jnp.float32), jnp.zeros((N, 3),
          jnp.float32), jnp.ones(N, bool))
    adv = jax.jit(full_body, static_argnames="bounce")
    for b in range(4):
        states.append((b, st))
        st = jax.block_until_ready(adv(*st, bounce=b))

    # A + B: isolated traversal and isolated full body per bounce
    for b, (oo, dd, atten, rad, alive) in states:
        tcap = jnp.where(alive, INF, 0.0)
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec_t = device_time_fused(trav, oo, dd, tcap, iters=8)
        body = jax.jit(lambda o, d, a, r, al: full_body(
            o, d, a, r, al, b)[3])
        sec_b = device_time_fused(body, oo, dd, atten, rad, alive, iters=8)
        row = {"probe": f"iso_b{b}", "live": int(alive.sum()),
               "trav_ms": round(sec_t * 1e3, 3),
               "body_ms": round(sec_b * 1e3, 3)}
        if b == 1:
            sec_x = device_time(trav, oo, dd, tcap, iters=20)
            row["trav_chained_ms"] = round(sec_x * 1e3, 3)
        print(json.dumps(row), flush=True)

    # C: standalone trace at increasing depth (in-context marginals)
    for depth in (1, 2, 3, 8):
        fn = jax.jit(lambda o, d: trace.trace(
            scene, o, d, keys, depth, cfg.rr_start)[0])
        sec = device_time_fused(fn, o, d, iters=(8 if depth <= 3 else 4))
        print(json.dumps({"probe": f"trace_d{depth}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    # D: bounce ladder disabled (plain while_loop)
    for depth in (1, 2):
        fn = jax.jit(lambda o, d: trace.trace(
            scene, o, d, keys, depth, cfg.rr_start, stage_max=0)[0])
        sec = device_time_fused(fn, o, d, iters=8)
        print(json.dumps({"probe": f"trace_nostage_d{depth}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    # E: straight-line 2-bounce chain (no while_loop)
    def two_bounces(o, d):
        st = (o, d, jnp.ones((N, 3), jnp.float32),
              jnp.zeros((N, 3), jnp.float32), jnp.ones(N, bool))
        st = full_body(*st, bounce=0)
        st = full_body(*st, bounce=1)
        return st[3]

    sec = device_time_fused(jax.jit(two_bounces), o, d, iters=8)
    print(json.dumps({"probe": "straightline_d2",
                      "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
