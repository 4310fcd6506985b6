"""Host-chained batch dispatches vs the one-dispatch fori nest (round 5).

probe_context.py ended round 4's ceiling model: the frame's cost is NOT
the traversal volume integral. Its decisive rows: bounce-1 traversal of
the real survivor set costs 7.59 ms inside a fori_loop (slope method —
constant overheads cancel EXACTLY) but <= 2.81 ms as 20 chained
dispatches synced once. Wrapping nested while_loops in an outer fori
multiplies their cost ~2.7x, and production wraps trace() (bounce while
+ ladder + traversal whiles) in _accum_frame's DOUBLE fori nest: the
contract frame pays 66.7 ms per 512k batch (34.15 s / 512) against
46.9 ms for standalone jit(trace) at depth 8 — itself fused-timer
inflated.

The one-dispatch design was adopted in round 2 on the measurement
"even fully async chained dispatches cost ~20-60 ms each" (c1: 12
dispatches = 0.96 s). probe_context's chained timer contradicts it for
same-executable pipelined calls (20 dispatches amortized to < 3 ms
each), so this probe re-litigates the structure at production shape,
with the film threaded through DONATED buffers:

  A. shipped path: render_samples (mega) at S samples — ONE dispatch,
     double fori nest (n_chunks x n_blocks), wall best-of-3.
  B. host-chained: the SAME batch body as one jit, (ci, bi) traced,
     film_tiled + nrays donated through the chain; Python enqueues all
     S x n_blocks calls async, one sync at the end. Bit-exact vs A
     (same op order) — asserted.
  C. hybrid: host loop over sample-chunks, on-device fori over the 4
     pixel blocks (one nesting level removed).
  D. standalone jit(trace) depth 8 on the block-0 batch, CHAINED timer
     (device_time) — the true per-batch floor with no outer loop at all
     (probe_context's 46.9 ms fused number for the same call was
     fused-timer inflated).

MEASURED (TPU v5e via axon relay, 2026-08-19, S=8 samples = 16 batches
of 512k at c3's 2-block frame, best-of-3 walls, shipped defaults
OCT_ENABLE=True):

    A one-dispatch nest   2.199 s   137.5 ms/batch
    B host-chained        2.170 s   135.6 ms/batch   max|diff| vs A = 0.0
    C hybrid              2.170 s   135.6 ms/batch   max|diff| vs A = 0.0
    D chained trace d8    51.7 ms/batch  (block-0 batch, no outer loop)

VERDICT: REFUTED — the fori nest costs nothing; A == B == C within
relay noise, bit-exact. Two findings replace the "in-context
multiplier" hypothesis:

  1. The ~3x gap between the frame's per-batch cost and probe_context's
     standalone numbers is CONTENT, not context. probe_context (and
     probe_stagewalls) measured the block-0/sample-0 batch — the first
     512k pixels of tile order, i.e. the sky-heavy top half of the
     720p frame. D re-times that same batch standalone-chained at
     51.7 ms (agreeing with the fused 46.9), while the frame-average
     batch is 137.5 ms: block 1 holds the blob and pays ~220 ms. The
     bouncewall marginals (full-frame, depth-differenced) were always
     the honest attribution; the isolated-vs-context "multiplier" was
     comparing the cheapest batch against the mean. The round-3/4
     conservation law (wall = volume integral over rounds x stage
     widths) OWNS the frame after all.
  2. The round-2 dispatch-floor measurement ("even fully async chained
     dispatches cost ~20-60 ms") no longer holds for same-executable
     donated calls: 16 chained step dispatches + 2 permutes timed
     IDENTICAL to one fused dispatch, so per-dispatch overhead is
     ~sub-ms now. One-dispatch-per-frame is vindicated as a design but
     no longer mandatory — long frames (c5's relay watchdog) could be
     host-chained at zero cost if span bounding ever becomes a burden.

Unexplained residue, quarantined: probe_context's trav_chained_ms=2.81
for the bounce-1 traversal (vs 7.59 fused) did NOT reproduce at trace
granularity — D reads chained 51.7 vs fused 46.9, i.e. the timers
AGREE (chained slightly higher, consistent with truth + sync-floor/8).
At sub-10 ms nested-while granularity the two protocols disagree 2.7x
in the direction no floor explains, and this probe closes the question
the only way that matters: whatever each timer reads there, the
STRUCTURE those readings implicated (the fori nest) is end-to-end
free. Treat BOTH timers as unresolved on sub-10 ms nested-while
kernels; adoption decisions stay with full-config walls (quick_tpu),
per the CLAUDE.md protocol.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time

from tpurt import camera as camera_mod
from tpurt import config, render, rng, trace

S = 8  # samples per timed frame pass (32 batches at c3 shape)


def main() -> None:
    cfg = config.PRESETS["c3-mesh"]
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    npix = cfg.width * cfg.height
    seed = jnp.uint32(cfg.seed)

    block = render.effective_ray_batch(cfg, scene)
    block = min(npix, block)
    block += (-block) % trace.PACKET_R
    order_pad, valid_pad, inv_order = render._order_pad_cached(
        cfg.width, cfg.height, block)
    n_blocks = order_pad.shape[0] // block
    c = 1  # c3's spp_chunk at 512k blocks

    # --- A: shipped one-dispatch nest -----------------------------------
    def run_a():
        film = jnp.zeros((npix, 3), jnp.float32)
        film, nrays = render.render_samples(cfg, scene, cam, 0, S,
                                            film_flat=film)
        jax.block_until_ready(film)
        return film, nrays

    film_a, nrays_a = run_a()  # compile + warm
    best_a = min(_wall(run_a) for _ in range(3))
    print(json.dumps({"probe": "A_nest", "wall_s": round(best_a, 3),
                      "ms_per_batch": round(best_a / (S * n_blocks) * 1e3,
                                            1)}), flush=True)

    # --- B: host-chained per-batch dispatches ---------------------------
    @partial(jax.jit,
             static_argnames=("width", "height", "max_depth", "rr_start",
                              "block", "c"),
             donate_argnames=("film_tiled", "nrays_acc"))
    def step(scene, cam, order_pad, valid_pad, film_tiled, nrays_acc,
             ci, bi, seed, width, height, max_depth, rr_start,
             block, c):
        sample_ids = ci * c + jnp.arange(c, dtype=jnp.int32)
        p0 = bi * block
        pix = jax.lax.dynamic_slice(order_pad, (p0,), (block,))
        valid = jax.lax.dynamic_slice(valid_pad, (p0,), (block,))
        pixf = jnp.tile(pix, c)
        validf = jnp.tile(valid, c)
        smp = jnp.repeat(sample_ids, block)
        keys = rng.make_streams(seed, pixf, smp)
        jit2 = rng.camera_draws(keys)
        o, d = camera_mod.generate_rays(cam, width, height, pixf, jit2)
        rad, nrays = trace.trace(scene, o, d, keys, max_depth, rr_start,
                                 valid=validf)
        rad = rad.reshape(c, block, 3).sum(axis=0)
        old = jax.lax.dynamic_slice(film_tiled, (p0, 0), (block, 3))
        film_tiled = jax.lax.dynamic_update_slice(
            film_tiled, old + rad, (p0, 0))
        return film_tiled, nrays_acc + nrays

    @jax.jit
    def permute_in(film_flat):
        return jnp.where(valid_pad[:, None], film_flat[order_pad], 0.0)

    @jax.jit
    def permute_out(film_tiled):
        return film_tiled[inv_order]

    def run_b():
        film_tiled = permute_in(jnp.zeros((npix, 3), jnp.float32))
        nrays = jnp.int32(0)
        for ci in range(S):
            for bi in range(n_blocks):
                film_tiled, nrays = step(
                    scene, cam, order_pad, valid_pad, film_tiled, nrays,
                    jnp.int32(ci), jnp.int32(bi), seed,
                    cfg.width, cfg.height, cfg.max_depth, cfg.rr_start,
                    block, c)
        film = permute_out(film_tiled)
        jax.block_until_ready(film)
        return film, nrays

    film_b, nrays_b = run_b()  # compile + warm
    assert int(nrays_b) == int(nrays_a), (int(nrays_b), int(nrays_a))
    diff = float(jnp.max(jnp.abs(film_b - film_a)))
    best_b = min(_wall(run_b) for _ in range(3))
    print(json.dumps({"probe": "B_hostchain", "wall_s": round(best_b, 3),
                      "ms_per_batch": round(best_b / (S * n_blocks) * 1e3,
                                            1),
                      "max_abs_diff_vs_A": diff}), flush=True)

    # --- C: hybrid (host over chunks, device fori over blocks) ----------
    @partial(jax.jit,
             static_argnames=("width", "height", "max_depth", "rr_start",
                              "block", "c", "n_blocks"),
             donate_argnames=("film_tiled", "nrays_acc"))
    def chunk_step(scene, cam, order_pad, valid_pad, film_tiled,
                   nrays_acc, ci, seed, width, height, max_depth,
                   rr_start, block, c, n_blocks):
        def body(bi, carry):
            ft, nr = carry
            return step.__wrapped__(scene, cam, order_pad, valid_pad,
                                    ft, nr, ci, bi, seed, width, height,
                                    max_depth, rr_start, block, c)
        return jax.lax.fori_loop(0, n_blocks, body,
                                 (film_tiled, nrays_acc))

    def run_c():
        film_tiled = permute_in(jnp.zeros((npix, 3), jnp.float32))
        nrays = jnp.int32(0)
        for ci in range(S):
            film_tiled, nrays = chunk_step(
                scene, cam, order_pad, valid_pad, film_tiled, nrays,
                jnp.int32(ci), seed, cfg.width, cfg.height,
                cfg.max_depth, cfg.rr_start, block, c, n_blocks)
        film = permute_out(film_tiled)
        jax.block_until_ready(film)
        return film, nrays

    film_c, _ = run_c()
    diff_c = float(jnp.max(jnp.abs(film_c - film_a)))
    best_c = min(_wall(run_c) for _ in range(3))
    print(json.dumps({"probe": "C_hybrid", "wall_s": round(best_c, 3),
                      "ms_per_batch": round(best_c / (S * n_blocks) * 1e3,
                                            1),
                      "max_abs_diff_vs_A": diff_c}), flush=True)

    # --- D: chained standalone trace at depth 8 (block-0 batch) ---------
    order = render.tile_order(cfg.width, cfg.height)[:block]
    pix = jnp.asarray(order)
    keys = rng.make_streams(seed, pix, jnp.zeros(block, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)
    fn = jax.jit(lambda o, d: trace.trace(
        scene, o, d, keys, cfg.max_depth, cfg.rr_start)[0])
    sec = device_time(fn, o, d, iters=8, reps=3)
    print(json.dumps({"probe": "D_trace_d8_chained",
                      "ms_per_batch": round(sec * 1e3, 1)}), flush=True)


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
