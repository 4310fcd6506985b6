"""How much do XLA/TPU scatters cost vs gathers at the ladder's shapes?

probe_megadepth found a ~33 ms FIXED term in trace.trace at depth 1
(38.9 ms vs the 5.1 ms isolated bounce-0 body, 524k rays) — machinery
that runs once per trace regardless of depth. The only full-width ops
outside the bounce bodies are the stage-ladder merges
(`full.at[sel].set(sub)` row-scatters, trace._run + traverse.run_stages)
and the final radiance unshuffle `zeros.at[slot].set(rad)` — which at
the top level scatters 524k rows through an IDENTITY slot (the per-stage
merges already restored original order; slot only deviates under
resort). XLA cannot see that the indices are the identity, and TPU
scatter lowering is notoriously serial.

This probe times each data-movement primitive at the exact ladder
shapes, plus the gather-based rewrites that would replace them.

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused):

    ident_scatter_ray   524288x3 rows, identity idx    20.86 ms  <-- the fixed term
    perm_scatter_ray    524288x3 rows, packet perm     20.77 ms
    perm_inv_gather     same perm via row gather        2.29 ms  (9x cheaper)
    row_scatter_2048    2048 of 4096 x384f32 rows       0.014 ms (ladder merge: keep)
    row_gather_2048     same shape, gather              0.023 ms
    merge_where_gather  gather+where rewrite            0.032 ms (not worth it)
    film_add_524k       at[pix].add, tile-order pix    21.09 ms  <-- per wavefront commit
    film_add_seg        segment_sum formulation        21.12 ms  (same lowering)
    argsort_pk4096 / scalar_scatter4096: reported ~0 but INVALID —
      their operands are closure constants, so the timing loop LICM-
      hoisted them despite the accumulator sum; do not cite.

VERDICT: per-ROW granularity is everything on TPU scatter. A 524k-row
scatter costs ~21 ms (~40 ns/row) regardless of index pattern —
IDENTITY INCLUDED — and scatter-ADD (the film/segment_sum form) costs
the same; the equivalent row GATHER moves the same bytes 9x faster, and
4096-row scatters are ~1000x cheaper than per-ray ones. Fixes adopted:
(1) trace._run's final `zeros.at[slot].set(rad)` deleted on the staged
path (slot is the identity there — probe_megadepth found it as the
~34 ms depth-1 fixed term); (2) render._accum_frame's permute-out is
now a precomputed inverse-order gather; (3) the ladder merges stay
`at[sel].set` (packet-row granularity, ~0.01 ms); (4) wavefront's
per-commit segment_sum (~21 ms each, several per chunk) replaced by a
packet-row rad_out buffer in original queue order + the same
slice-add/inverse-gather film path as the megakernel.
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

from tpurt import render

N = 524288
PK = N // 128


def t(name, fn, *args, iters=16):
    sec = device_time_fused(jax.jit(fn), *args, iters=iters)
    print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3)}),
          flush=True)


def main() -> None:
    rs = np.random.RandomState(0)
    rad = jnp.asarray(rs.rand(N, 3).astype(np.float32))
    ident = jnp.arange(N, dtype=jnp.int32)
    # packet-block permutation like a (hypothetical) non-identity slot
    ppk = rs.permutation(PK).astype(np.int32)
    perm = jnp.asarray((ppk[:, None] * 128
                        + np.arange(128, dtype=np.int32)).reshape(-1))
    inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))

    t("ident_scatter_ray", lambda r: jnp.zeros_like(r).at[ident].set(r), rad)
    t("perm_scatter_ray", lambda r: jnp.zeros_like(r).at[perm].set(r), rad)
    t("perm_inv_gather", lambda r: r[inv], rad, iters=64)
    t("argsort_pk4096",
      lambda r: r.sum() + jnp.argsort(
          jnp.asarray(ppk), stable=True).sum().astype(jnp.float32),
      rad, iters=64)

    sel = jnp.asarray(np.sort(rs.permutation(PK)[:2048]).astype(np.int32))
    base = jnp.asarray(rs.rand(PK, 384).astype(np.float32))
    sub = jnp.asarray(rs.rand(2048, 384).astype(np.float32))
    t("row_scatter_2048", lambda b, s: b.at[sel].set(s), base, sub, iters=64)
    t("row_gather_2048", lambda b: b[sel], base, iters=64)

    def merge_where(b, s):
        in_sel = jnp.zeros(PK, bool).at[sel].set(True)
        pos = jnp.zeros(PK, jnp.int32).at[sel].set(
            jnp.arange(2048, dtype=jnp.int32))
        return jnp.where(in_sel[:, None], s[pos], b)
    t("merge_where_gather", merge_where, base, sub, iters=64)

    t("scalar_scatter4096",
      lambda r: r.sum() + jnp.zeros(PK, jnp.int32).at[sel[:PK]].set(
          jnp.arange(sel.shape[0], dtype=jnp.int32)).sum().astype(
              jnp.float32),
      rad, iters=64)

    # film accumulation exactly as _accum_frame does it (tile-order ids)
    order = np.asarray(render.tile_order(1280, 720))[:N]
    pix = jnp.asarray(order)
    film = jnp.zeros((1280 * 720, 3), jnp.float32)
    t("film_add_524k", lambda f, r: f.at[pix].add(r), film, rad)
    t("film_add_seg",
      lambda f, r: f + jax.ops.segment_sum(r, pix, num_segments=1280 * 720),
      film, rad)


if __name__ == "__main__":
    main()
