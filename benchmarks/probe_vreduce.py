"""Winner-block sweep consolidation: variadic reduce vs the 2-sweep idiom.

Post-fix census (dump_hlo.py, stage-0 round): the drain's winner block
is min+argmin (iota_reduce, 38% of round cycles, recomputes the MT
producer) + ONE merged one-hot payload select (select_reduce, 18% —
the round-4 fix merged the former f32/s32 pair). The only further
consolidation XLA cannot do by itself is ONE variadic reduce carrying
(t, idx, nx, ny, nz, mat, gid) in a single sweep — the combiner picks
lexicographic (t, idx)-min, payloads ride along. Exact same winner as
argmin-first (tie-break on smaller idx is associative), so goldens are
safe IF adopted.

Risk this probe prices: XLA TPU lowers multi-operand reduces with
non-standard combiners off the fast path (historically scalarized).
Shapes: the c3 drain at stage-0 — (P, dl, R) = (1024, 32, 128), t from
a fused cheap producer (the relative cost of the sweeps is the
signal; the MT producer is shared by both variants).

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, TPU v5e via axon relay):

    exact_match: true (winner + all payloads bit-identical)
    two_sweep: ~20 us (19.8-21.5 at iters 128/256; the iters=32 run
               read -7.9 us — below the chained-dispatch timer floor)
    one_sweep (variadic lax.reduce, 7 operands): 56.5 us

VERDICT: REFUTED, 2.8x slower. The multi-operand reduce with a
non-standard combiner leaves XLA:TPU's vectorized-reduction fast path
(the combiner is applied scalarized per element pair), exactly the
suspected failure mode. The 2-sweep idiom (fused min+argmin, then one
merged f32 one-hot payload select — the round-4 dtype-merge fix)
stands as the measured optimum for the drain winner block.
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

P, DL, R = 1024, 32, 128


def producer(a, b, c):
    """Stand-in for the fused MT t-computation: a few flops per
    (P, dl, R) element from small inputs, fusable into any consumer."""
    t = a[:, :, None] * b[:, None, :] + c[:, None, :]
    return jnp.where(t > 0.5, t, jnp.inf)


def main() -> None:
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.rand(P, DL).astype(np.float32))
    b = jnp.asarray(rs.rand(P, R).astype(np.float32))
    c = jnp.asarray(rs.rand(P, R).astype(np.float32))
    pnx = jnp.asarray(rs.rand(P, DL).astype(np.float32))
    pny = jnp.asarray(rs.rand(P, DL).astype(np.float32))
    pnz = jnp.asarray(rs.rand(P, DL).astype(np.float32))
    pm = jnp.asarray(rs.randint(0, 16, (P, DL)).astype(np.float32))
    pg = jnp.asarray(rs.randint(0, 81920, (P, DL)).astype(np.float32))

    @jax.jit
    def two_sweep(a, b, c):
        t = producer(a, b, c)
        tj = jnp.min(t, axis=1)
        j = jnp.argmin(t, axis=1)
        onehot = jnp.arange(DL)[None, :, None] == j[:, None, :]
        ohf = onehot.astype(jnp.float32)
        outs = [jnp.sum(p[:, :, None] * ohf, axis=1)
                for p in (pnx, pny, pnz, pm, pg)]
        return (tj, j, *outs)

    @jax.jit
    def one_sweep(a, b, c):
        t = producer(a, b, c)
        idx = jnp.broadcast_to(
            jnp.arange(DL, dtype=jnp.int32)[None, :, None], t.shape)

        def brd(p):
            return jnp.broadcast_to(p[:, :, None], t.shape)

        def comb(x, y):
            xt, xi, xa, xb2, xc2, xd, xe = x
            yt, yi, ya, yb2, yc2, yd, ye = y
            pick = (xt < yt) | ((xt == yt) & (xi <= yi))

            def s(u, v):
                return jnp.where(pick, u, v)

            return (s(xt, yt), s(xi, yi), s(xa, ya), s(xb2, yb2),
                    s(xc2, yc2), s(xd, yd), s(xe, ye))

        init = (jnp.float32(jnp.inf), jnp.int32(DL), jnp.float32(0),
                jnp.float32(0), jnp.float32(0), jnp.float32(0),
                jnp.float32(0))
        out = jax.lax.reduce(
            (t, idx, brd(pnx), brd(pny), brd(pnz), brd(pm), brd(pg)),
            init, comb, (1,))
        return out

    # correctness cross-check first
    r2 = jax.block_until_ready(two_sweep(a, b, c))
    r1 = jax.block_until_ready(one_sweep(a, b, c))
    ok = (np.allclose(r2[0], r1[0]) and np.array_equal(
        np.asarray(r2[1]), np.asarray(r1[1])))
    for k in range(5):
        ok &= np.array_equal(np.asarray(r2[2 + k]), np.asarray(r1[2 + k]))
    print(json.dumps({"exact_match": bool(ok)}), flush=True)

    for name, fn in (("two_sweep", two_sweep), ("one_sweep", one_sweep)):
        sec = device_time_fused(fn, a, b, c, iters=32)
        print(json.dumps({"probe": name, "us": round(sec * 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
