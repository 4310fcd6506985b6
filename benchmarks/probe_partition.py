"""What does a 4096-element stable liveness argsort cost, and does the
cumsum stable-partition rewrite beat it?

Every tail-compaction ladder (traverse.run_stages, trace._run,
wavefront.step's per-bounce packet sort) selects live packets with
`argsort(dead_flag, stable=True)` — a variadic bitonic sort on TPU
(~78 serialized passes at 4096 elements). A stable partition computes
the same permutation with two cumsums + one tiny scalar scatter:

    pos  = where(live, cumsum(live)-1, n_live + cumsum(dead)-1)
    perm = zeros(n).at[pos].set(iota)        # n-element int32 scatter

which is EXACTLY argsort(~live, stable=True) (stable partition), so the
rewrite is byte-exact.

probe_scatter.py's argsort_pk4096/scalar_scatter4096 rows were
LICM-hoisted (constant operands) — this probe feeds the key from the
perturbed input so the op stays inside the timing loop.

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused):

    argsort_512        -6.0 us (below slope-timer noise floor)
    cumsum_part_512    16.4 us
    argsort_4096       38.4 us
    cumsum_part_4096  147.1 us

VERDICT: REFUTED — the ladder argsorts are already cheap (38 us at
4096; ~0.15 ms across all four bounce stages) and the cumsum rewrite
is 4x WORSE: its n-element `at[pos].set` scalar scatter alone outcosts
the whole bitonic sort. Keep `argsort(stable=True)` everywhere. The
~13 ms of depth-1 fixed cost that probe_scatter's 21 ms identity
scatter does not cover is NOT the argsorts — re-measure probe_megadepth
after the scatter fix to see what remains.
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

SIZES = (512, 4096)


def t(name, fn, *args, iters=64):
    sec = device_time_fused(jax.jit(fn), *args, iters=iters)
    print(json.dumps({"probe": name, "us": round(sec * 1e6, 2)}),
          flush=True)


def main() -> None:
    rs = np.random.RandomState(0)
    for n in SIZES:
        live0 = jnp.asarray(rs.rand(n) < 0.5)
        f0 = jnp.asarray(rs.rand(n).astype(np.float32))

        # key depends on the perturbed float input -> not hoistable
        def mklive(f):
            return live0 ^ (f[0] > 2.0)         # value-identical to live0

        def via_argsort(f):
            live = mklive(f)
            perm = jnp.argsort(~live, stable=True)
            return f[perm]

        def via_cumsum(f):
            live = mklive(f)
            nn = live.shape[0]
            cl = jnp.cumsum(live.astype(jnp.int32))
            cd = jnp.cumsum(1 - live.astype(jnp.int32))
            pos = jnp.where(live, cl - 1, cl[-1] + cd - 1)
            perm = jnp.zeros(nn, jnp.int32).at[pos].set(
                jnp.arange(nn, dtype=jnp.int32))
            return f[perm]

        # equivalence check once (exactness is the point)
        a = np.asarray(jax.jit(via_argsort)(f0))
        b = np.asarray(jax.jit(via_cumsum)(f0))
        assert (a == b).all(), "partition rewrite is not byte-exact!"

        t(f"argsort_{n}", via_argsort, f0)
        t(f"cumsum_part_{n}", via_cumsum, f0)


if __name__ == "__main__":
    main()
