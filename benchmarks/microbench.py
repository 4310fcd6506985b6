"""Device-timing helpers for kernel benchmarking on the axon TPU relay.

Measured relay facts (see README "TPU performance notes"): a host-synced
dispatch costs ~27 ms and `block_until_ready` does not reliably block, so
naive per-call timing measures the sync floor, not the kernel. The only
reliable protocol is: CHAIN n dispatches through a data dependency, sync
once with a host fetch, divide by n.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]

import time

import jax
import jax.numpy as jnp


def device_time(fn, *args, iters: int = 10, reps: int = 3,
                chain=None) -> float:
    """Best-of-reps per-call seconds for fn(*args), compile excluded.

    fn must return a pytree whose first leaf is a float array. `chain`
    (optional) maps (prev_output, original_args) -> new_args to create the
    data dependency between iterations; the default perturbs the last arg
    by a zero-valued function of the previous output, which keeps inputs
    bit-identical while forcing sequential execution.
    """
    out = fn(*args)  # compile + warm
    leaves = jax.tree.leaves(out)
    float(jnp.asarray(leaves[0], jnp.float32).sum())

    if chain is None:
        def chain(out, args):
            z = jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).sum() * 0.0
            last = args[-1]
            if jnp.issubdtype(jnp.asarray(last).dtype, jnp.floating):
                return args[:-1] + (last + z,)
            return args[:-1] + (last + z.astype(last.dtype),)

    best = float("inf")
    for _ in range(reps):
        a = args
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            a = chain(out, args)
        float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def device_time_fused(fn, *args, iters: int = 256, reps: int = 5) -> float:
    """Per-call seconds via a two-point in-jit loop slope.

    The chained-dispatch protocol above can't resolve sub-millisecond
    kernels: this relay has a ~28-30 ms dispatch+sync floor, so per-call =
    total/iters is floor-dominated for any fast kernel. Here fn runs in a
    lax.fori_loop with a TRACED trip count (one compile), serialized
    through optimization_barrier (opaque to CSE) with a full-array
    reduction keeping outputs live; timing the same program at `iters` and
    `2*iters` and taking the slope cancels every constant overhead —
    dispatch, sync, argument upload — exactly.
    """
    def perturb(a, z):
        """Add an opaque zero to every float-array leaf: inputs now depend
        on the previous iteration's output, so XLA can neither hoist the
        loop-invariant fn call (LICM) nor fold the chain away."""
        done = False
        out = []
        for leaf in a:
            arr = jnp.asarray(leaf)
            if not done and jnp.issubdtype(arr.dtype, jnp.floating):
                out.append(arr + z.astype(arr.dtype))
                done = True
            else:
                out.append(leaf)
        return tuple(out)

    @jax.jit
    def run(n, a):
        def body(_, carry):
            acc, ar = carry
            out = fn(*ar)
            acc = acc + jnp.asarray(jax.tree.leaves(out)[0],
                                    jnp.float32).sum()
            # clip so an inf-valued accumulator (e.g. summed sentinel INFs)
            # can't turn the opaque zero into a value-changing NaN
            z = jax.lax.optimization_barrier(
                jnp.clip(acc, -1e30, 1e30) * 0.0)
            return acc, perturb(ar, z)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0), a))[0]

    float(run(jnp.int32(2), args))  # compile + warm
    lo = []
    hi = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.int32(iters), args))
        t1 = time.perf_counter()
        float(run(jnp.int32(2 * iters), args))
        t2 = time.perf_counter()
        lo.append(t1 - t0)
        hi.append(t2 - t1)
    lo.sort()
    hi.sort()
    return (hi[len(hi) // 2] - lo[len(lo) // 2]) / iters
