"""Device-timing helpers for kernel benchmarking on the axon TPU relay.

Measured relay facts (see README "TPU performance notes"): a host-synced
dispatch costs ~27 ms and `block_until_ready` does not reliably block, so
naive per-call timing measures the sync floor, not the kernel. The only
reliable protocol is: CHAIN n dispatches through a data dependency, sync
once with a host fetch, divide by n.
"""

from __future__ import annotations

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
