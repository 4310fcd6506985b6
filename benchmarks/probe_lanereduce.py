"""How expensive is a cross-lane reduction, really?

The leaf-size probe showed the traversal's per-packet-round cost is
independent of LN — the dense MT volume is NOT the driver. The remaining
per-round suspect is the 12 (pp,128) -> (pp,) LANE reductions (slab_any's
jnp.any over axis=-1): cross-lane reduces are the slow reduction pattern
on TPU. Measure, at traversal-realistic shapes:

  * jnp.any(x, -1)                       (the current pattern)
  * jnp.max(x_f32, -1) > 0               (arithmetic lane reduce)
  * (x_f32 @ ones(128)) > 0              (MXU dot-reduce; MXU is idle)
  * a chain of 12 of each, serialized    (the per-round reality)

Prints one JSON line per probe.
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


def main() -> None:
    rs = np.random.default_rng(0)
    for pp in (1024, 128):
        x = jnp.asarray(rs.standard_normal((pp, 128)), jnp.float32)
        ones = jnp.ones((128,), jnp.float32)

        def t(name, fn, *args, iters=512):
            sec = device_time_fused(jax.jit(fn), *args, iters=iters)
            print(json.dumps({
                "probe": f"{name}_pp{pp}", "us": round(sec * 1e6, 2),
                "ns_per_row": round(sec / pp * 1e9, 2)}), flush=True)

        t("any", lambda x: jnp.any(x > 0, axis=-1).astype(jnp.float32)
          .sum(keepdims=True), x)
        t("maxred", lambda x: (jnp.max(x, axis=-1) > 0).astype(jnp.float32)
          .sum(keepdims=True), x)
        t("dotred", lambda x: ((jnp.maximum(x, 0.0) @ ones) > 0)
          .astype(jnp.float32).sum(keepdims=True), x)

        def chain(redu):
            def f(x):
                acc = jnp.zeros((), jnp.float32)
                y = x
                for _ in range(12):
                    r = redu(y)                  # (pp,)
                    acc = acc + r.sum()
                    y = y + r[:, None] * 1e-9    # serialize
                return acc[None]
            return f

        t("chain12_any",
          chain(lambda y: jnp.any(y > 0, -1).astype(jnp.float32)), x,
          iters=128)
        t("chain12_dotred",
          chain(lambda y: (jnp.maximum(y, 0.0) @ ones)), x, iters=128)


if __name__ == "__main__":
    main()
