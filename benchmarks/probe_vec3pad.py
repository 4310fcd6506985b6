"""Is an (N,3) f32 array lane-padded (3 -> 128) in HBM on this TPU?

The traversal went scalar-SoA in round 1 precisely because trailing
dims < 128 pad to the lane tile inside hot loops (README: ~40x traffic
blowup measured on the packed traversal variant). But the BOUNCE loop
still carries o/d/atten/rad as (N,3) arrays through its while_loop, and
raygen/film work in (N,3) too. If those are stored padded, every bounce
body moves ~42x the useful bytes for its elementwise ops — a candidate
for the measured in-context inflation (probe_megadepth: bounce-1
marginal 43.3 ms vs 33.6 isolated).

Measures one elementwise pass (x*1.0000001 + 0.5, forced through HBM by
the timing chain) over the same 1.5M f32 payload in four shapes:
(524288,3), (3,524288), 3 separate (524288,) arrays, and (524288,128)
as the padded-traffic reference.

MEASURED (TPU v5e via axon relay, 2026-08-18, device_time_fused,
one multiply-add pass over 1.57M f32):

    (524288, 3)       19.3 us
    (3, 524288)       13.7 us
    3 x (524288,)     ~0 (below timer floor; XLA fuses the three passes)
    (16384, 96) ref    7.8 us

VERDICT: REFUTED — (N,3) is NOT lane-padded in HBM storage. 19.3 us for
a 12.6 MB read+write round trip is ~bandwidth for the TRUE payload
(819 GB/s -> 15 us); a 42x-padded store would have cost ~650 us. The
lane padding exists only in VREGs during compute (a ~1.4-2.5x
elementwise penalty vs transposed/SoA shapes, worth ~0.5 ms per c3
batch across the bounce loop's (N,3) ops — not the in-context
inflation, and not worth an SoA rewrite of the bounce loop). The
round-1 "40x" blowup was about (P,R,3)-shaped TRAVERSAL intermediates
inside the hot loop, where the compiler must materialize padded tiles
per node visit — a different regime, correctly fixed then by
scalar-SoA.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path[:0] = [str(Path(__file__).resolve().parent.parent),
                str(Path(__file__).resolve().parent)]

import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

N = 524288


def t(name, fn, *args, iters=128):
    import jax
    sec = device_time_fused(jax.jit(fn), *args, iters=iters)
    print(json.dumps({"probe": name, "us": round(sec * 1e6, 1)}),
          flush=True)


def main() -> None:
    rs = np.random.RandomState(0)
    a_n3 = jnp.asarray(rs.rand(N, 3).astype(np.float32))
    a_3n = jnp.asarray(rs.rand(3, N).astype(np.float32))
    ax = jnp.asarray(rs.rand(N).astype(np.float32))
    ay = jnp.asarray(rs.rand(N).astype(np.float32))
    az = jnp.asarray(rs.rand(N).astype(np.float32))
    a_pad = jnp.asarray(rs.rand(N // 32, 96).astype(np.float32))

    t("n3", lambda a: a * 1.0000001 + 0.5, a_n3)
    t("threeN", lambda a: a * 1.0000001 + 0.5, a_3n)
    t("soa", lambda x, y, z: (x * 1.0000001 + 0.5)
      + (y * 1.0000001 + 0.5) + (z * 1.0000001 + 0.5), ax, ay, az)
    t("same_payload_2d", lambda a: a * 1.0000001 + 0.5, a_pad)


if __name__ == "__main__":
    main()
