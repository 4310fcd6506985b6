"""Bisect the megakernel bounce-loop overhead.

probe_floor.py showed one fused bounce body = ~3.7 ns/ray, yet the real
trace.trace while_loop measures ~19-52 ns/ray-bounce on the no-mesh scene.
This probe rebuilds the loop in layers to find where the gap lives:

  L0  fori_loop(8) over the bare bounce body, minimal carry
  L1  + radiance/atten/alive bookkeeping (full trace semantics, no RR)
  L2  + while_loop with any(alive) early-exit instead of fori
  L3  + packet-granular staged tail compaction (= trace.trace)
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]
import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import config, materials, rng, trace
from tpurt.geometry import INF

N = 131072
DEPTH = 8


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4,
                              scene="spheres_plane", mode="mega")
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    rs = np.random.default_rng(0)
    o = jnp.asarray(rs.uniform(-3, 3, (N, 3)), jnp.float32)
    d = jnp.asarray(rs.standard_normal((N, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jnp.arange(N, dtype=jnp.int32)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))

    def probe(name, fn, *args, iters=64):
        sec = device_time_fused(jax.jit(fn), *args, iters=iters)
        print(json.dumps({
            "probe": name, "us": round(sec * 1e6, 1),
            "ns_per_ray_bounce": round(sec / (N * DEPTH) * 1e9, 2)}))

    def body_core(o, d, atten, rad, alive, ks, bounce):
        h = trace.intersect(scene, o, d, t_cap=jnp.where(alive, INF, 0.0))
        live_hit = alive & h.ok
        live_miss = alive & ~h.ok
        rad = rad + jnp.where(live_miss[:, None],
                              atten * trace.sky(scene, d), 0.0)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        rad = rad + jnp.where(live_hit[:, None], atten * mp[:, 4:7], 0.0)
        draws = rng.bounce_draws(ks, bounce)
        p = o + h.t[:, None] * d
        new_d, att, s_alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        atten = jnp.where(live_hit[:, None], atten * att, atten)
        alive = live_hit & s_alive
        o = jnp.where(live_hit[:, None], p, o)
        d = jnp.where(live_hit[:, None], new_d, d)
        return o, d, atten, rad, alive

    def l0(o, d, ks):
        n = o.shape[0]
        init = (o, d, jnp.ones((n, 3), jnp.float32),
                jnp.zeros((n, 3), jnp.float32), jnp.ones(n, bool))

        def body(i, c):
            return body_core(*c, ks, i)

        return jax.lax.fori_loop(0, DEPTH, body, init)[3]

    probe("L0_fori_minimal", l0, o, d, keys)

    def l2(o, d, ks):
        n = o.shape[0]
        init = (jnp.int32(0), o, d, jnp.ones((n, 3), jnp.float32),
                jnp.zeros((n, 3), jnp.float32), jnp.ones(n, bool))

        def cond(c):
            return (c[0] < DEPTH) & jnp.any(c[5])

        def body(c):
            i, o, d, atten, rad, alive = c
            return (i + 1,) + body_core(o, d, atten, rad, alive, ks, i)

        return jax.lax.while_loop(cond, body, init)[4]

    probe("L2_while_earlyexit", l2, o, d, keys)

    tr = partial(trace.trace, max_depth=DEPTH)
    probe("L3_trace_trace", lambda o, d, k: tr(scene, o, d, k)[0],
          o, d, keys, iters=32)


if __name__ == "__main__":
    main()
