"""Per-component timing of the non-traversal bounce-loop floor.

The c3 profile showed ~52 ns/ray-bounce even with NO mesh in the scene
(profile_c3.py trace_full_nomesh) — a hard ceiling of ~19 Mrays/s. This
probe times each bounce-loop component at 131k rays with the fused in-jit
protocol to find where those nanoseconds go.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import config, materials, rng, trace

N = 131072


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
    smp = jnp.zeros(N, jnp.int32)
    keys = rng.make_streams(jnp.uint32(0), pix, smp)

    def probe(name, fn, *args):
        sec = device_time_fused(jax.jit(fn), *args, iters=16)
        print(json.dumps({"probe": name, "us": round(sec * 1e6, 1),
                          "ns_per_ray": round(sec / N * 1e9, 2)}))

    probe("bounce_draws", lambda k: rng.bounce_draws(k, jnp.int32(2))[0],
          keys)
    probe("make_streams",
          lambda s, p, m: rng.make_streams(s, p, m)[0].astype(jnp.float32),
          jnp.uint32(0), pix, smp)

    h = trace.intersect(scene, o, d)
    draws = rng.bounce_draws(keys, jnp.int32(2))
    mp = scene.mat_packed[h.mat]
    mt = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)

    probe("scatter", lambda d, n, f, mt, alb, fz, ior, dr: materials.scatter(
        d, n, f, mt, alb, fz, ior, dr)[0],
        d, h.n, h.front, mt, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)

    probe("hit_spheres", lambda o, d, t: trace.geometry.hit_spheres(
        o, d, scene.sph_c, scene.sph_r, scene.sph_mat, t)[0],
        o, d, jnp.full(N, 3e38, jnp.float32))
    probe("hit_planes", lambda o, d, t: trace.geometry.hit_planes(
        o, d, scene.pln_n, scene.pln_k, scene.pln_mat, t)[0],
        o, d, jnp.full(N, 3e38, jnp.float32))
    probe("mat_gather", lambda m: scene.mat_packed[m], h.mat)
    probe("sky", lambda d: trace.sky(scene, d), d)

    # one full bounce body equivalent (intersect + shade + scatter)
    def bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mt = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(2))
        nd, att, al = materials.scatter(
            d, h.n, h.front, mt, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        return nd * att

    probe("full_bounce_nomesh", bounce, o, d, keys)


if __name__ == "__main__":
    main()
