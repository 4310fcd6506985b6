"""Capture an XProf device trace of the bounce-1 packet traversal.

The component model explains ~4.5 ms of the measured ~10.2 ms bounce-1
traversal; per-round there is ~35 us the model cannot attribute. A device
trace answers what the op-level breakdown actually is.

Writes the trace under /tmp/tpurt-trace/; if the axon relay cannot
capture device events the trace will only contain host events — still
prints whatever .xplane/.trace files appear.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import glob
import json

import jax
import jax.numpy as jnp

from tpurt import camera as camera_mod
from tpurt import config, materials, render, rng, trace
from tpurt.kernels import traverse

N = 131072
OUT = "/tmp/tpurt-trace"


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def one_bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)

    trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t)[0])
    r = jax.block_until_ready(trav(o2, d2, tcap2))   # compile + warm
    del r

    with jax.profiler.trace(OUT):
        for _ in range(4):
            r = trav(o2, d2, tcap2)
        float(jnp.sum(r))

    files = sorted(glob.glob(OUT + "/**/*", recursive=True))
    print(json.dumps({"trace_files": files[-20:]}))


if __name__ == "__main__":
    main()
