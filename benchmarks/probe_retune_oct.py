"""Traversal-schedule retune for the octant tree (round-5 VERDICT item 2).

Every schedule knob (ADV_STEPS=8, DRAIN_N=(4,2,1), MC_PACKETS=64) was
gridded in rounds 2-3 on the PRE-octant tree; octant (OCT_ENABLE=True
since round 4) changed the walk itself (primaries 24->17 rounds, node
visits 3904->2784). The round-3 conservation law says wall tracks the
volume integral, which octant CUT — so the joint optimum may have
moved. This re-grids the three knobs ON the octant tree over the three
workload shapes that span the frame: tile-ordered primaries (walk-
gated, full width), bounce-1 (divergent, full width), and bounce-2
survivors (narrow entry -> the MC_PACKETS/multi-cursor regime).

Protocol: device_time_fused per point, one process per grid (flags are
module globals read at trace time; each (knob, workload) retraces).
Grid is deliberately small — the law predicts flatness; we are testing
for a MOVED optimum, not rediscovering the surface.

RESULTS: pending (appended after the TPU run, per the probe
discipline).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, rng, trace
from tpurt import render
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    assert traverse.OCT_ENABLE, "retune targets the octant tree"
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
    def one_bounce(o, d, keys, bounce):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, bounce)
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    rays = {"primary": (o, d, jnp.full(N, jnp.inf))}
    oc, dc, alive = o, d, jnp.ones(N, bool)
    for b in range(3):
        oc, dc, ali = one_bounce(oc, dc, keys, jnp.int32(b))
        alive = alive & ali
        oc, dc = jax.block_until_ready(oc), jax.block_until_ready(dc)
        rays[f"bounce{b + 1}"] = (oc, dc,
                                  jnp.where(alive, jnp.inf, 0.0))
    live2 = int(jnp.sum(rays["bounce2"][2] > 0))
    live3 = int(jnp.sum(rays["bounce3"][2] > 0))
    print(json.dumps({"probe": "liveness",
                      "bounce2_live": live2, "bounce3_live": live3}),
          flush=True)

    def run(name, workload, iters=16):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, *rays[workload], iters=iters)
        print(json.dumps({"probe": name, "workload": workload,
                          "ms": round(sec * 1e3, 3)}), flush=True)

    # Every timed point is a fresh remote compile (~3-6 min through the
    # relay), so the grid is budgeted: the full 3-knob surface was
    # already mapped pre-octant (probe_advdrain/drainbatch/roundcost);
    # here only the points the octant walk-shortening could plausibly
    # move are re-audited, with adv8 (shipped) as the in-session
    # comparator on every workload.
    for adv, ws in ((8, ("primary", "bounce1", "bounce2")),
                    (10, ("primary", "bounce1", "bounce2")),
                    (6, ("bounce1",)), (12, ("bounce1",))):
        traverse.ADV_STEPS = traverse.ADV_MID = traverse.ADV_TAIL = adv
        for w in ws:
            run(f"adv{adv}", w)
    traverse.ADV_STEPS = traverse.ADV_MID = traverse.ADV_TAIL = 8

    traverse.DRAIN_N = (6, 3, 1)
    run("D6-3-1", "bounce1")
    traverse.DRAIN_N = (4, 2, 1)

    for mc in (64, 32, 128):
        traverse.MC_PACKETS = mc
        run(f"mc{mc}", "bounce3", iters=32)
    traverse.MC_PACKETS = 64


if __name__ == "__main__":
    main()
