"""Mosaic slab-step kernel (kernels/slab.py) vs the XLA 2-kernel step.

The post-surgery census prices each adv step's slab at two kernels XLA
will not merge: slice_reduce (12 column relayouts, ~14% of stage-0
round cycles — survived the keepdim-slice attempt: XLA canonicalizes
the slice back and re-hoists the extraction) and or_reduce (~20%). The
Pallas step does extract + slab + reduce + meta decode in one launch.
This probe:

  1. cross-checks full-traversal outputs bit-exactly (flag off vs on)
     on the c3 bounce-1 ray set;
  2. times bounce-1 + primaries both ways (device_time_fused), plus
     the end-to-end c3 bench config both ways (quick_tpu protocol).

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, TPU v5e via axon relay):

    exact_match: true — the Mosaic step's traversal outputs are
    bit-identical to the XLA path (same slab expression tree; meta
    bitcasts in-kernel, the kernels/leaf.py pattern).
    bounce1:  9.511 (xla) -> 9.227 ms (slabk)   -3.0%
    primary:  1.686 (xla) -> 2.142 ms (slabk)  +27%
    c3 e2e:   7.498 (xla) vs 7.476 (slabk) Mrays/s — tie

VERDICT: NOT ADOPTED (tie end-to-end; SLABK_ENABLE stays False). The
fourth Pallas refutation here, and the most informative: the kernel
actually works (bit-exact, fuses extract+slab+reduce+meta into one
launch) yet buys only 3% on the deep-bounce workload — the
slice_reduce transpose it deletes is TRAFFIC, and the same sublane->
lane transposition now just happens inside Mosaic's output relayout.
On primaries (24 rounds, shallow walks) the per-launch overhead of a
grid'd pallas_call exceeds the two small XLA kernels it replaces.
Confirms the post-surgery model: per-step cost is layout/volume work,
not kernel-launch count — there is no remaining launch-latency fat in
phase A worth a custom kernel.
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, render, rng, trace
from tpurt.kernels import traverse

N = 131072


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
    tinf = jnp.full(N, jnp.inf, jnp.float32)

    def full(flag, rays):
        traverse.SLABK_ENABLE = flag
        fn = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t))
        out = jax.block_until_ready(fn(*rays))
        return [np.asarray(x) for x in out]

    a = full(False, (o2, d2, tcap2))
    b = full(True, (o2, d2, tcap2))
    ok = all(np.array_equal(x, y) for x, y in zip(a, b))
    print(json.dumps({"exact_match": bool(ok)}), flush=True)
    if not ok:
        for i, (x, y) in enumerate(zip(a, b)):
            if not np.array_equal(x, y):
                print(json.dumps({"mismatch_output": i,
                                  "n_diff": int((x != y).sum())}),
                      flush=True)
        return

    def run(name, rays, iters=16):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t)[0])
        sec = device_time_fused(trav, *rays, iters=iters)
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3)}),
              flush=True)

    for flag in (False, True):
        traverse.SLABK_ENABLE = flag
        tag = "slabk" if flag else "xla"
        run(f"bounce1_{tag}", (o2, d2, tcap2))
        run(f"primary_{tag}", (o, d, tinf))

    # end-to-end c3 both ways (quick_tpu protocol, 2 timed passes each)
    from bench_render import bench_config
    cfg3 = bench_config("c3-mesh")
    scene3, cam3 = config.build_scene(cfg3)
    scene3 = scene3.device()
    for flag in (False, True):
        traverse.SLABK_ENABLE = flag
        # the frame jit closes over the flag — clear or it reuses the
        # other variant's trace (same static args)
        render._accum_frame.clear_cache()
        film, _ = render.render_samples(cfg3, scene3, cam3, 0, 1)
        jax.block_until_ready(film)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            film, rays_n = render.render_samples(
                cfg3, scene3, cam3, 1, 1 + cfg3.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            walls.append(time.perf_counter() - t0)
        print(json.dumps({"probe": f"c3_{'slabk' if flag else 'xla'}",
                          "mrays_per_s": round(
                              rays_n / min(walls) / 1e6, 3),
                          "walls_s": [round(w, 3) for w in walls]}),
              flush=True)
    traverse.SLABK_ENABLE = False


if __name__ == "__main__":
    main()
