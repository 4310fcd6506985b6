"""Where does a c3 ray-bounce actually go? (round-2 throughput hunt)

Measures, on the real device at the c3 bench workload (blob subdiv-6,
131072-ray batches in tile order):

  * per-bounce BATCH state (live counts) by running the real bounce body;
  * traversal time per bounce entry (bounce 0..4) + its counters
    (rounds, adv steps, Σ array-packets, Σ pending packets);
  * the full bounce body (intersect + shade + RNG) per bounce, so
    (body - traversal) isolates the shading/bookkeeping overhead;
  * a component cost model from the measured unit rates
    (node gather 1.3 ns/row, leaf gather 4.4 ns/row, dense MT 53 Gpairs/s,
    slab ~72 flops/lane at 3.2 Tflop/s) to apportion traversal time.

Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
sys.path[:0] = [str(Path(__file__).resolve().parent.parent), str(Path(__file__).resolve().parent)]

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import camera as camera_mod
from tpurt import config, materials, render, rng, trace
from tpurt.bvh import PACKET_LEAF_N as LN
from tpurt.geometry import INF
from tpurt.kernels import traverse

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
ADV = traverse.ADV_STEPS

# measured unit rates (microbench/probe_dense, TPU v5e, round 2)
NS_NODE_ROW = 1.3
NS_LEAF_ROW = 4.4
GPAIRS_DENSE = 53.0
SLAB_FLOPS = 76          # 2 boxes x (12 fma + 6 minmax + cmp) per lane
TFLOPS_VPU = 3.2


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

    def bounce_body(o, d, alive, keys, bounce):
        h = trace.intersect(scene, o, d, t_cap=jnp.where(alive, INF, 0.0))
        live_hit = alive & h.ok
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, bounce)
        nd, _, s_alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return (jnp.where(live_hit[:, None], p, o),
                jnp.where(live_hit[:, None], nd, d),
                live_hit & s_alive)

    body_j = jax.jit(bounce_body, static_argnames="bounce")

    trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t)[0])
    cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t, with_counters=True)[5:9])

    states = []  # (bounce, o, d, alive)
    alive = jnp.ones(N, bool)
    oo, dd = o, d
    for b in range(5):
        states.append((b, oo, dd, alive))
        oo, dd, alive = jax.block_until_ready(body_j(oo, dd, alive, keys, b))

    for b, oo, dd, alive in states:
        live = int(alive.sum())
        tcap = jnp.where(alive, INF, 0.0)
        sec_t = device_time_fused(trav, oo, dd, tcap, iters=16)
        rounds, adv, s_pp, s_pend = (int(x) for x in cnt(oo, dd, tcap))

        sec_body = device_time_fused(
            jax.jit(lambda o, d, a, k: bounce_body(o, d, a, k, b)),
            oo, dd, alive, keys, iters=16)

        # component model (seconds)
        t_nodegather = adv / ADV * s_pp / rounds * ADV * NS_NODE_ROW * 1e-9 \
            if rounds else 0.0
        # each round: ADV node-gathers over pp rows + slab flops; 1 leaf
        # gather over pp rows; dense MT over pp*LN*128 pairs
        t_gather = s_pp * ADV * NS_NODE_ROW * 1e-9
        t_slab = s_pp * ADV * 128 * SLAB_FLOPS / (TFLOPS_VPU * 1e12)
        t_leafgather = s_pp * NS_LEAF_ROW * 1e-9
        t_dense = s_pp * LN * 128 / (GPAIRS_DENSE * 1e9)
        print(json.dumps({
            "probe": f"bounce{b}", "live": live,
            "trav_ms": round(sec_t * 1e3, 3),
            "body_ms": round(sec_body * 1e3, 3),
            "shade_ms": round((sec_body - sec_t) * 1e3, 3),
            "rounds": rounds, "adv_steps": adv,
            "sum_pp": s_pp, "sum_pending": s_pend,
            "pend_frac": round(s_pend / max(s_pp, 1), 3),
            "model_ms": {
                "node_gather": round(t_gather * 1e3, 3),
                "slab": round(t_slab * 1e3, 3),
                "leaf_gather": round(t_leafgather * 1e3, 3),
                "dense_mt": round(t_dense * 1e3, 3),
                "total": round((t_gather + t_slab + t_leafgather + t_dense)
                               * 1e3, 3),
            },
        }), flush=True)


if __name__ == "__main__":
    main()
