"""t_best seeding from the origin leaf — can a cheap local pre-test
shrink the bounce-ray footprint union? (round 5)

The speed-of-light table (BASELINE.md round-5) leaves exactly one axis
that moves the c3 ceiling: less WORK per ray. Octant cut the union by
ordering (near child first, t_best tightens sooner); this probes the
complementary cut by SEEDING: a bounce ray leaves a surface inside a
known leaf row (the previous winner's), and testing that row's
PACKET_LEAF_N triangles before traversal yields a real hit t whenever
local geometry occludes — a valid t_max that culls every subtree
farther than the seed from the very first round. Cost in production
would be one (N, 32)-wide MT per bounce (~0.16 ms per 512k batch at
the measured 53 Gpairs/s dense rate) plus a per-ray leaf-row gather
(gathers ~3-8 ns/row) — negligible against bounce-1's 90 ns/ray.

Stage 1 (this file, CPU, subdiv-5 blob, 32k rays): measure (a) how
often the origin-leaf pre-test hits at all, (b) how tight t_seed is vs
t_true, and (c) the DECISIVE counters — rounds/sum_pp of the real
packet traversal with t_cap seeded vs un-seeded. Exactness argument
for a production version: the seed is a true intersection, so
t_true <= t_seed always; traversal with cap just above t_seed finds
the same winner (strict-< window), and the seed itself is the
incumbent when nothing closer exists. Go/no-go: octant needed a 24%
isolated primary visit cut for +2.35% e2e and bounce rays are ~86% of
the contract frame (probe_bouncewall) — a sum_pp cut well above ~10%
on bounce rows is required before any TPU wall measurement is worth
running.

RESULTS (2026-08-19, CPU, subdiv-5 blob, 32768 primaries, 5764 live
bounce-1 rays originating on mesh triangles):

    seed_hit_frac = 0.0   — NOT ONE ray re-hit its origin leaf
    counters (seeded vs base): rounds 15/15, sum_pp 712/712 (no cut)
    winner_agree = 1.0    (the seeded cap loses nothing, as argued)

VERDICT: REFUTED at stage 1, before any TPU time. The mechanism
requires local geometry to occlude the bounce ray, and the blob —
the contract scene class — is locally convex at leaf granularity
(32-triangle neighborhoods of a noise-displaced icosphere): a ray
leaving the surface never re-enters its own leaf's bounding volume.
t_seed therefore never exists, and the pre-test would be pure added
volume (~0.16 ms/batch/bounce) for zero cull. The lever could only
engage on scenes with leaf-scale concavity or interpenetrating
geometry (foliage, clutter), which no contract config exercises; on
this workload the footprint-union ledger stays: octant ordering is
the only adopted work-per-ray cut, and seeding is closed with
measured zeros.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpurt import camera as camera_mod
from tpurt import config, materials, rng, render, trace
from tpurt.bvh import LEAF_F, PACKET_LEAF_N
from tpurt.geometry import INF, T_MIN, TRI_EPS
from tpurt.kernels import traverse

N = 32768
SUBDIV = 5


def leaf_seed_t(scene, prev_gid, o, d):
    """NumPy: min valid MT t of each ray against its origin leaf row."""
    leaves = np.asarray(scene.pk_leaves).reshape(-1, LEAF_F, PACKET_LEAF_N)
    gids = leaves[:, 10, :].view(np.int32)                  # (L, LN)
    n_tri = int(np.asarray(scene.tri_v0).shape[0])
    tri2row = np.full(n_tri, -1, np.int64)
    valid = gids >= 0
    rows = np.repeat(np.arange(gids.shape[0]), PACKET_LEAF_N)
    tri2row[gids[valid]] = rows[valid.reshape(-1)]

    row = np.where(prev_gid >= 0, tri2row[np.maximum(prev_gid, 0)], -1)
    lf = leaves[np.maximum(row, 0)]                         # (N, LEAF_F, LN)
    v0 = lf[:, 0:3, :].transpose(0, 2, 1)                   # (N, LN, 3)
    e1 = lf[:, 3:6, :].transpose(0, 2, 1)
    e2 = lf[:, 6:9, :].transpose(0, 2, 1)
    o = np.asarray(o)[:, None, :]
    d = np.asarray(d)[:, None, :]
    p = np.cross(d, e2)
    det = np.einsum("nlk,nlk->nl", e1, p)
    inv = np.where(np.abs(det) > TRI_EPS, 1.0 / np.where(det == 0, 1, det),
                   0.0)
    s = o - v0
    u = np.einsum("nlk,nlk->nl", s, p) * inv
    q = np.cross(s, e1)
    v = np.einsum("nlk,nlk->nl", d, q) * inv
    t = np.einsum("nlk,nlk->nl", e2, q) * inv
    ok = ((np.abs(det) > TRI_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > T_MIN))
    ok &= gids[np.maximum(row, 0)] >= 0
    ok &= (row >= 0)[:, None]
    return np.where(ok, t, np.inf).min(axis=1), row


def counters(scene, o, d, tcap):
    out = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
        scene, o, d, t, with_counters=True))(o, d, tcap)
    r, a, s_pp, s_pend = (int(x) for x in out[5:9])
    t = np.asarray(out[0])
    gid = np.asarray(out[4])
    return {"rounds": r, "sum_pp": s_pp, "sum_pending": s_pend}, t, gid


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=SUBDIV, mode="mega", max_depth=8)
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
    tinf = jnp.full(N, INF, jnp.float32)

    # bounce-1 rays + their previous winner gid (the traversal's own)
    _, t0, gid0 = counters(scene, o, d, tinf)
    h = trace.intersect(scene, o, d)
    mp = scene.mat_packed[h.mat]
    mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
    draws = rng.bounce_draws(keys, jnp.int32(0))
    nd, _, alive = materials.scatter(
        d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
    p = o + h.t[:, None] * d
    o2 = jnp.where(h.ok[:, None], p, o)
    alive2 = np.asarray(h.ok & alive) & (gid0 >= 0)
    o2n, d2n = np.asarray(o2), np.asarray(nd)

    t_seed, row = leaf_seed_t(scene, np.where(alive2, gid0, -1), o2n, d2n)
    tcap_base = jnp.asarray(np.where(alive2, INF, 0.0).astype(np.float32))
    c_base, t_true, gid_b = counters(scene, o2, jnp.asarray(d2n), tcap_base)
    seed_cap = np.where(np.isfinite(t_seed),
                        (t_seed * (1 + 1e-5)).astype(np.float32), INF)
    tcap_seed = jnp.asarray(np.where(alive2, seed_cap, 0.0)
                            .astype(np.float32))
    c_seed, t_s, gid_s = counters(scene, o2, jnp.asarray(d2n), tcap_seed)

    live = alive2
    hit_frac = float(np.isfinite(t_seed[live]).mean())
    tt = t_true[live]
    ts = t_seed[live]
    both = np.isfinite(ts) & (tt < INF / 2)
    ratio = ts[both] / np.maximum(tt[both], 1e-6)
    # winner agreement where the true winner exists (seeded cap must
    # never lose it)
    tw = tt < INF / 2
    agree = float((gid_s[live][tw] == gid_b[live][tw]).mean())
    print(json.dumps({
        "n_live": int(live.sum()),
        "seed_hit_frac": round(hit_frac, 4),
        "ratio_p50": round(float(np.median(ratio)), 3) if both.any() else None,
        "ratio_p90": round(float(np.percentile(ratio, 90)), 3)
        if both.any() else None,
        "tight_frac(seed<2t)": round(float((ratio < 2).mean()), 4)
        if both.any() else None,
        "winner_agree": round(agree, 6),
        "base": c_base, "seed": c_seed,
        "sum_pp_cut": round(1 - c_seed["sum_pp"] / c_base["sum_pp"], 4),
        "rounds_cut": round(1 - c_seed["rounds"] / c_base["rounds"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
