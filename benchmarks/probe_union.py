"""How much dense leaf work would smaller ray groups save? (CPU analysis)

The packet traversal's dense leaf phase costs (leaf-row visits per packet)
x LN x 128 ray-tri pairs; a visit is taken if ANY of the 128 member rays
needs the leaf, so the per-packet visit count is the UNION of member leaf
sets. This probe walks bounce-1 rays through the CIP BVH per-ray (NumPy,
exact same slab/leaf semantics, per-ray t tightening via actual nearest-hit
search) and reports:

  * mean per-ray leaf-visit count (the useful work), and
  * mean union size for consecutive groups of 128 / 64 / 32 / 16 rays
    (tile order), i.e. the dense volume factor of sub-packet cursors.

union_32/union_128 is the dense-volume multiplier of a 4-cursor
lane-blocked traversal (times 1 — each cursor's leaf tests only its 32
rays, so volume per group = sum of its sub-unions x LN x 32).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
sys.path[:0] = [str(Path(__file__).resolve().parent.parent), str(Path(__file__).resolve().parent)]

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpurt import camera as camera_mod
    from tpurt import config, materials, render, rng, trace

    N = 16384
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    sdev = scene.device()

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
        h = trace.intersect(sdev, o, d)
        mp = sdev.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = (np.asarray(x) for x in one_bounce(o, d, keys))
    print(json.dumps({"probe": "live", "n": N, "live": int(alive2.sum())}))

    nodes = np.asarray(scene.pk_nodes)            # (Mi, 16)
    m_l = nodes[:, 12].view(np.int32)
    m_r = nodes[:, 13].view(np.int32)
    skip = nodes[:, 14].view(np.int32)
    n_total = nodes.shape[0]
    leaves = np.asarray(scene.pk_leaves)
    from tpurt.bvh import LEAF_F, PACKET_LEAF_N as LN
    L = leaves.shape[0]
    tri = leaves.reshape(L, LEAF_F, LN)

    T_MIN = 1e-3

    def per_ray_walk(o, d, alive):
        """Exact per-ray CIP walk with t tightening; returns per-ray leaf
        visit sets as a bool matrix (n, L)."""
        n = o.shape[0]
        inv = np.where(d < 0, -1.0, 1.0) / np.maximum(np.abs(d), 1e-12)
        node = np.zeros(n, np.int32)
        node[~alive] = -1
        t_best = np.full(n, np.inf, np.float32)
        visited = np.zeros((n, L), bool)

        def slab(rows_lo, rows_hi, o, inv, t_best):
            t0 = (rows_lo - o) * inv
            t1 = (rows_hi - o) * inv
            tn = np.minimum(t0, t1).max(axis=-1)
            tf = np.maximum(t0, t1).min(axis=-1)
            return np.maximum(tn, T_MIN) <= np.minimum(tf, t_best)

        def leaf_hit(rows, o, d, t_best):
            """rows: leaf row ids (k,); returns per-ray min t over the row."""
            tr = tri[rows]                         # (k, F, LN)
            v0 = tr[:, 0:3].transpose(0, 2, 1)     # (k, LN, 3)
            e1 = tr[:, 3:6].transpose(0, 2, 1)
            e2 = tr[:, 6:9].transpose(0, 2, 1)
            pv = np.cross(d[:, None, :], e2)
            det = (e1 * pv).sum(-1)
            nd_ = np.abs(det) > 1e-8
            invd = 1.0 / np.where(nd_, det, 1.0)
            tv = o[:, None, :] - v0
            u = (tv * pv).sum(-1) * invd
            qv = np.cross(tv, e1)
            v = (d[:, None, :] * qv).sum(-1) * invd
            t = (e2 * qv).sum(-1) * invd
            ok = nd_ & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > T_MIN) \
                & (t < t_best[:, None])
            t = np.where(ok, t, np.inf)
            return t.min(axis=1)

        active = node >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            nd_ = node[idx]
            rows = nodes[nd_]
            hit_l = slab(rows[:, 0:3], rows[:, 3:6], o[idx], inv[idx],
                         t_best[idx])
            hit_r = slab(rows[:, 6:9], rows[:, 9:12], o[idx], inv[idx],
                         t_best[idx])
            ml, mr, sk = m_l[nd_], m_r[nd_], skip[nd_]
            leaf_l = (ml & 1) == 1
            leaf_r = (mr & 1) == 1
            # process leaf children immediately (per-ray: no banking)
            for hit, meta, is_leaf in ((hit_l, ml, leaf_l),
                                       (hit_r, mr, leaf_r)):
                sel = hit & is_leaf
                if sel.any():
                    rid = meta[sel] >> 1
                    rsel = idx[sel]
                    visited[rsel, rid] = True
                    tmin = leaf_hit(rid, o[rsel], d[rsel], t_best[rsel])
                    t_best[rsel] = np.minimum(t_best[rsel], tmin)
            go_l = hit_l & ~leaf_l
            go_r = hit_r & ~leaf_r
            nxt = np.where(go_l, ml >> 1, np.where(go_r, mr >> 1, sk))
            nxt = np.where((nxt < 0) | (nxt >= n_total), -1, nxt)
            node[idx] = nxt
            active = node >= 0
        return visited

    visited = per_ray_walk(o2, d2, alive2)
    per_ray = visited.sum(axis=1)
    rec = {"probe": "leaf_visits",
           "mean_per_live_ray": round(float(per_ray[alive2].mean()), 2),
           "max_per_ray": int(per_ray.max())}
    for g in (128, 64, 32, 16):
        u = visited.reshape(N // g, g, L).any(axis=1).sum(axis=1)
        rec[f"union_{g}"] = round(float(u.mean()), 1)
    # dense volume factor vs the 128-wide packet: sum over sub-groups of
    # union x g, normalized
    base = rec["union_128"] * 128
    for g in (64, 32, 16):
        rec[f"volume_factor_{g}"] = round(
            rec[f"union_{g}"] * g * (128 // g) / base, 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
