"""Megakernel tracer core (SURVEY.md §1 L6, §3.2).

The reference's recursive ``cast_ray(scene, ray, depth)`` (SURVEY.md §3.1)
becomes an iterative, batched bounce loop: one ``lax.while_loop`` whose carry
is the SoA state of N rays (origin, dir, attenuation, radiance, live mask).
All N rays advance one bounce per iteration; dead lanes are masked, and the
loop exits early when every lane is dead (``~alive.any()``), which is what
Russian roulette and sky misses feed.

BVH traversal is the inner ``lax.while_loop``: a single int32 node cursor
per ray walking the skip-linked DFS array (bvh.py) with the shrinking
``t_best`` as the pruning window — stackless by construction, so the carry
is three flat vectors and every step is gathers + a slab test + a fixed
(N, LEAF_N) Möller–Trumbore block.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import geometry, linalg, materials, rng
from .bvh import LEAF_N
from .geometry import INF, T_MIN
from .scene import Scene

RR_CLAMP_LO, RR_CLAMP_HI = 0.05, 0.95  # A.8


class Hit(NamedTuple):
    t: jnp.ndarray       # (N,)
    n: jnp.ndarray       # (N,3) front-facing unit normal
    front: jnp.ndarray   # (N,) bool
    mat: jnp.ndarray     # (N,) int32
    ok: jnp.ndarray      # (N,) bool


def bvh_nearest_tri(scene: Scene, o, d, t_max):
    """Stackless skip-link traversal; returns (t, tri_index|-1)."""
    n_rays = o.shape[0]
    d_inv = geometry.safe_inv_dir(d)
    leaf_off = jnp.arange(LEAF_N, dtype=jnp.int32)

    def cond(state):
        node, _, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, t_best, tri_best = state
        active = node >= 0
        nid = jnp.maximum(node, 0)
        lo = scene.bvh_lo[nid]
        hi = scene.bvh_hi[nid]
        box = geometry.slab_test(o, d_inv, lo, hi, T_MIN, t_best) & active

        cnt = scene.bvh_count[nid]
        is_leaf = cnt > 0
        do_leaf = box & is_leaf

        idx = jnp.where(do_leaf, scene.bvh_first[nid], 0)
        idx = idx[:, None] + leaf_off[None, :]            # (N, LEAF_N)
        tv0 = scene.tri_v0[idx]
        te1 = scene.tri_e1[idx]
        te2 = scene.tri_e2[idx]
        t, valid = geometry.moller_trumbore(
            o[:, None, :], d[:, None, :], tv0, te1, te2, t_best[:, None]
        )
        t = jnp.where(valid & do_leaf[:, None], t, INF)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        better = tj < t_best
        t_best = jnp.where(better, tj, t_best)
        tri_best = jnp.where(
            better, jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0],
            tri_best,
        )

        nxt = jnp.where(box & ~is_leaf, node + 1, scene.bvh_skip[nid])
        node = jnp.where(active, nxt, node)
        return node, t_best, tri_best

    init = (
        jnp.zeros(n_rays, jnp.int32),
        jnp.asarray(t_max, jnp.float32),
        jnp.full(n_rays, -1, jnp.int32),
    )
    _, t_best, tri_best = jax.lax.while_loop(cond, body, init)
    return t_best, tri_best


PACKET_R = 128  # rays per packet: one traversal cursor per 128 rays
USE_OCTANT_LAYOUTS = False  # see packet_nearest_tri; wins only with resort
ADV_STEPS = 16  # fixed node steps per traversal round (tuned on TPU v5e)


def packet_nearest_tri(scene: Scene, o, d, t_max, with_counters=False):
    """Packet traversal over the PacketBVH layout (bvh.PacketBVH).

    Design rationale (measured on this TPU, see SURVEY.md §7 hard part 1):
    XLA row-gathers cost ~3-8 ns per row nearly independent of row width,
    so per-ray traversal is gather-latency-bound at ~2 Mrays/s. Here ONE
    traversal cursor serves a packet of PACKET_R rays — the classic packet
    traversal reborn for a vector machine:

      * one (P, 8) node-row gather per visited node (P = N/128 packets),
        i.e. ~100x fewer gather rows than per-ray traversal;
      * the packet enters a subtree if ANY member ray hits the box
        (conservative union); per-ray t windows still prune;
      * leaf visits gather one 640-byte row holding all 16 triangles and
        intersect them against all 128 rays as dense (P, R, 16) math on
        the VPU — no per-ray memory access at all.

    Coherent packets (primary rays in scanline order, specular bounces)
    traverse near per-ray visit counts; fully diffuse packets degrade
    toward the union of members' paths, which is why the wavefront keeps
    rays in pixel-order packets (shared origin locality).

    Returns per-ray (t, normal, mat, found) for the N input rays.
    """
    from .bvh import PACKET_LEAF_N as LN

    n = o.shape[0]
    pad = (-n) % PACKET_R
    if pad:
        far = jnp.asarray([0.0, 0.0, 3.0e37], jnp.float32)
        o = jnp.concatenate([o, jnp.broadcast_to(far, (pad, 3))])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 (pad, 3))]
        )
        t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
    p = o.shape[0] // PACKET_R

    # Fully scalar SoA: every hot array is (P, R) or (P, LN, R) so the lane
    # dimension is R=128 — a trailing xyz dim of 3 would be padded to the
    # 128-lane tile and blow memory traffic up ~40x (measured: the packed
    # variant collapsed from 17.7 to 0.2 Mrays/s at 1M rays).
    ox, oy, oz = (o[:, k].reshape(p, PACKET_R) for k in range(3))
    dx, dy, dz = (d[:, k].reshape(p, PACKET_R) for k in range(3))

    def inv(c):
        mag = jnp.maximum(jnp.abs(c), 1e-12)
        return jnp.where(c < 0, -1.0, 1.0) / mag

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    nodes = scene.pk_nodes                         # (8*M, 8)
    leaves = scene.pk_leaves                       # (L, LN*10)
    m_nodes = nodes.shape[0] // 8

    if USE_OCTANT_LAYOUTS:
        # Each packet traverses the DFS layout ordered for its MAJORITY
        # direction octant (near child first -> early hits -> t pruning).
        # Measured: a LOSS for mixed-octant packets (minority rays
        # traverse anti-ordered, growing the union), a win only when rays
        # are pre-sorted by octant — hence the flag.
        neg_x = (dx < 0).astype(jnp.int32)
        neg_y = (dy < 0).astype(jnp.int32)
        neg_z = (dz < 0).astype(jnp.int32)
        oct_ray = neg_x + 2 * neg_y + 4 * neg_z    # (P, R)
        counts = jnp.sum(
            oct_ray[:, :, None] == jnp.arange(8)[None, None, :], axis=1
        )                                          # (P, 8)
        base = jnp.argmax(counts, axis=-1).astype(jnp.int32) * m_nodes
    else:
        base = jnp.zeros(p, jnp.int32)

    def node_fields(nid):
        rows = nodes[nid]                          # (P, 8)
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        meta = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        return rows, skip, meta

    def slab_any(rows, t_best):
        tn = jnp.full(t_best.shape, jnp.float32(T_MIN))
        tf = t_best
        for k, (oc, ic) in enumerate(((ox, ix), (oy, iy), (oz, iz))):
            t0 = (rows[:, k, None] - oc) * ic
            t1 = (rows[:, k + 3, None] - oc) * ic
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return jnp.any(tn <= tf, axis=-1)          # (P,)

    def outer_cond(st):
        return jnp.any(st[0] >= 0)

    def outer(st):
        node, t_best, nx, ny, nz, m_best, found, it_outer, it_adv = st
        if with_counters:
            it_outer = it_outer + 1

        # Phase A: a FIXED 16 node steps per round (packets that land on a
        # hit leaf stall as pending; already-finished packets stall too).
        # Fixed-trip beats "advance until every packet is pending": the
        # latter synchronizes all packets on the slowest one's next-leaf
        # distance every round, which multiplied rounds x max-distance on
        # divergent chunks. 16 steps amortize per-iteration overhead and
        # bound how long an early-pending packet waits for its leaf pass.
        def adv_step(nd, pending):
            act = (nd >= 0) & ~pending
            rows, skip, meta = node_fields(jnp.maximum(nd, 0))
            hit_any = slab_any(rows, t_best) & act
            is_leaf = (meta & 1) == 1
            stop = hit_any & is_leaf                        # becomes pending
            nxt = jnp.where(hit_any & ~is_leaf, nd + 1, skip)
            nd = jnp.where(act & ~stop, nxt, nd)
            return nd, pending | stop

        pending = jnp.zeros(p, bool)
        for _ in range(ADV_STEPS):
            node, pending = adv_step(node, pending)
        if with_counters:
            it_adv = it_adv + ADV_STEPS

        # Phase B: every pending packet intersects its full 16-triangle
        # leaf row against all member rays, densely (Möller–Trumbore
        # written out componentwise over (P, LN, R) scalar arrays).
        _, skip, meta = node_fields(jnp.maximum(node, 0))
        row_id = jnp.where(pending, meta >> 1, 0)
        tri = leaves[row_id].reshape(p, LN, 10)             # one row gather

        def tc(k):                                          # (P, LN, 1)
            return tri[:, :, k][:, :, None]

        v0x, v0y, v0z = tc(0), tc(1), tc(2)
        e1x, e1y, e1z = tc(3), tc(4), tc(5)
        e2x, e2y, e2z = tc(6), tc(7), tc(8)
        matb = jax.lax.bitcast_convert_type(tri[:, :, 9], jnp.int32)

        rdx, rdy, rdz = dx[:, None, :], dy[:, None, :], dz[:, None, :]
        rox, roy, roz = ox[:, None, :], oy[:, None, :], oz[:, None, :]

        # pvec = d x e2
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz             # (P, LN, R)
        nondegen = jnp.abs(det) > geometry.TRI_EPS
        invd = 1.0 / jnp.where(nondegen, det, 1.0)
        # tvec = o - v0
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * invd
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * invd
        valid = (
            nondegen & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > T_MIN) & (t < t_best[:, None, :])
            & pending[:, None, None]
        )
        t = jnp.where(valid, t, INF)
        tj = jnp.min(t, axis=1)                             # (P, R)
        j = jnp.argmin(t, axis=1)
        better = tj < t_best

        # per-leaf-tri geometric normals (P, LN), winner-select via one-hot
        gnx = e1y[:, :, 0] * e2z[:, :, 0] - e1z[:, :, 0] * e2y[:, :, 0]
        gny = e1z[:, :, 0] * e2x[:, :, 0] - e1x[:, :, 0] * e2z[:, :, 0]
        gnz = e1x[:, :, 0] * e2y[:, :, 0] - e1y[:, :, 0] * e2x[:, :, 0]
        glen = jnp.sqrt(jnp.maximum(gnx**2 + gny**2 + gnz**2, 1e-24))
        gnx, gny, gnz = gnx / glen, gny / glen, gnz / glen

        onehot = jnp.arange(LN)[None, :, None] == j[:, None, :]  # (P,LN,R)
        ohf = onehot.astype(jnp.float32)
        w_nx = jnp.sum(gnx[:, :, None] * ohf, axis=1)
        w_ny = jnp.sum(gny[:, :, None] * ohf, axis=1)
        w_nz = jnp.sum(gnz[:, :, None] * ohf, axis=1)
        w_m = jnp.sum(jnp.where(onehot, matb[:, :, None], 0), axis=1)

        t_best = jnp.where(better, tj, t_best)
        nx = jnp.where(better, w_nx, nx)
        ny = jnp.where(better, w_ny, ny)
        nz = jnp.where(better, w_nz, nz)
        m_best = jnp.where(better, w_m, m_best)
        found = found | better

        node = jnp.where(pending, skip, node)
        return (node, t_best, nx, ny, nz, m_best, found, it_outer, it_adv)

    zero = jnp.zeros((p, PACKET_R), jnp.float32)
    init = (
        base,
        t_max.reshape(p, PACKET_R),
        zero, zero, zero,
        jnp.zeros((p, PACKET_R), jnp.int32),
        jnp.zeros((p, PACKET_R), bool),
        jnp.int32(0),
        jnp.int32(0),
    )
    (_, t_best, nx, ny, nz, m_best, found, it_outer, it_adv) = (
        jax.lax.while_loop(outer_cond, outer, init)
    )
    n_best = jnp.stack(
        [nx.reshape(-1)[:n], ny.reshape(-1)[:n], nz.reshape(-1)[:n]], axis=-1
    )
    out = (t_best.reshape(-1)[:n], n_best,
           m_best.reshape(-1)[:n], found.reshape(-1)[:n])
    if with_counters:
        return out + (it_outer, it_adv)
    return out


def intersect(scene: Scene, o, d, t_cap=None) -> Hit:
    """Nearest hit across all primitive types (branchless combine).

    t_cap (optional, (N,)): per-ray search window. Pass 0 for dead lanes —
    every primitive test fails instantly and, crucially, packets whose 128
    rays are all dead exit BVH traversal after one node visit.
    """
    n_rays = o.shape[0]
    if t_cap is None:
        t_best = jnp.full(n_rays, INF, jnp.float32)
    else:
        t_best = jnp.asarray(t_cap, jnp.float32)
    n_best = jnp.zeros((n_rays, 3), jnp.float32).at[:, 1].set(1.0)
    m_best = jnp.zeros(n_rays, jnp.int32)

    ts, ns, ms, hs = geometry.hit_spheres(
        o, d, scene.sph_c, scene.sph_r, scene.sph_mat, t_best
    )
    closer = hs & (ts < t_best)
    t_best = jnp.where(closer, ts, t_best)
    n_best = jnp.where(closer[:, None], ns, n_best)
    m_best = jnp.where(closer, ms, m_best)

    tp, np_, mp, hp = geometry.hit_planes(
        o, d, scene.pln_n, scene.pln_k, scene.pln_mat, t_best
    )
    closer = hp & (tp < t_best)
    t_best = jnp.where(closer, tp, t_best)
    n_best = jnp.where(closer[:, None], np_, n_best)
    m_best = jnp.where(closer, mp, m_best)

    if scene.pk_nodes is not None:
        tt, nt, mt, ht = packet_nearest_tri(scene, o, d, t_best)
    elif scene.has_bvh:
        tt, tri = bvh_nearest_tri(scene, o, d, t_best)
        ht = tri >= 0
        tri_c = jnp.maximum(tri, 0)
        nt = linalg.normalize(
            jnp.cross(scene.tri_e1[tri_c], scene.tri_e2[tri_c])
        )
        mt = scene.tri_mat[tri_c]
    else:
        tt, nt, mt, ht = geometry.hit_triangles_brute(
            o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mat,
            t_best,
        )
    closer = ht & (tt < t_best)
    t_best = jnp.where(closer, tt, t_best)
    n_best = jnp.where(closer[:, None], nt, n_best)
    m_best = jnp.where(closer, mt, m_best)

    hit = t_best < INF
    front = jnp.sum(d * n_best, axis=-1) < 0.0
    n_face = jnp.where(front[:, None], n_best, -n_best)
    return Hit(t=t_best, n=n_face, front=front, mat=m_best, ok=hit)


def sky(scene: Scene, d):
    """Gradient background (A.7); zero endpoints => black (Cornell)."""
    t = 0.5 * (d[:, 1] + 1.0)
    return scene.sky_a[None, :] + t[:, None] * (
        scene.sky_b[None, :] - scene.sky_a[None, :]
    )


def _part1by2(x):
    """Spread 7 bits of x to every 3rd bit (for 21-bit Morton interleave)."""
    x = x & 0x7F
    x = (x | (x << 8)) & 0x0700F
    x = (x | (x << 4)) & 0x430C3
    x = (x | (x << 2)) & 0x49249
    return x


def ray_coherence_key(scene: Scene, o, d, alive):
    """Sort key grouping rays into traversal-coherent packets: direction
    octant (3 bits, major) then Morton cell of the origin within the BVH
    root bbox (21 bits). Same direction signs AND nearby origins is what
    keeps a 128-ray packet's BVH path union close to a single ray's path.
    Dead rays sort to the end (their packets exit traversal instantly)."""
    root = scene.pk_nodes[0]
    lo = root[0:3]
    span = jnp.maximum(root[3:6] - lo, 1e-6)
    q = jnp.clip((o - lo[None, :]) / span[None, :], 0.0, 0.999)
    cell = (q * 128.0).astype(jnp.int32)                     # 7 bits/axis
    morton = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    key = (octant << 21) | morton
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))


@partial(jax.jit, static_argnames=("max_depth", "rr_start", "resort"))
def trace(scene: Scene, o, d, keys, max_depth: int,
          rr_start: Optional[int] = None, resort: bool = False):
    """Path-trace N rays to completion.

    Returns (radiance (N,3) in the INPUT ray order, rays_cast ()) where
    rays_cast counts every live ray entering a bounce (the Mrays metric
    numerator, SURVEY.md §5 "Metrics").

    resort: re-sort rays inside the loop each bounce by (liveness,
    direction octant) — all on-device — so traversal packets stay
    direction-coherent after diffuse bounces. Off by default: measured on
    this TPU, the per-bounce permute (row-gathers at ~8 ns/row over ~7
    arrays) costs more than the traversal coherence wins back; kept as an
    option for scenes with deeper trees where the trade flips.
    """
    resort = resort and scene.pk_nodes is not None

    def cond(c):
        bounce, _, _, _, _, _, alive, _, _ = c
        return (bounce < max_depth) & jnp.any(alive)

    def body(c):
        bounce, o, d, atten, rad, slot, alive, ks, nrays = c
        nrays = nrays + jnp.sum(alive, dtype=jnp.int32)

        h = intersect(scene, o, d, t_cap=jnp.where(alive, INF, 0.0))
        live_hit = alive & h.ok
        live_miss = alive & ~h.ok

        rad = rad + jnp.where(live_miss[:, None], atten * sky(scene, d), 0.0)
        emit = scene.mat_emit[h.mat]
        rad = rad + jnp.where(live_hit[:, None], atten * emit, 0.0)

        draws = rng.bounce_draws(ks, bounce)
        p = o + h.t[:, None] * d
        new_d, att, s_alive = materials.scatter(
            d, h.n, h.front,
            scene.mat_type[h.mat], scene.mat_albedo[h.mat],
            scene.mat_fuzz[h.mat], scene.mat_ior[h.mat], draws,
        )
        atten = jnp.where(live_hit[:, None], atten * att, atten)
        alive = live_hit & s_alive
        o = jnp.where(live_hit[:, None], p, o)
        d = jnp.where(live_hit[:, None], new_d, d)

        if rr_start is not None:
            # A.8: from bounce >= rr_start survive with p = clamp(max(atten))
            p_surv = jnp.clip(jnp.max(atten, axis=-1), RR_CLAMP_LO, RR_CLAMP_HI)
            rr_on = (bounce >= rr_start) & alive
            survive = draws[:, 4] < p_surv
            atten = jnp.where(
                (rr_on & survive)[:, None], atten / p_surv[:, None], atten
            )
            alive = alive & (~rr_on | survive)

        if resort:
            key = ray_coherence_key(scene, o, d, alive)
            order = jnp.argsort(key, stable=True)
            o, d, atten, rad = o[order], d[order], atten[order], rad[order]
            slot, alive, ks = slot[order], alive[order], ks[order]

        return bounce + 1, o, d, atten, rad, slot, alive, ks, nrays

    n = o.shape[0]
    init = (
        jnp.int32(0),
        o,
        d,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.arange(n, dtype=jnp.int32),
        jnp.ones(n, bool),
        keys,
        jnp.int32(0),
    )
    _, _, _, _, rad, slot, _, _, nrays = jax.lax.while_loop(cond, body, init)
    if resort:
        rad = jnp.zeros_like(rad).at[slot].set(rad)
    return rad, nrays


# Decreed constants for config 1's "primary-ray render, Lambertian shading"
# (BASELINE config 1 names no light setup; fixed here and frozen by goldens).
PRIMARY_LIGHT_DIR = (0.57735027, 0.57735027, 0.57735027)
PRIMARY_AMBIENT = 0.25


@jax.jit
def shade_primary(scene: Scene, o, d):
    """Config 1: single-bounce Lambertian shading, no secondary rays.

    color = albedo * (ambient + (1-ambient) * max(0, n·L)) on hit, sky on
    miss, emission for emissive materials. Deterministic given the camera
    jitter; exercises layers L1–L11 without bounce physics (SURVEY.md §7 M0).
    """
    h = intersect(scene, o, d)
    light = jnp.asarray(PRIMARY_LIGHT_DIR, jnp.float32)
    ndotl = jnp.maximum(jnp.sum(h.n * light[None, :], axis=-1), 0.0)
    shade = PRIMARY_AMBIENT + (1.0 - PRIMARY_AMBIENT) * ndotl
    albedo = scene.mat_albedo[h.mat]
    emit = scene.mat_emit[h.mat]
    lit = albedo * shade[:, None] + emit
    return jnp.where(h.ok[:, None], lit, sky(scene, d)), jnp.int32(o.shape[0])
