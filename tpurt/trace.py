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
from .geometry import INF
from .kernels import intersect as intersect_k
from .kernels.traverse import (  # re-export
    PACKET_R, bvh_nearest_tri, packet_nearest_tri,
)
from .scene import Scene

RR_CLAMP_LO, RR_CLAMP_HI = 0.05, 0.95  # A.8


class Hit(NamedTuple):
    t: jnp.ndarray       # (N,)
    n: jnp.ndarray       # (N,3) front-facing unit normal
    front: jnp.ndarray   # (N,) bool
    mat: jnp.ndarray     # (N,) int32
    ok: jnp.ndarray      # (N,) bool


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

    gid = None
    if scene.pk_nodes is not None or scene.pk8_nodes is not None:
        tt, nt, mt, ht, gid = packet_nearest_tri(scene, o, d, t_best)
    elif scene.has_bvh:
        tt, tri = bvh_nearest_tri(scene, o, d, t_best)
        ht = tri >= 0
        tri_c = jnp.maximum(tri, 0)
        nt = linalg.normalize(
            jnp.cross(scene.tri_e1[tri_c], scene.tri_e2[tri_c])
        )
        mt = scene.tri_mat[tri_c]
        if scene.tri_src is not None:
            gid = jnp.where(ht, scene.tri_src[tri_c], -1)
    elif (intersect_k.ENABLE
          and scene.tri_v0.shape[0] <= intersect_k.MAX_TRIS
          and scene.tri_shn is None
          and jax.default_backend() == "tpu"):
        # tri_shn guard: nearest_tri_small returns no winner gid, so a
        # vn-carrying scene would silently flat-shade here while the
        # oracle interpolates — route those through the brute path below.
        # small scene, no BVH: the Mosaic VMEM-resident brute kernel
        # (measured 1.6x over the fused jnp broadcast on v5e). Opt-in:
        # its different float-op ordering perturbs bounce paths enough to
        # forfeit the byte-identical TPU-vs-oracle PPM property (results
        # remain RMSE-equivalent — it's Monte Carlo noise realignment).
        rows = jnp.concatenate(
            [
                scene.tri_v0, scene.tri_e1, scene.tri_e2,
                # material id as f32 VALUE — int bit-patterns are
                # denormals and the TPU VPU flushes them to zero inside
                # the kernel (see kernels/intersect.py module docstring)
                scene.tri_mat.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )
        tt, nt, mt, ht = intersect_k.nearest_tri_small(o, d, rows, t_best)
    else:
        tt, nt, mt, ht, tri = geometry.hit_triangles_brute(
            o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_mat,
            t_best,
        )
        if scene.tri_src is not None:
            gid = jnp.where(ht, scene.tri_src[tri], -1)
    closer = ht & (tt < t_best)
    t_best = jnp.where(closer, tt, t_best)
    n_best = jnp.where(closer[:, None], nt, n_best)
    m_best = jnp.where(closer, mt, m_best)

    hit = t_best < INF
    front = jnp.sum(d * n_best, axis=-1) < 0.0
    n_face = jnp.where(front[:, None], n_best, -n_best)

    if scene.tri_shn is not None and gid is not None:
        # A.5 optional vn path: interpolate the winner triangle's vertex
        # normals at the hit's barycentrics. One (N,32) row gather supplies
        # normals AND the triangle (v0,e1,e2) for the u,v recompute; the
        # geometric normal still decides front/back (and the interpolated
        # normal is flipped to the same hemisphere).
        use = closer & (gid >= 0)
        row = scene.tri_shn[jnp.maximum(gid, 0)]          # (N,32)
        p = o + t_best[:, None] * d
        tvec = p - row[:, 9:12]
        e1, e2 = row[:, 12:15], row[:, 15:18]
        nrm = jnp.cross(e1, e2)
        den = jnp.sum(nrm * nrm, axis=-1)
        den = jnp.where(den > 0, den, 1.0)
        u = jnp.sum(jnp.cross(tvec, e2) * nrm, axis=-1) / den
        v = jnp.sum(jnp.cross(e1, tvec) * nrm, axis=-1) / den
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0 - u)
        ns = (
            (1.0 - u - v)[:, None] * row[:, 0:3]
            + u[:, None] * row[:, 3:6]
            + v[:, None] * row[:, 6:9]
        )
        ns = linalg.normalize(ns)
        ns = jnp.where(front[:, None], ns, -ns)
        n_face = jnp.where(use[:, None], ns, n_face)

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


def ray_coherence_key(scene: Scene, o, d, alive, variant: str = "octant"):
    """Sort key grouping rays into traversal-coherent packets.

    variant="octant": direction octant (3 bits, MAJOR) then Morton cell of
    the origin within the BVH root bbox (21 bits). Measured
    (benchmarks/probe_resort.py): LOSES on bounce rays — same-octant
    grouping pulls origins from across the whole batch's world footprint,
    widening the per-packet node-set union vs the tile order it replaced.

    variant="morton": origin Morton cell MAJOR (21 bits), octant minor —
    keeps packets origin-local (like tile order) and only subsorts by
    direction within a cell.

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
    if variant == "morton":
        key = (morton << 3) | octant
    else:
        key = (octant << 21) | morton
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))


@partial(jax.jit, static_argnames=("max_depth", "rr_start", "resort"))
def trace(scene: Scene, o, d, keys, max_depth: int,
          rr_start: Optional[int] = None, resort: bool = False,
          valid=None):
    """Path-trace N rays to completion.

    Returns (radiance (N,3) in the INPUT ray order, rays_cast ()) where
    rays_cast counts every live ray entering a bounce (the Mrays metric
    numerator, SURVEY.md §5 "Metrics").

    valid (optional (N,) bool): rays born dead (e.g. sharding pad lanes,
    mesh.py) — never traced, never counted.

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
        mp = scene.mat_packed[h.mat]               # ONE (N,16) param gather
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        rad = rad + jnp.where(live_hit[:, None], atten * mp[:, 4:7], 0.0)

        draws = rng.bounce_draws(ks, bounce)
        p = o + h.t[:, None] * d
        new_d, att, s_alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws,
        )
        atten = jnp.where(live_hit[:, None], atten * att, atten)
        alive = live_hit & s_alive
        o = jnp.where(live_hit[:, None], p, o)
        d = jnp.where(live_hit[:, None], new_d, d)

        if rr_start is not None:
            # A.8: from bounce >= rr_start survive with p = clamp(max(atten))
            p_surv = jnp.clip(jnp.max(atten, axis=-1), RR_CLAMP_LO, RR_CLAMP_HI)
            rr_on = (bounce >= rr_start) & alive
            survive = draws[4] < p_surv
            atten = jnp.where(
                (rr_on & survive)[:, None], atten / p_surv[:, None], atten
            )
            alive = alive & (~rr_on | survive)

        if resort:
            key = ray_coherence_key(scene, o, d, alive)
            order = jnp.argsort(key, stable=True)
            o, d, atten, rad = o[order], d[order], atten[order], rad[order]
            slot, alive, ks = slot[order], alive[order], ks[:, order]

        return bounce + 1, o, d, atten, rad, slot, alive, ks, nrays

    n = o.shape[0]
    init = (
        jnp.int32(0),
        o,
        d,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.arange(n, dtype=jnp.int32),
        jnp.ones(n, bool) if valid is None else valid,
        keys,
        jnp.int32(0),
    )

    # Tail compaction over BOUNCES, at packet granularity (same trick as
    # traverse.run_stages): every per-bounce op costs O(batch size) while
    # the live population decays, so once the count of packets with ANY
    # live ray fits the next capacity, gather those packets' rows into
    # half-size arrays and continue there. Rays never leave their packet
    # (traversal coherence preserved); `slot` carries original indices for
    # the final radiance scatter. Requires N to be packet-aligned.
    staged = (n % PACKET_R == 0) and not resort

    def _gather(c, sel, cap):
        bounce, o, d, atten, rad, slot, alive, ks, nrays = c
        pk = o.shape[0] // PACKET_R

        def rows(a):
            return a.reshape(pk, -1)[sel].reshape(
                cap * PACKET_R, *a.shape[1:]
            )

        return (bounce, rows(o), rows(d), rows(atten), rows(rad),
                rows(slot), rows(alive),
                ks.reshape(3, pk, -1)[:, sel].reshape(3, cap * PACKET_R),
                nrays)

    def _run(c, caps):
        if not caps:
            return jax.lax.while_loop(cond, body, c)
        cap = caps[0]
        pk = c[1].shape[0] // PACKET_R
        if pk <= cap:
            return _run(c, caps[1:])

        def cond2(st):
            live_pk = jnp.sum(
                jnp.any(st[6].reshape(-1, PACKET_R), axis=-1),
                dtype=jnp.int32,
            )
            return cond(st) & (live_pk > cap)

        c = jax.lax.while_loop(cond2, body, c)
        pk_dead = ~jnp.any(c[6].reshape(-1, PACKET_R), axis=-1)
        sel = jnp.argsort(pk_dead.astype(jnp.int32), stable=True)[:cap]
        sub = _run(_gather(c, sel, cap), caps[1:])
        # Only rad (finalized radiance) and the scalars need to come back;
        # rad rows are scattered to original slots at the end via `slot`.
        return (sub[0], c[1], c[2], c[3],
                c[4].reshape(pk, -1).at[sel].set(
                    sub[4].reshape(cap, -1)
                ).reshape(-1, 3),
                c[5], c[6], c[7], sub[8])

    if staged:
        n_pk = n // PACKET_R
        caps = [c for c in (n_pk // 2, n_pk // 4, n_pk // 8, n_pk // 16)
                if c >= 4]
        final = _run(init, caps)
        _, _, _, _, rad, slot, _, _, nrays = final
        rad = jnp.zeros_like(rad).at[slot].set(rad)
    else:
        _, _, _, _, rad, slot, _, _, nrays = jax.lax.while_loop(
            cond, body, init
        )
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
    mp = scene.mat_packed[h.mat]
    lit = mp[:, 1:4] * shade[:, None] + mp[:, 4:7]
    return jnp.where(h.ok[:, None], lit, sky(scene, d)), jnp.int32(o.shape[0])
