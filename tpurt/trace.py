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


def intersect(scene: Scene, o, d) -> Hit:
    """Nearest hit across all primitive types (branchless combine)."""
    n_rays = o.shape[0]
    t_best = jnp.full(n_rays, INF, jnp.float32)
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

    if scene.has_bvh:
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


@partial(jax.jit, static_argnames=("max_depth", "rr_start"))
def trace(scene: Scene, o, d, keys, max_depth: int,
          rr_start: Optional[int] = None):
    """Path-trace N rays to completion.

    Returns (radiance (N,3), rays_cast ()) where rays_cast counts every
    live ray entering a bounce (the Mrays metric numerator, SURVEY.md §5
    "Metrics").
    """

    def cond(c):
        bounce, _, _, _, _, alive, _ = c
        return (bounce < max_depth) & jnp.any(alive)

    def body(c):
        bounce, o, d, atten, rad, alive, nrays = c
        nrays = nrays + jnp.sum(alive, dtype=jnp.int32)

        h = intersect(scene, o, d)
        live_hit = alive & h.ok
        live_miss = alive & ~h.ok

        rad = rad + jnp.where(live_miss[:, None], atten * sky(scene, d), 0.0)
        emit = scene.mat_emit[h.mat]
        rad = rad + jnp.where(live_hit[:, None], atten * emit, 0.0)

        draws = rng.bounce_draws(keys, bounce)
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

        return bounce + 1, o, d, atten, rad, alive, nrays

    n = o.shape[0]
    init = (
        jnp.int32(0),
        o,
        d,
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones(n, bool),
        jnp.int32(0),
    )
    _, _, _, _, rad, _, nrays = jax.lax.while_loop(cond, body, init)
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
