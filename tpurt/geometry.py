"""Branchless batched primitive intersection (SURVEY.md §1 L3, A.3–A.5).

The reference's scalar ``sphere_hit``/``plane_hit``/``tri_hit`` functions
(SURVEY.md §2) become all-rays × all-primitives tests combined with
``jnp.where``/argmin — no divergent branches, so XLA keeps the VPU lanes
dense. Each ``hit_*`` returns the best hit *of that primitive type* for
every ray; ``nearest`` in trace.py combines types.

Spec anchors: sphere = half-b quadratic with a=1 (unit dirs), t-window
(T_MIN=1e-3, t_max) (A.3); plane n·x = k (A.4); triangle Möller–Trumbore
with determinant epsilon 1e-8, flat geometric normals (A.5).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import linalg

T_MIN = 1e-3
INF = jnp.float32(3.0e38)
TRI_EPS = 1e-8


def hit_spheres(o, d, centers, radii, mat_ids, t_max):
    """o,d: (N,3) unit dirs; centers (S,3), radii (S,). Returns per-ray best
    (t, normal(outward), mat_id, hit_mask)."""
    oc = o[:, None, :] - centers[None, :, :]          # (N,S,3)
    half_b = jnp.sum(oc * d[:, None, :], axis=-1)     # (N,S)
    c = jnp.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = half_b * half_b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -half_b - sq
    t1 = -half_b + sq
    t = jnp.where(t0 > T_MIN, t0, t1)
    ok = (disc > 0.0) & (t > T_MIN) & (t < t_max[:, None])
    t = jnp.where(ok, t, INF)

    i = jnp.argmin(t, axis=-1)                        # (N,)
    tb = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
    hit = tb < INF
    cb = centers[i]
    rb = jnp.where(radii[i] == 0.0, 1.0, radii[i])
    p = o + tb[:, None] * d
    n = (p - cb) / rb[:, None]
    return tb, n, mat_ids[i], hit


def hit_planes(o, d, normals, offsets, mat_ids, t_max):
    """Infinite planes n·x = k with unit normals (A.4)."""
    denom = jnp.sum(d[:, None, :] * normals[None, :, :], axis=-1)   # (N,P)
    num = offsets[None, :] - jnp.sum(o[:, None, :] * normals[None, :, :], -1)
    safe = jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
    t = num / safe
    ok = (jnp.abs(denom) > 1e-8) & (t > T_MIN) & (t < t_max[:, None])
    t = jnp.where(ok, t, INF)

    i = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
    hit = tb < INF
    return tb, normals[i], mat_ids[i], hit


def moller_trumbore(o, d, v0, e1, e2, t_max):
    """Batched Möller–Trumbore (A.5). All inputs broadcast over leading dims;
    o,d: (..., 3) vs v0,e1,e2: (..., 3). Returns (t, valid)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    nondegen = jnp.abs(det) > TRI_EPS
    inv = 1.0 / jnp.where(nondegen, det, 1.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    valid = (
        nondegen
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > T_MIN)
        & (t < t_max)
    )
    return jnp.where(valid, t, INF), valid


def hit_triangles_brute(o, d, v0, e1, e2, mat_ids, t_max):
    """All-pairs triangle test — used for small scenes / as the BVH oracle."""
    t, _ = moller_trumbore(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
        t_max[:, None],
    )                                                  # (N,T)
    i = jnp.argmin(t, axis=-1)
    tb = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
    hit = tb < INF
    n = linalg.normalize(jnp.cross(e1[i], e2[i]))
    return tb, n, mat_ids[i], hit


def slab_test(o, d_inv, lo, hi, t_min, t_max):
    """Branchless AABB slab test; d_inv precomputed (guarded) reciprocal.

    o,d_inv: (..., 3); lo,hi: (..., 3); t_min/t_max: (...,). Returns bool.
    """
    t0 = (lo - o) * d_inv
    t1 = (hi - o) * d_inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf > t_min) & (tn < t_max)


def safe_inv_dir(d, eps: float = 1e-12):
    """Reciprocal direction with zero components nudged off the singularity."""
    mag = jnp.maximum(jnp.abs(d), eps)
    return jnp.where(d < 0, -1.0, 1.0) / mag
