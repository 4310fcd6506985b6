"""Pallas brute-force ray x triangle kernel (SURVEY.md §2 "Triangle
intersect" -> tpurt/kernels/intersect.py).

For small scenes (the Cornell box's 14 triangles, quad lights, etc.) the
whole triangle table fits in VMEM, so nearest-hit search needs no BVH and
no HBM traffic inside the loop: each grid step pins a tile of rays in VMEM
(scalar-SoA, lanes=rays), keeps the full (T, 10) triangle table resident,
and unrolls Möller–Trumbore over the (compile-time) triangle count on the
VPU, carrying the running (t, normal, mat) winner in registers.

Triangle rows follow the PacketBVH leaf layout for geometry [v0.xyz,
e1.xyz, e2.xyz] with the material id in slot 9 as an f32 VALUE — NOT an
int32 bit-pattern like the XLA-side leaf rows: small-int bit patterns
are denormal floats, and the TPU VPU flushes denormals to zero inside
the kernel's jnp.where winner selects, silently zeroing every material
(found round 3: c2 with this kernel rendered the Cornell box all-white
at RMSE 2.4 while t/normals matched exactly; interpret mode does not
flush, so CPU tests saw nothing). Values 0..16M are exact in f32, so
value-carry is lossless. Degenerate (zero-edge) padding rows are
rejected by the determinant epsilon like everywhere else (A.5).

Falls back to interpret mode off-TPU so the same code path is exercised by
the CPU test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import T_MIN, TRI_EPS

TILE = 1024          # rays per grid step (8 x 128 f32 tiles)
MAX_TRIS = 64        # VMEM-resident unrolled loop bound
# Opt-in (see trace.intersect): 1.6x faster than the fused jnp broadcast on
# v5e at the KERNEL level, but the round-3 end-to-end decision run
# (benchmarks/probe_c2kernel.py) measured c2-cornell at 35.23 ON vs
# 35.06 OFF Mrays/s — a tie inside relay noise, because small-scene
# intersection is not c2's bottleneck. RMSE vs oracle with the kernel ON
# is 0.0 (after the denormal material fix below), but float-op
# reordering still forfeits byte-identical goldens on other configs, so
# with zero measured upside ENABLE stays False.
ENABLE = False


def _kernel(ox, oy, oz, dx, dy, dz, tmax, tri, t_o, nx_o, ny_o, nz_o, m_o):
    n_tris = tri.shape[0]
    t_best = tmax[:]
    nx = jnp.zeros_like(t_best)
    ny = jnp.zeros_like(t_best)
    nz = jnp.zeros_like(t_best)
    mat = jnp.zeros_like(t_best)  # f32 VALUE (denormal-safe), cast outside

    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    rox, roy, roz = ox[:], oy[:], oz[:]

    for j in range(n_tris):  # static unroll: whole table in VMEM
        v0x, v0y, v0z = tri[j, 0], tri[j, 1], tri[j, 2]
        e1x, e1y, e1z = tri[j, 3], tri[j, 4], tri[j, 5]
        e2x, e2y, e2z = tri[j, 6], tri[j, 7], tri[j, 8]
        mb = tri[j, 9]

        # pvec = d x e2
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        nd = jnp.abs(det) > TRI_EPS
        inv = 1.0 / jnp.where(nd, det, 1.0)
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        ok = (
            nd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > T_MIN) & (t < t_best)
        )
        # geometric normal e1 x e2 (normalized by the caller's math below)
        gx = e1y * e2z - e1z * e2y
        gy = e1z * e2x - e1x * e2z
        gz = e1x * e2y - e1y * e2x
        glen = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz,
                                         1e-24))
        t_best = jnp.where(ok, t, t_best)
        nx = jnp.where(ok, gx * glen, nx)
        ny = jnp.where(ok, gy * glen, ny)
        nz = jnp.where(ok, gz * glen, nz)
        mat = jnp.where(ok, mb, mat)

    t_o[:] = t_best
    nx_o[:] = nx
    ny_o[:] = ny
    nz_o[:] = nz
    m_o[:] = mat


@partial(jax.jit, static_argnames=("interpret",))
def nearest_tri_small(o, d, tri_rows, t_max, interpret: bool = False):
    """Nearest triangle via the Pallas kernel.

    o, d: (N, 3) rays; tri_rows: (T, 10) f32 with T <= MAX_TRIS (PacketBVH
    leaf row layout); t_max: (N,) search window. Returns (t, n, mat, found)
    in the caller's conventions (mat only valid where found).
    """
    n = o.shape[0]
    pad = (-n) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 (pad, 3))]
        )
        t_max = jnp.concatenate([t_max, jnp.zeros(pad, jnp.float32)])
    n_pad = o.shape[0]
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.asarray(t_max, jnp.float32)]

    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(tri_rows.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad,), jnp.float32)] * 5

    t, nx, ny, nz, matf = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(*comps, tri_rows)

    t = t[:n]
    normal = jnp.stack([nx[:n], ny[:n], nz[:n]], axis=-1)
    mat = matf[:n].astype(jnp.int32)
    found = t < jnp.asarray(t_max[:n], jnp.float32)
    return t, normal, mat, found


def tri_rows_from_scene(scene) -> np.ndarray:
    """Pack a (small) scene's triangle soup into kernel rows."""
    t = np.zeros((scene.tri_v0.shape[0], 10), np.float32)
    t[:, 0:3] = np.asarray(scene.tri_v0)
    t[:, 3:6] = np.asarray(scene.tri_e1)
    t[:, 6:9] = np.asarray(scene.tri_e2)
    t[:, 9] = np.asarray(scene.tri_mat, np.float32)  # value, not bits
    return t
