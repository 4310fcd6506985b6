"""Pallas TPU kernel for the packet-traversal leaf phase (SURVEY.md §7 M3).

The leaf phase is dense Möller–Trumbore of every packet's pending
PACKET_LEAF_N-triangle leaf row against its 128 member rays. As pure jnp
(kernels/traverse.py phase B) XLA materializes several (P, LN, 128) f32
intermediates in HBM — ~16 MB each at P=1024 — so the phase is
HBM-bandwidth-bound, not VPU-bound. This kernel runs the identical math
with a grid over packet blocks, keeping every intermediate in VMEM
(~(PB, LN, 128) tiles), so HBM traffic is exactly inputs + outputs:
leaf rows (P×LN×12 f32), ray SoA (7×P×128 f32), winner outputs
(6×P×128 f32).

Float-op ordering note: the t/valid arithmetic is written identically to
the jnp phase (same expression tree), and TPU VPU ops are IEEE f32, so the
t window math is bit-identical to the jnp leaf phase. The WINNER CONTRACT
differs, however: this kernel writes mat/gid = -1 and normals = 0 where
the leaf improved nothing, while the inline phase B carries the previous
m_best/n accumulators through jnp.where(better, ...). Switching the
production path to this kernel as-is would therefore change outputs; a
caller must re-merge (t, better) against its own accumulators. The module
is probe-only (measured 3x slower than the fused XLA phase — see
kernels/traverse.py module docstring), so this stays latent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh import LEAF_F, PACKET_LEAF_N as LN
from ..geometry import T_MIN, TRI_EPS

R = 128      # rays per packet
PB = 8       # packets per grid step (VMEM budget: ~13 (PB,LN,R) f32 live)
INF = 3.0e38  # python float: jnp scalars would be captured consts in the kernel


def _kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tin_ref, pend_ref,
            t_ref, nx_ref, ny_ref, nz_ref, m_ref, g_ref):
    # component-major leaf rows: slot k = component k of all LN triangles,
    # so every access is a plain 2D slice (Mosaic cannot lower a
    # (PB, LN*F) -> (PB, LN, F) shape cast).
    def tc(k):
        return tri_ref[:, k * LN:(k + 1) * LN][:, :, None]  # (PB, LN, 1)

    v0x, v0y, v0z = tc(0), tc(1), tc(2)
    e1x, e1y, e1z = tc(3), tc(4), tc(5)
    e2x, e2y, e2z = tc(6), tc(7), tc(8)
    matb = jax.lax.bitcast_convert_type(tri_ref[:, 9 * LN:10 * LN],
                                        jnp.int32)
    gidb = jax.lax.bitcast_convert_type(tri_ref[:, 10 * LN:11 * LN],
                                        jnp.int32)

    rox, roy, roz = (ox_ref[:][:, None, :], oy_ref[:][:, None, :],
                     oz_ref[:][:, None, :])               # (PB, 1, R)
    rdx, rdy, rdz = (dx_ref[:][:, None, :], dy_ref[:][:, None, :],
                     dz_ref[:][:, None, :])
    t_best = tin_ref[:]                                   # (PB, R)
    pending = pend_ref[:] != 0                            # (PB, R) row mask

    # pvec = d x e2
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz               # (PB, LN, R)
    nondegen = jnp.abs(det) > TRI_EPS
    invd = 1.0 / jnp.where(nondegen, det, 1.0)
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
        & pending[:, None, :]
    )
    t = jnp.where(valid, t, INF)
    tj = jnp.min(t, axis=1)                               # (PB, R)
    j = jnp.argmin(t, axis=1)
    better = tj < t_best

    # per-leaf-tri geometric normals (PB, LN); winner-select via one-hot
    gnx = e1y[:, :, 0] * e2z[:, :, 0] - e1z[:, :, 0] * e2y[:, :, 0]
    gny = e1z[:, :, 0] * e2x[:, :, 0] - e1x[:, :, 0] * e2z[:, :, 0]
    gnz = e1x[:, :, 0] * e2y[:, :, 0] - e1y[:, :, 0] * e2x[:, :, 0]
    glen = jnp.sqrt(jnp.maximum(gnx**2 + gny**2 + gnz**2, 1e-24))
    gnx, gny, gnz = gnx / glen, gny / glen, gnz / glen

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (PB, LN, R), 1)
              == j[:, None, :])
    ohf = onehot.astype(jnp.float32)
    w_nx = jnp.sum(gnx[:, :, None] * ohf, axis=1)
    w_ny = jnp.sum(gny[:, :, None] * ohf, axis=1)
    w_nz = jnp.sum(gnz[:, :, None] * ohf, axis=1)
    w_m = jnp.sum(jnp.where(onehot, matb[:, :, None], 0), axis=1)
    w_g = jnp.sum(jnp.where(onehot, gidb[:, :, None], 0), axis=1)

    t_ref[:] = jnp.where(better, tj, t_best)
    nx_ref[:] = jnp.where(better, w_nx, 0.0)
    ny_ref[:] = jnp.where(better, w_ny, 0.0)
    nz_ref[:] = jnp.where(better, w_nz, 0.0)
    m_ref[:] = jnp.where(better, w_m, -1)
    g_ref[:] = jnp.where(better, w_g, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_phase(tri_rows, ox, oy, oz, dx, dy, dz, t_in, pending,
               interpret: bool = False):
    """Dense leaf intersection for P packets.

    tri_rows: (P, LEAF_F*LN) gathered component-major leaf rows;
    ox..dz, t_in: (P, 128)
    scalar-SoA rays and per-ray t windows; pending: (P,) int32 (0 = this
    packet has no pending leaf; its rays keep t_in and report no winner).

    Returns (t, nx, ny, nz, mat, gid), each (P, 128): t is the improved
    window; mat/gid are -1 where the leaf improved nothing.
    """
    p = tri_rows.shape[0]
    assert p % PB == 0, p
    grid = (p // PB,)
    pend = jnp.broadcast_to(pending[:, None].astype(jnp.int32), (p, R))

    bs_ray = pl.BlockSpec((PB, R), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    bs_tri = pl.BlockSpec((PB, LN * LEAF_F), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((p, R), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((p, R), jnp.int32)] * 2
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bs_tri] + [bs_ray] * 8,
        out_specs=[bs_ray] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(tri_rows, ox, oy, oz, dx, dy, dz, t_in, pend)
