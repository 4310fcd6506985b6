"""Pallas TPU kernel for the phase-A slab step (round 4).

The post-surgery HLO census (benchmarks/dump_hlo.py) prices each adv
step at two dominant kernels XLA refuses to merge: the node-row column
extraction (slice_reduce — 12 sublane->lane transposes of the (P, 16)
gather result, ~14% of the stage-0 round's estimated cycles) and the
slab hitcode reduce (or_reduce, ~20%). The extraction exists only
because XLA's layout assignment wants the (P,) column operands in lane
layout before the reduce fusion will consume them; inside one Mosaic
kernel the columns are plain (PB, 1) sublane slices broadcast along
lanes — no relayout at all. This kernel fuses extract + slab + lane
reduce + meta decode into ONE launch per adv step:

    inputs : rows (P, 16) f32 (the XLA gather's output, unchanged),
             ray SoA ox/oy/oz, inv-dir ix/iy/iz, t_best — (P, R) each
    outputs: hitcode (P,) i32 (bit0 = left box hit, bit1 = right,
             bits 2-3 = the meta leaf flags), m_l / m_r / skip (P,) i32

The slab arithmetic is the identical expression tree as
traverse.slab_any2 (IEEE f32 on the VPU), so hitcodes are bit-equal;
the meta columns are loaded as f32 and bitcast in-kernel, the exact
pattern kernels/leaf.py uses for mat/gid bits (bit-exact-pinned there).

Adoption is decided by benchmarks/probe_slabk.py (the Pallas track
record here is three refutations — kernels/traverse.py module
docstring — but each lost on dynamic gathers or dense-phase VMEM
residency; this kernel has neither: no dynamic indexing, one small
block, pure VPU elementwise + lane reduce).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import T_MIN

R = 128


def _kernel(rows_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            t_ref, code_ref, ml_ref, mr_ref, skip_ref):
    rows = rows_ref[:]                                   # (PB, 16)
    t_best = t_ref[:]                                    # (PB, R)
    rays = ((ox_ref[:], ix_ref[:]), (oy_ref[:], iy_ref[:]),
            (oz_ref[:], iz_ref[:]))

    hits = []
    for off in (0, 6):
        tn = jnp.full(t_best.shape, jnp.float32(T_MIN))
        tf = t_best
        for k, (oc, ic) in enumerate(rays):
            t0 = (rows[:, off + k:off + k + 1] - oc) * ic
            t1 = (rows[:, off + k + 3:off + k + 4] - oc) * ic
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hits.append(jnp.any(tn <= tf, axis=1))           # (PB,)

    meta = jax.lax.bitcast_convert_type(rows[:, 12:15], jnp.int32)
    m_l, m_r, skip = meta[:, 0], meta[:, 1], meta[:, 2]
    code = (hits[0].astype(jnp.int32)
            | (hits[1].astype(jnp.int32) << 1)
            | ((m_l & 1) << 2) | ((m_r & 1) << 3))
    code_ref[:] = code
    ml_ref[:] = m_l
    mr_ref[:] = m_r
    skip_ref[:] = skip


@functools.partial(jax.jit, static_argnames=("interpret",))
def slab_step(rows, ox, oy, oz, ix, iy, iz, t_best,
              interpret: bool = False):
    """One adv step's slab + meta decode for P packets.

    rows: (P, 16) gathered CIP node rows; ox..iz, t_best: (P, 128).
    Returns (code, m_l, m_r, skip), each (P,) int32 — code bits as in
    traverse.slab_any2 with the leaf flags riding bits 2-3.
    """
    p = rows.shape[0]
    # block = min(p, 1024) rows: the (p,) int32 outputs carry XLA's 1D
    # T(1024) tiling, and Mosaic requires the output block to match it
    # (a (128,)-block failed layout verification). VMEM at 1024 rows:
    # 7x(1024,128) f32 inputs ~3.7 MB + the slab live set ~3 MB.
    pb = min(p, 1024)
    assert p % pb == 0, p
    grid = (p // pb,)

    bs_row = pl.BlockSpec((pb, 16), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    bs_ray = pl.BlockSpec((pb, R), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((pb,), lambda i: (i,),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((p,), jnp.int32)] * 4
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bs_row] + [bs_ray] * 7,
        out_specs=[bs_out] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(rows, ox, oy, oz, ix, iy, iz, t_best)
