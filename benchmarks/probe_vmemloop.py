"""Premise probe for the VMEM-resident traversal megakernel.

The round-3 scheduling campaign (probe_fanout / drainbatch / advdrain)
ended with every knob at its measured joint optimum and ~half of c3
bounce-1 traversal wall attributable to per-op dispatch links (~0.8-4 us
each, probe_chain.py). Round 2 rejected a Pallas megakernel because
per-packet node fetches would be one HBM DMA per dynamic row — but the
ENTIRE c3 BVH fits in VMEM (binary nodes 2559x16 f32 = 164 KB + leaf
rows 2560x384 f32 = 3.9 MB « 16 MB/core), which removes the DMA
objection entirely: in-kernel traversal steps become VMEM loads + VPU
flops with NO dispatch links at all.

This probe measures the in-kernel per-step cost of the hot structure:
PB packets per grid cell, each step = PB dynamic (1,16) node-row loads
from a VMEM-resident table + a 2-box slab test against the cell's
(PB,128) ray SoA + lane-any reduce + cursor select. T steps in a
fori_loop; grid covers 1024 packets. Compare against the measured XLA
figures: ~5 us per full-width (1024-packet) advance step, i.e. ~5 ns
per packet-step of volume plus ~45 us/round of links.

MEASURED (TPU v5e via axon relay, 2026-08-17):

    vmem_loop_T64:  2.29 us per 8-packet cell step = 286 ns/packet-step
    vmem_loop_T128: 2.29 us per cell step (perfectly linear in T)

VERDICT: REFUTED — and this closes the megakernel question with a
number, where round 2 closed it with an argument. In-kernel, one
traversal step for an 8-packet cell costs 2.29 us: the 8 loop-carried
scalar dynamic row loads + per-packet (1,128) slab ops (wasting 7/8
sublanes) + scalar lane-any reduces dominate, and Mosaic exposes no
vector gather from VMEM to amortize them. The XLA machinery — hardware
gather at ~1.3 ns/row + full-width (1024,128) vector ops — is ~7x
cheaper per packet-step (39 ns incl. links) than the best in-kernel
structure found. The per-op dispatch links are the price of admission
for XLA's gather+vector hardware, and they are cheaper than doing the
memory system's job in software. The XLA packet design with staged
compaction is confirmed as the architecture optimum on this hardware;
the ~10 ms c3 bounce-1 wall stands as the BASELINE.md ceiling model's
prediction, now falsified-against from BOTH sides (links irreducible in
XLA, kernel-resident loop 7x worse).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

M = 2560      # node rows
PB = 8        # packets per grid cell
R = 128
P = 1024      # total packets


def make_kernel(T: int):
    def kernel(nodes_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
               seed_ref, out_ref):
        # per-packet cursors as unrolled scalars
        cursors = [seed_ref[k, 0] for k in range(PB)]
        acc = jnp.zeros((PB, R), jnp.float32)

        def body(i, carry):
            acc, *cur = carry
            new_cur = []
            hits = []
            for k in range(PB):
                nid = cur[k]
                row = nodes_ref[pl.ds(nid, 1), :]          # (1, 16) VMEM
                ox, oy, oz = (ox_ref[k, :], oy_ref[k, :], oz_ref[k, :])
                ix, iy, iz = (ix_ref[k, :], iy_ref[k, :], iz_ref[k, :])
                # 2-box slab vs this packet's 128 rays
                hit2 = []
                for off in (0, 6):
                    tn = jnp.full((R,), 1e-3, jnp.float32)
                    tf = jnp.full((R,), 3e38, jnp.float32)
                    for c, (oc, icp) in enumerate(((ox, ix), (oy, iy),
                                                   (oz, iz))):
                        lo = row[0, off + c]
                        hi = row[0, off + c + 3]
                        t0 = (lo - oc) * icp
                        t1 = (hi - oc) * icp
                        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                    hit2.append(jnp.any(tn <= tf))
                go_l, go_r = hit2
                m_l = row[0, 12].astype(jnp.int32)
                m_r = row[0, 13].astype(jnp.int32)
                nxt = jnp.where(go_l, (nid + m_l) % M,
                                jnp.where(go_r, (nid + m_r) % M,
                                          (nid * 7 + 1) % M))
                new_cur.append(nxt)
                hits.append(go_l)
            acc = acc + jnp.stack(
                [jnp.where(h, 1.0, 0.0) for h in hits])[:, None]
            return (acc, *new_cur)

        out = jax.lax.fori_loop(0, T, body, (acc, *cursors))
        out_ref[:] = out[0]
    return kernel


def main() -> None:
    global pl, pltpu
    from jax.experimental import pallas as pl  # noqa
    from jax.experimental.pallas import tpu as pltpu  # noqa

    rs = np.random.default_rng(0)
    nodes = jnp.asarray(rs.standard_normal((M, 16)).astype(np.float32))
    # meta slots hold small ints so cursor hops stay in range
    nodes = nodes.at[:, 12:14].set(
        jnp.asarray(rs.integers(1, 50, (M, 2)), jnp.float32))
    soa = [jnp.asarray(rs.standard_normal((P, R)), jnp.float32)
           for _ in range(6)]
    seeds = jnp.asarray(rs.integers(0, M, (P, 1)), jnp.int32)

    import os
    interpret = os.environ.get("VMEMLOOP_INTERPRET", "") == "1"
    for T in (64, 128):
        kern = make_kernel(T)
        bs_ray = pl.BlockSpec((PB, R), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern,
            grid=(P // PB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [bs_ray] * 6
            + [pl.BlockSpec((PB, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)],
            out_specs=bs_ray,
            out_shape=jax.ShapeDtypeStruct((P, R), jnp.float32),
            interpret=interpret,
        )
        fn = jax.jit(call)
        if interpret:
            print(json.dumps({"probe": f"interp_T{T}", "sum": float(
                jnp.sum(fn(nodes, *soa, seeds)))}), flush=True)
            continue

        sec = device_time_fused(fn, nodes, *soa, seeds, iters=32)
        per_step = sec / (T * (P // PB))
        print(json.dumps({
            "probe": f"vmem_loop_T{T}", "ms": round(sec * 1e3, 3),
            "us_per_cell_step": round(sec / (T * (P // PB)) * 1e6, 3),
            "ns_per_packet_step": round(per_step / PB * 1e9, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
