"""Reduced-precision lever class (round-5 VERDICT item 1): microprobes.

The round-4 frame census prices three terms with an untested precision
axis: iota_reduce (dense MT + min/argmin) 24% of wall, or_reduce (slab
compute) 14%, slice_reduce (the 12-column sublane->lane relayouts of
each adv step's node-row gather) 14%. This probe prices the axis from
three directions before any production change:

  A. VPU dtype throughput, slab-shaped: the exact slab_any2 compute
     ((P,1) column broadcasts against (P,R) ray math, packed-hitcode
     or-reduce) in f32 vs bf16. If the VPU does not pack bf16 2x, the
     or_reduce share is dead for compute and only storage wins remain.
  B. VPU dtype throughput, MT-shaped: the dense (P, DL, R)
     Moller-Trumbore t + min/argmin in f32 vs bf16 (prices the opt-in
     bf16-MT flag, 24% share).
  C. Packed-u32 node rows: box coords outward-rounded to bf16 and
     packed (lo|hi per axis per child) two-per-u32 slot — the node row
     carries 6 box slots instead of 12, so the per-step column
     relayout traffic halves while ALL slab arithmetic stays f32
     (bf16->f32 expansion is exact). Conservative by construction:
     a looser box can only ADD subtree visits, never miss one, so
     goldens stay byte-identical (same boundary as octant adoption:
     winners can flip only on exact f32 t-ties via drain order).
     Measures the full adv-step chain (gather + extract + slab +
     reduce) both ways and checks the superset property.

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-19, TPU v5e via axon relay):

  A. slab compute (P=1024, R=128, 12 cols, device_time_fused):
       f32  below timer resolution (slope read -4.1 us — the kernel is
            too small for the 256-iter slope at this width)
       bf16 6.6 us/call
     -> bf16 is NOT faster; no VPU packing gain through this XLA path.
  B. dense MT (P=1024, DL=32, R=128):
       f32  125.4 us/call      bf16 106.9 us/call     -> 1.17x only
       finite-t mismatch: some f32-finite hits go inf in bf16 (hit
       classification moves, as expected — flag-only territory).
  C. packed-u32 node rows (c3 blob tree, Mi=real, P=1024, 8-step chain):
       superset property PASS; extra-visit rate +1.1% (random rays)
       f32 rows   87.2 us/chain    packed 81.8 us/chain  -> 1.067x
  C-e2e (quick_tpu c3-mesh TPURT_SPP=128 contract, one process per
  setting, interleaved same evening so relay drift is controlled):
       f32 rows : 8.287 / 8.286 Mrays/s (34.144 / 34.145 s)
       packed   : 8.276 / 8.274 / 8.279 Mrays/s (34.19 / 34.20 / 34.17)
       rays_cast identical both ways (282,936,301 — not even a t-tie
       flip on this workload); within-setting spread +-0.002, across
       -0.012 -> a real, reproducible -0.15%.

VERDICT:
  * A (bf16 slab COMPUTE): REFUTED — the VPU runs bf16 no faster than
    f32 here, and directed rounding would need Ize-style eps inflation
    on top. Slab math stays f32.
  * B (bf16 dense MT): 1.17x isolated on the 24% census term -> ~+4%
    e2e ceiling, NOT golden-safe. Parked: the measured ratio is too
    thin to justify a non-exact fork of the drain (the round-4 lesson:
    isolated-kernel wins of <1.2x have never survived the full
    kernel). Re-open only if a future toolchain lowers bf16 2x.
  * C (packed bf16 STORAGE, f32 math): REFUTED for throughput — the
    isolated 6.7% chain win inverts to a reproducible -0.15% e2e (the
    +1.1% extra node visits from outward rounding outweigh the halved
    column extraction; conservation law again). bvh.PK_BF16_PACK stays
    default-OFF; the dtype-branched kernel path + pack helper remain
    in-tree (WIDE_ENABLE precedent: small, localized, exactness-tested
    — tests/test_bvh.py::test_bf16_*) for tree sizes where the HBM
    halving matters. With this, ALL THREE reduced-precision fronts are
    measured and closed: ~52% of the round-4 census (iota_reduce 24% +
    or_reduce 14% + slice_reduce 14%) has no recoverable precision
    win on this chip+toolchain.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

P, R, DL = 1024, 128, 32
T_MIN = 1e-3


# --- A: slab compute dtype --------------------------------------------------

def slab_code(rows, t_best, oxs, ixs):
    """slab_any2's exact shape: 12 (P,1) column broadcasts, min/max
    chain, packed int32 hitcode, single or-reduce over lanes."""
    dt = rows.dtype
    code = None
    for bit, off in ((1, 0), (2, 6)):
        tn = jnp.full(t_best.shape, jnp.asarray(T_MIN, dt))
        tf = t_best
        for k in range(3):
            t0 = (rows[:, off + k:off + k + 1] - oxs[k]) * ixs[k]
            t1 = (rows[:, off + k + 3:off + k + 4] - oxs[k]) * ixs[k]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        c = jnp.where(tn <= tf, jnp.int32(bit), jnp.int32(0))
        code = c if code is None else code | c
    return jax.lax.reduce(code, jnp.int32(0), jax.lax.bitwise_or, (1,))


# --- B: dense MT dtype -------------------------------------------------------

def mt_min(v0, e1, e2, ox, dx):
    """Dense MT t over (P, DL, R) + min/argmin — the iota_reduce term.
    v0/e1/e2: (3, P, DL); ox/dx: (3, P, R)."""
    dt = v0.dtype
    pv = [dx[(k + 1) % 3][:, None] * e2[(k + 2) % 3][:, :, None]
          - dx[(k + 2) % 3][:, None] * e2[(k + 1) % 3][:, :, None]
          for k in range(3)]
    det = sum(e1[k][:, :, None] * pv[k] for k in range(3))
    nd = jnp.abs(det) > jnp.asarray(1e-7, dt)
    invd = jnp.asarray(1.0, dt) / jnp.where(nd, det, jnp.asarray(1.0, dt))
    tv = [ox[k][:, None] - v0[k][:, :, None] for k in range(3)]
    u = sum(tv[k][:, :, :] * pv[k] for k in range(3)) * invd
    qv = [tv[(k + 1) % 3] * e1[(k + 2) % 3][:, :, None]
          - tv[(k + 2) % 3] * e1[(k + 1) % 3][:, :, None]
          for k in range(3)]
    v = sum(dx[k][:, None] * qv[k] for k in range(3)) * invd
    t = sum(e2[k][:, :, None] * qv[k] for k in range(3)) * invd
    ok = (nd & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > jnp.asarray(T_MIN, dt)))
    t = jnp.where(ok, t, jnp.asarray(jnp.inf, dt))
    return jnp.min(t, axis=1), jnp.argmin(t, axis=1)


# --- C: packed-u32 node rows -------------------------------------------------

def bf16_down_bits(x: np.ndarray) -> np.ndarray:
    """f32 -> bf16 bits (as u32<<16 slot), rounded toward -inf."""
    b = x.astype(np.float32).view(np.uint32)
    t = b & np.uint32(0xFFFF0000)
    lost = (b & np.uint32(0xFFFF)) != 0
    neg = (b & np.uint32(0x80000000)) != 0
    # negative + inexact: step one bf16 ulp toward -inf (bits grow)
    t = np.where(lost & neg, t + np.uint32(0x10000), t)
    return t


def bf16_up_bits(x: np.ndarray) -> np.ndarray:
    """f32 -> bf16 bits (as u32<<16 slot), rounded toward +inf."""
    b = x.astype(np.float32).view(np.uint32)
    t = b & np.uint32(0xFFFF0000)
    lost = (b & np.uint32(0xFFFF)) != 0
    neg = (b & np.uint32(0x80000000)) != 0
    t = np.where(lost & ~neg, t + np.uint32(0x10000), t)
    return t


def pack_rows(nodes_f32: np.ndarray) -> np.ndarray:
    """(M, 16) f32 CIP rows -> (M, 16) u32: slots 0-5 hold (lo|hi)
    bf16 pairs per (child, axis) — lo outward-down in the LOW half,
    hi outward-up in the HIGH half; slots 6-8 carry metaL/metaR/skip
    bit-unchanged. (Production variant shrinks the row; the probe
    keeps width 16 so the GATHER is identical and only the column
    count changes.)"""
    m = nodes_f32.shape[0]
    out = np.zeros((m, 16), np.uint32)
    for child, off in ((0, 0), (1, 6)):
        for k in range(3):
            lo = bf16_down_bits(nodes_f32[:, off + k])
            hi = bf16_up_bits(nodes_f32[:, off + k + 3])
            out[:, child * 3 + k] = (lo >> np.uint32(16)) | hi
    out[:, 6:9] = nodes_f32[:, 12:15].view(np.uint32)
    return out


def adv_chain_f32(nodes, nid0, t_best, oxs, ixs, steps=8):
    """Gather + 12-col slab + reduce, chained `steps` times (the next
    nid derives from the code so the chain serializes like phase A)."""
    nid = nid0
    acc = jnp.zeros((nodes.shape[0] and t_best.shape[0],), jnp.int32)
    m = nodes.shape[0]
    for _ in range(steps):
        rows = nodes.at[nid].get(mode="promise_in_bounds")
        code = slab_code(rows, t_best, oxs, ixs)
        acc = acc + code
        nid = (nid * 1103515245 + 12345 + code) % m
    return acc.astype(jnp.float32), nid


def adv_chain_packed(nodes_u, nid0, t_best, oxs, ixs, steps=8):
    nid = nid0
    acc = jnp.zeros((t_best.shape[0],), jnp.int32)
    m = nodes_u.shape[0]
    for _ in range(steps):
        rows = nodes_u.at[nid].get(mode="promise_in_bounds")
        code = None
        for bit, base in ((1, 0), (2, 3)):
            tn = jnp.full(t_best.shape, jnp.float32(T_MIN))
            tf = t_best
            for k in range(3):
                cu = rows[:, base + k:base + k + 1]
                lo = jax.lax.bitcast_convert_type(
                    cu << jnp.uint32(16), jnp.float32)
                hi = jax.lax.bitcast_convert_type(
                    cu & jnp.uint32(0xFFFF0000), jnp.float32)
                t0 = (lo - oxs[k]) * ixs[k]
                t1 = (hi - oxs[k]) * ixs[k]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            c = jnp.where(tn <= tf, jnp.int32(bit), jnp.int32(0))
            code = c if code is None else code | c
        code = jax.lax.reduce(code, jnp.int32(0), jax.lax.bitwise_or, (1,))
        acc = acc + code
        nid = (nid * 1103515245 + 12345 + code) % m
    return acc.astype(jnp.float32), nid


def main():
    import os
    iters = int(os.environ.get("PROBE_ITERS", "256"))
    rng = np.random.default_rng(0)

    # ray SoA typical of a live c3 stage-0: origins in the unit-ish blob
    ox = [jnp.asarray(rng.normal(size=(P, R)), jnp.float32)
          for _ in range(3)]
    ix = [jnp.asarray(1.0 / rng.uniform(0.05, 1.0, size=(P, R)), jnp.float32)
          for _ in range(3)]
    tb = jnp.asarray(rng.uniform(0.5, 30.0, size=(P, R)), jnp.float32)

    # --- A ---
    rows = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)
    t_f32 = device_time_fused(
        lambda r, t: (slab_code(r, t, ox, ix).astype(jnp.float32),),
        rows, tb, iters=iters)
    oxb = [a.astype(jnp.bfloat16) for a in ox]
    ixb = [a.astype(jnp.bfloat16) for a in ix]
    t_bf16 = device_time_fused(
        lambda r, t: (slab_code(r, t, oxb, ixb).astype(jnp.float32),),
        rows.astype(jnp.bfloat16), tb.astype(jnp.bfloat16), iters=iters)
    print(json.dumps({"probe": "A_slab_compute",
                      "f32_us": t_f32 * 1e6, "bf16_us": t_bf16 * 1e6}))

    # --- B ---
    v0 = jnp.asarray(rng.normal(size=(3, P, DL)), jnp.float32)
    e1 = jnp.asarray(rng.normal(size=(3, P, DL)), jnp.float32)
    e2 = jnp.asarray(rng.normal(size=(3, P, DL)), jnp.float32)
    oo = jnp.stack(ox)
    dd = jnp.asarray(rng.normal(size=(3, P, R)), jnp.float32)
    t_f32 = device_time_fused(
        lambda *a: (mt_min(*[x.reshape(3, P, -1) for x in a[:3]],
                           a[3].reshape(3, P, R),
                           a[4].reshape(3, P, R))[0],),
        v0, e1, e2, oo, dd, iters=iters)
    t_bf16 = device_time_fused(
        lambda *a: (mt_min(*[x.reshape(3, P, -1) for x in a[:3]],
                           a[3].reshape(3, P, R),
                           a[4].reshape(3, P, R))[0].astype(jnp.float32),),
        v0.astype(jnp.bfloat16), e1.astype(jnp.bfloat16),
        e2.astype(jnp.bfloat16), oo.astype(jnp.bfloat16),
        dd.astype(jnp.bfloat16), iters=iters)
    tf, _ = jax.jit(mt_min)(v0, e1, e2, oo, dd)
    tb16, _ = jax.jit(mt_min)(v0.astype(jnp.bfloat16),
                              e1.astype(jnp.bfloat16),
                              e2.astype(jnp.bfloat16),
                              oo.astype(jnp.bfloat16),
                              dd.astype(jnp.bfloat16))
    fin = np.isfinite(np.asarray(tf))
    relerr = np.abs(np.asarray(tb16, np.float32) - np.asarray(tf))[fin]
    relerr = float(np.max(relerr / np.maximum(np.abs(np.asarray(tf))[fin],
                                              1e-6))) if fin.any() else 0.0
    print(json.dumps({"probe": "B_dense_mt",
                      "f32_us": t_f32 * 1e6, "bf16_us": t_bf16 * 1e6,
                      "bf16_max_relerr_finite_t": relerr}))

    # --- C ---
    from tpurt import config
    cfg = config.PRESETS["c3-mesh"]
    scene, _ = config.build_scene(cfg)
    nf = np.asarray(scene.pk_nodes)              # (Mi, 16) f32
    m = nf.shape[0]
    nu = pack_rows(nf)
    nid0 = jnp.asarray(rng.integers(0, m, size=(P,)), jnp.int32)
    nj = jnp.asarray(nf)
    nuj = jnp.asarray(nu)

    # exact codes vs packed codes over sampled rows for one fixed ray set:
    sub = jnp.asarray(rng.integers(0, m, size=(4096,)), jnp.int32)
    oxs1 = [a[:1].repeat(4096, 0) for a in ox]
    ixs1 = [a[:1].repeat(4096, 0) for a in ix]
    tb1 = tb[:1].repeat(4096, 0)
    code_f = np.asarray(jax.jit(lambda: slab_code(
        nj.at[sub].get(), tb1, oxs1, ixs1))())
    rowsu = nuj[np.asarray(sub)]

    def packed_code():
        code = None
        for bit, base in ((1, 0), (2, 3)):
            tn = jnp.full(tb1.shape, jnp.float32(T_MIN))
            tf2 = tb1
            for k in range(3):
                cu = rowsu[:, base + k:base + k + 1]
                lo = jax.lax.bitcast_convert_type(
                    cu << jnp.uint32(16), jnp.float32)
                hi = jax.lax.bitcast_convert_type(
                    cu & jnp.uint32(0xFFFF0000), jnp.float32)
                t0 = (lo - oxs1[k]) * ixs1[k]
                t1 = (hi - oxs1[k]) * ixs1[k]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf2 = jnp.minimum(tf2, jnp.maximum(t0, t1))
            c = jnp.where(tn <= tf2, jnp.int32(bit), jnp.int32(0))
            code = c if code is None else code | c
        return jax.lax.reduce(code, jnp.int32(0), jax.lax.bitwise_or, (1,))

    code_p = np.asarray(jax.jit(packed_code)())
    superset = bool(np.all((code_f & code_p & 3) == (code_f & 3)))
    extra = float(np.mean((code_p & 3) != (code_f & 3)))
    print(json.dumps({"probe": "C_superset",
                      "superset": superset, "extra_visit_rate": extra}))

    t_f = device_time_fused(
        lambda n0, t: adv_chain_f32(nj, n0, t, ox, ix),
        nid0, tb, iters=min(64, iters))
    t_p = device_time_fused(
        lambda n0, t: adv_chain_packed(nuj, n0, t, ox, ix),
        nid0, tb, iters=min(64, iters))
    print(json.dumps({"probe": "C_adv_chain",
                      "f32_us": t_f * 1e6, "packed_us": t_p * 1e6}))


if __name__ == "__main__":
    main()
