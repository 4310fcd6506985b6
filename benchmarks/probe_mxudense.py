"""Can the dense leaf phase ride the MXU instead of the VPU?

After drain batching (probe_drainbatch.py) the dense Möller–Trumbore
phase is the traversal floor (~50% of wall). It runs on the VPU: ~60
f32 flops per (tri, ray) pair as fused elementwise ops over
(P, D*LN, R) blocks. But every MT numerator is BILINEAR in (o, d):

    det  = d · (e2 x e1)
    tnum = o · n - v0 · n               (n = e1 x e2)
    unum = sum_ij A_ij o_i d_j - d · (e2 x v0)   (A from e2)
    vnum = sum_ij B_ij o_i d_j - d · (v0 x e1)   (B from e1)

so with a per-ray feature vector f = [o (x) d (9), d (3), o (3), 1] (16)
and a per-triangle (4, 16) coefficient matrix, the whole phase is ONE
batched matmul (P, D*LN, 16*4 padded) @ (P, 16, R) -> MXU, which runs
bf16 at ~60x the VPU's f32 rate. The catch: bf16 t-values are
approximate -> winner selection near ties can differ; an exact f32
refinement of the argmin winner (1 tri per ray, VPU) restores exact
output values wherever the winner agrees.

This probe measures, at traversal-realistic shapes:
  * vpu_dense:   the production dense phase math (P, DL, R)
  * mxu_f32:     einsum with full f32 (HIGHEST) precision
  * mxu_bf16:    einsum with bf16 inputs (DEFAULT precision)
  * row_gather:  (P, D) row gathers at the FAT coefficient row size
                 (LN*64 f32) vs the current LN*12
  * refine:      per-ray winner recompute (P, R) exact MT

MEASURED (TPU v5e via axon relay, 2026-08-17):

    vpu_dense  (P=1024, DL=128, R=128)   331 us   (= 53 Gpairs/s: the
                                                   probe-dense unit rate,
                                                   i.e. VPU f32 peak)
    mxu_f32_highest                     1568 us
    mxu_default                         1239 us
    mxu_bf16                            1036 us
    gather fat/cur rows, refine pass:   at the timer noise floor (<4 us)

VERDICT: REFUTED, 3-5x the wrong way. Two structural reasons: (1) the
contraction dim K=16 uses 16/128 of the systolic array — batched skinny
matmuls cannot feed the MXU; (2) the einsum's (P, DL, C, R) channel
output materializes 8x the t-array to HBM (~537 MB) before the
elementwise epilogue, so the path is HBM-write-bound regardless of MXU
rate. The VPU dense phase — whose intermediates all fuse to registers —
is already AT ITS ROOFLINE (53 Gpairs/s = ~3.2 Tflop/s f32). Dense MT
cannot be made faster per pair on this hardware; remaining levers are
fewer pairs (culling) or eliminating the per-op dispatch links around
the loop (probe_vmemloop.py: the VMEM-resident Pallas megakernel,
viable now that the whole BVH fits in VMEM).
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

P = 1024      # packets
DL = 128      # D * LN (4 x 32)
R = 128       # rays per packet
K = 16        # ray feature dim
C = 8         # output channels (4 used, padded to 8)


def main() -> None:
    rs = np.random.default_rng(0)

    def f32(*shape):
        return jnp.asarray(rs.standard_normal(shape), jnp.float32)

    # ---- vpu_dense: the production expression tree ----------------------
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (
        f32(P, DL, 1) for _ in range(9))
    sox, soy, soz, sdx, sdy, sdz, tb = (f32(P, R) for _ in range(7))

    def vpu_dense(sox, soy, soz, sdx, sdy, sdz, tb):
        rdx, rdy, rdz = (sdx[:, None, :], sdy[:, None, :], sdz[:, None, :])
        rox, roy, roz = (sox[:, None, :], soy[:, None, :], soz[:, None, :])
        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        nondegen = jnp.abs(det) > 1e-12
        invd = 1.0 / jnp.where(nondegen, det, 1.0)
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * invd
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * invd
        valid = nondegen & (u >= 0) & (v >= 0) & (u + v <= 1) \
            & (t > 1e-3) & (t < tb[:, None, :])
        t = jnp.where(valid, t, 3e38)
        tj = jnp.min(t, axis=1)
        j = jnp.argmin(t, axis=1)
        return tj + j.astype(jnp.float32) * 0.0

    def t(name, fn, *args, iters=64):
        sec = device_time_fused(jax.jit(fn), *args, iters=iters)
        print(json.dumps({"probe": name, "us": round(sec * 1e6, 2)}),
              flush=True)

    t("vpu_dense_P1024_DL128", vpu_dense, sox, soy, soz, sdx, sdy, sdz, tb)

    # ---- mxu einsum: (P, DL, K*C-ish) @ (P, K, R) -----------------------
    G = f32(P, DL, C, K)
    F = f32(P, K, R)

    def mxu(precision):
        def run(F):
            out = jnp.einsum("pnck,pkr->pncr", G, F,
                             precision=precision)   # (P, DL, C, R)
            det = out[:, :, 0]
            tnum = out[:, :, 1]
            unum = out[:, :, 2]
            vnum = out[:, :, 3]
            nondegen = jnp.abs(det) > 1e-12
            invd = 1.0 / jnp.where(nondegen, det, 1.0)
            u = unum * invd
            v = vnum * invd
            tt = tnum * invd
            valid = nondegen & (u >= 0) & (v >= 0) & (u + v <= 1) \
                & (tt > 1e-3) & (tt < tb[:, None, :])
            tt = jnp.where(valid, tt, 3e38)
            tj = jnp.min(tt, axis=1)
            j = jnp.argmin(tt, axis=1)
            return tj + j.astype(jnp.float32) * 0.0
        return run

    t("mxu_f32_highest", mxu(jax.lax.Precision.HIGHEST), F)
    t("mxu_default", mxu(jax.lax.Precision.DEFAULT), F)

    Gb = G.astype(jnp.bfloat16)

    def mxu_bf16(F):
        Fb = F.astype(jnp.bfloat16)
        out = jnp.einsum("pnck,pkr->pncr", Gb, Fb,
                         preferred_element_type=jnp.float32)
        det = out[:, :, 0]
        tt = jnp.where(jnp.abs(det) > 1e-12, out[:, :, 1] / det, 3e38)
        tj = jnp.min(tt, axis=1)
        return tj

    t("mxu_bf16", mxu_bf16, F)

    # ---- gathers: fat coefficient rows vs current rows ------------------
    n_rows = 2560
    rows_fat = f32(n_rows, 32 * 64)
    rows_cur = f32(n_rows, 32 * 12)
    idx = jnp.asarray(rs.integers(0, n_rows, (P, 4)), jnp.int32)

    t("gather_fat_P1024x4", lambda i: rows_fat[i].sum(axis=(1, 2)), idx)
    t("gather_cur_P1024x4", lambda i: rows_cur[i].sum(axis=(1, 2)), idx)

    # ---- refine: exact per-ray winner recompute (P*R rays, 1 tri) -------
    w_v0, w_e1, w_e2 = (f32(P * R, 3) for _ in range(3))
    ro, rd = f32(P * R, 3), f32(P * R, 3)

    def refine(ro, rd):
        pv = jnp.cross(rd, w_e2)
        det = jnp.sum(w_e1 * pv, axis=-1)
        invd = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tv = ro - w_v0
        u = jnp.sum(tv * pv, axis=-1) * invd
        qv = jnp.cross(tv, w_e1)
        v = jnp.sum(rd * qv, axis=-1) * invd
        tt = jnp.sum(w_e2 * qv, axis=-1) * invd
        return tt + u * 0.0 + v * 0.0

    t("refine_131k", refine, ro, rd)


if __name__ == "__main__":
    main()
