"""Raw device probes for the treelet design space.

Measures, on the real device:
  * dense Moller-Trumbore throughput: P packets x T tris x 128 rays (VPU)
  * row-gather cost vs row width (the treelet leaf fetch)

Prints one JSON line per probe.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent), str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time, device_time_fused

T_MIN = 1e-3


def dense_mt(tri, ox, oy, oz, dx, dy, dz, t_cap):
    """tri: (P, T, 10); rays (P, R). Returns per-ray min t (P, R)."""
    def tc(k):
        return tri[:, :, k][:, :, None]

    v0x, v0y, v0z = tc(0), tc(1), tc(2)
    e1x, e1y, e1z = tc(3), tc(4), tc(5)
    e2x, e2y, e2z = tc(6), tc(7), tc(8)
    rdx, rdy, rdz = dx[:, None, :], dy[:, None, :], dz[:, None, :]
    rox, roy, roz = ox[:, None, :], oy[:, None, :], oz[:, None, :]
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    nd = jnp.abs(det) > 1e-8
    invd = 1.0 / jnp.where(nd, det, 1.0)
    tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (rdx * qvx + rdy * qvy + rdz * qvz) * invd
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * invd
    ok = nd & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > T_MIN) \
        & (t < t_cap[:, None, :])
    t = jnp.where(ok, t, jnp.inf)
    return jnp.min(t, axis=1)


def main() -> None:
    rng = np.random.default_rng(0)
    R = 128

    # --- dense MT throughput at several T -------------------------------
    for P, T in [(1024, 32), (1024, 64), (256, 128), (256, 256), (64, 512),
                 (64, 1024)]:
        tri = jnp.asarray(rng.standard_normal((P, T, 10)), jnp.float32)
        rays = [jnp.asarray(rng.standard_normal((P, R)), jnp.float32)
                for _ in range(6)]
        cap = jnp.full((P, R), jnp.inf, jnp.float32)
        f = jax.jit(dense_mt)
        sec = device_time_fused(f, tri, *rays, cap, iters=256)
        pairs = P * T * R
        print(json.dumps({
            "probe": f"dense_mt_P{P}_T{T}", "us": round(sec * 1e6, 1),
            "gpairs_s": round(pairs / sec / 1e9, 1),
            "ns_per_ray_tri": round(sec / pairs * 1e9, 4)}))

    # --- gather cost vs row width ----------------------------------------
    for rows, width in [(8192, 16), (8192, 64), (8192, 320),
                        (2048, 1280), (512, 2560), (512, 5120), (128, 10240)]:
        table = jnp.asarray(
            rng.standard_normal((4096, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 4096, rows), jnp.int32)

        def g(table, idx):
            return table[idx].sum(axis=-1)

        f = jax.jit(g)
        sec = device_time_fused(f, table, idx, iters=256)
        print(json.dumps({
            "probe": f"gather_{rows}rows_w{width}",
            "us": round(sec * 1e6, 1),
            "ns_per_row": round(sec / rows * 1e9, 2),
            "gb_s": round(rows * width * 4 / sec / 1e9, 1)}))


def probe_pallas_leaf():
    """XLA dense leaf phase vs the Pallas VMEM-resident kernel (M3)."""
    import json
    import numpy as np
    from tpurt.kernels import leaf as leaf_k
    from tpurt.bvh import LEAF_F, PACKET_LEAF_N as LN

    rng = np.random.default_rng(1)
    for P in (1024, 128):
        tri = rng.standard_normal((P, LEAF_F, LN)).astype(np.float32)
        tri[:, 9:11, :] = 0
        rows = jnp.asarray(tri.reshape(P, LEAF_F * LN))
        rays = [jnp.asarray(rng.standard_normal((P, 128)), np.float32)
                for _ in range(6)]
        cap = jnp.full((P, 128), 1e30, jnp.float32)
        pend = jnp.ones((P,), jnp.int32)

        f = jax.jit(lambda *a: leaf_k.leaf_phase(*a)[0])
        sec = device_time_fused(f, rows, *rays, cap, pend, iters=256)
        print(json.dumps({"probe": f"pallas_leaf_P{P}",
                          "us": round(sec * 1e6, 1),
                          "gpairs_s": round(P * LN * 128 / sec / 1e9, 2)}))

        # the XLA leaf phase on identical inputs: component-major rows,
        # same math, same winner attribute selection
        def xla_leaf(rows, ox, oy, oz, dx, dy, dz, cap, pend):
            tri = rows.reshape(P, LEAF_F, LN)

            def tc(k):
                return tri[:, k][:, :, None]

            v0x, v0y, v0z = tc(0), tc(1), tc(2)
            e1x, e1y, e1z = tc(3), tc(4), tc(5)
            e2x, e2y, e2z = tc(6), tc(7), tc(8)
            matb = jax.lax.bitcast_convert_type(tri[:, 9], jnp.int32)
            rdx, rdy, rdz = dx[:, None, :], dy[:, None, :], dz[:, None, :]
            rox, roy, roz = ox[:, None, :], oy[:, None, :], oz[:, None, :]
            pvx = rdy * e2z - rdz * e2y
            pvy = rdz * e2x - rdx * e2z
            pvz = rdx * e2y - rdy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            nd = jnp.abs(det) > 1e-8
            invd = 1.0 / jnp.where(nd, det, 1.0)
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (rdx * qvx + rdy * qvy + rdz * qvz) * invd
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * invd
            ok = nd & (u >= 0) & (v >= 0) & (u + v <= 1) \
                & (t > 1e-3) & (t < cap[:, None, :]) \
                & (pend != 0)[:, None, None]
            t = jnp.where(ok, t, 3e38)
            tj = jnp.min(t, axis=1)
            j = jnp.argmin(t, axis=1)
            onehot = jnp.arange(LN)[None, :, None] == j[:, None, :]
            gnx = e1y[:, :, 0] * e2z[:, :, 0] - e1z[:, :, 0] * e2y[:, :, 0]
            w_nx = jnp.sum(gnx[:, :, None] * onehot.astype(jnp.float32),
                           axis=1)
            w_m = jnp.sum(jnp.where(onehot, matb[:, :, None], 0), axis=1)
            return tj, w_nx, w_m

        f2 = jax.jit(xla_leaf)
        sec = device_time_fused(f2, rows, *rays, cap, pend, iters=256)
        print(json.dumps({"probe": f"xla_leaf_P{P}",
                          "us": round(sec * 1e6, 1),
                          "gpairs_s": round(P * LN * 128 / sec / 1e9, 2)}))


if __name__ == "__main__":
    import sys
    if "--pallas" in sys.argv:
        probe_pallas_leaf()
    else:
        main()
        probe_pallas_leaf()
