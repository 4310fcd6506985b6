"""Decide kernels/intersect.ENABLE with an end-to-end c2 bench
(round-3 VERDICT item 5).

Round 2 built the VMEM-resident small-scene brute kernel, measured it
1.6x over the fused jnp broadcast at the KERNEL level, and shipped it
disabled to preserve byte-identical goldens. The VERDICT asked for the
end-to-end number on c2-cornell (the config that runs this path) plus
RMSE vs the oracle (the spec parity bar, SURVEY §7 hard part 4), and a
decision made on those numbers.

Runs the c2 bench config with ENABLE off and on, best-of-3, plus the
RMSE probe for the ON path.

MEASURED (TPU v5e via axon relay, 2026-08-17):

    {"probe": "c2_kernel_off", "mrays_per_s": 35.055, "wall_s": 0.309}
    {"probe": "c2_kernel_on",  "mrays_per_s": 35.227, "wall_s": 0.308}
    {"probe": "c2_kernel_on_rmse", "rmse_vs_oracle": 0.0}

(First run of this probe caught a real TPU-only bug: material ids were
passed as int32 BIT PATTERNS in f32 and the VPU flushed those denormals
to zero inside the kernel — the Cornell box rendered all-white at RMSE
2.4 while t/normals matched exactly, invisible to interpret-mode CPU
tests. Fixed by carrying ids as f32 VALUES; see kernels/intersect.py.)

VERDICT: the kernel's 1.6x microbench win is worth ~0 end-to-end
(35.23 vs 35.06, inside relay noise) because small-scene intersection
is not c2's bottleneck — the bounce-loop links and shading are. With
zero throughput upside and a byte-exact-golden downside (float-order
differs from the fused jnp path on other configs), ENABLE stays False.
The kernel remains as measured, working, RMSE-0 machinery should a
scene ever be intersection-bound.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json
import time

import jax
import jax.numpy as jnp

from tpurt import config, cpu_ref, film as film_mod, render
from tpurt.kernels import intersect as intersect_k

C2 = dict(width=512, height=512, spp=8, scene="cornell", mode="mega",
          max_depth=8)


def run_one(name, enable):
    intersect_k.ENABLE = enable
    cfg = config.RenderConfig(seed=0, **C2)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    film, _ = render.render_samples(cfg, scene, cam, 0, 1)
    jax.block_until_ready(film)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        film, rays = render.render_samples(
            cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
        float(jnp.sum(film))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"probe": name,
                      "mrays_per_s": round(rays / best / 1e6, 3),
                      "rays": int(rays), "wall_s": round(best, 3)}),
          flush=True)


def rmse_on():
    cfg = config.RenderConfig(seed=0, **C2).replace(width=96, height=54,
                                                    spp=2)
    scene, cam = config.build_scene(cfg)
    f_dev, _ = render.render(cfg, scene, cam)
    f_ref, _ = cpu_ref.render(cfg, scene.device(), cam)
    print(json.dumps({"probe": "c2_kernel_on_rmse",
                      "rmse_vs_oracle": float(film_mod.rmse(f_dev,
                                                            f_ref))}),
          flush=True)


def main() -> None:
    old = intersect_k.ENABLE
    try:
        run_one("c2_kernel_off", False)
        run_one("c2_kernel_on", True)
        intersect_k.ENABLE = True
        rmse_on()
    finally:
        intersect_k.ENABLE = old


if __name__ == "__main__":
    main()
