"""Stage-ladder tuning for the round-3 batch bump (512k rays).

probe_batchscale.py measured bounce-1 traversal 41% cheaper per ray at
512k than at 128k — but the full 8-bounce megakernel only gained 14.5%
(408 -> 349 ns/primary, measured inline this round). The leak: both
tail-compaction ladders were RELATIVE (traverse.run_stages p//2..p//64,
trace bounce stages n_pk//2..n_pk//16), so a 4x batch ran its deep
tail — straggler packets and late bounces, where most rounds live — in
4x wider arrays for the same few live rays.

This probe measures the full megakernel (trace.trace, 8 bounces, c3
blob workload, tile-strided rays) under ladder variants at 512k and
128k:

  * ratio2: halve down to an ABSOLUTE floor (8 traversal / 4 bounce
    packets) — same per-stage dwell as round 2, deeper tail;
  * ratio4: quarter down to the same floors — fewer stage loops (less
    compile, fewer loop instantiations) but up to 4x oversize dwell
    between compactions.

Old-behavior reference points (relative ladders): 349.17 ns/primary at
512k, 408.27 at 128k (measured this session, same protocol).

MEASURED (TPU v5e via axon relay, 2026-08-17, device_time_fused):

    fullmega ns/primary      512k      128k
      old relative ladder   349.2     408.3   (reference points)
      ratio2, floor 8/4     345.6     462.7
      ratio4, floor 8/4     455.1     508.4

VERDICT: REFUTED — the deep-tail width was not the leak. Absolute-floor
ladders tie at 512k (-1%, noise) and LOSE 13% at 128k: every extra
stage is a real cost (another while_loop instantiation, compaction
gather, cond chain) that the narrower tail does not pay back. Ratio-4
ladders lose at both widths (up-to-4x oversize dwell between
compactions outweighs having fewer stages). The round-2 relative shape
stands — stage_caps() now just generates it (identical caps at every
width). The full-path shortfall vs the bounce-1 batch win is therefore
in HOW DEEP-BOUNCE SETS SCALE, not in the ladder: see the N-scaling
rerun of probe_breakdown (numbers in BASELINE.md, round-3 update) —
survivor-set traversals gain far less from width than fresh sets.
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

from tpurt import camera as camera_mod, config, render, rng, trace
from tpurt.kernels import traverse


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()
    order_full = np.asarray(render.tile_order(cfg.width, cfg.height))
    npix = order_full.size
    pix_all = np.tile(order_full, 4)
    smp_all = np.repeat(np.arange(4, dtype=np.int32), npix)
    n_tiles = pix_all.size // 128

    def rays_at(n):
        step = n_tiles // (n // 128)
        sel = np.arange(n_tiles)[::step][: n // 128]
        pix = jnp.asarray(pix_all.reshape(n_tiles, 128)[sel].reshape(-1))
        smp = jnp.asarray(smp_all.reshape(n_tiles, 128)[sel].reshape(-1))
        keys = rng.make_streams(jnp.uint32(0), pix, smp)
        jit2 = rng.camera_draws(keys)
        o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix,
                                        jit2)
        return o, d, keys

    for ratio in (2, 4):
        traverse.STAGE_RATIO = ratio
        for n in (524288, 131072):
            jax.clear_caches()  # ladder globals are read at trace time
            o, d, keys = rays_at(n)
            f = jax.jit(lambda o, d, k: trace.trace(
                scene, o, d, k, cfg.max_depth, cfg.rr_start)[0])
            sec = device_time_fused(f, o, d, keys, iters=8)
            print(json.dumps({
                "probe": f"fullmega_r{ratio}_n{n}",
                "ms": round(sec * 1e3, 3),
                "ns_per_primary": round(sec / n * 1e9, 2)}), flush=True)
    traverse.STAGE_RATIO = 2


if __name__ == "__main__":
    main()
