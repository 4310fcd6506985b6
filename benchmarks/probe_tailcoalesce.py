"""Cross-batch tail coalescing A/B on the c3 bench config (round 4).

The frame loop paid the round-floor-bound deep-bounce tail once per
512k batch (~43% of the c3 frame is bounces 3+, probe_breakdown /
BASELINE round-3 frame profile, and the tail is width-insensitive);
render._accum_frame_coalesced pays it once per TAIL_GROUP batches.
This probe times the full c3 bench config (1280x720, 4 spp, ~8 batch
iterations) with coalescing OFF vs ON at cut bounce {2, 3, 4} and
group {8, 16}, interleaved in ONE process so relay drift is shared.
Protocol: warmup 1-sample pass, then best of 3 timed spp-range passes
(the quick_tpu protocol).

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, TPU v5e via axon relay, pre-fusion-fix tree):

    coalesce_off        7.458 Mrays/s (1.186 s)   [drift bracket:
    coalesce_off_again  7.449 (1.187) — relay stable]
    cut2_g8             6.637 (1.332)   -11%
    cut3_g8             6.501 (1.360)   -13%
    cut4_g8             6.455 (1.370)   -13%
    cut3_g16            5.946 (1.487)   -20%

VERDICT: REFUTED as shipped — every point loses, and the loss scales
with the MERGED WIDTH (g16 costs ~2x g8's delta), not with the cut.
The width-insensitive-tail premise breaks on packet granularity: at
128 rays/packet a packet stays live while ANY ray lives, so at bounces
2-5 ray liveness 35->5% is still ~100% PACKET liveness — the merged
tail walks the same total live packets per bounce as the per-batch
tails did, while its stage ladders bottom at W//2^k widths 8-16x wider
than the per-batch floors (traversal ladder: 512-packet minimum at a
32768-packet entry vs 64 in-batch). See profile_coalesce.py for the
per-kernel attribution of the regression. TAIL_COALESCE default is now
False; the engine + bit-exactness tests stay (the film-fold order
proof and the span-resume property are reusable for any future
regrouping design).

PHASE 2 (same day; device profiles in profile_coalesce.py + the
traversal-ladder rescue): the off/on frame profiles attribute the
regression precisely — coalescing DID cut the frame's kernel count 40%
(399,608 -> 238,855; the per-round link saving is real) but every
kernel class got ~60-70% more expensive on average (or_reduce 3.01 ->
5.15 us, slice_reduce 4.43 -> 7.57, iota_reduce 62 -> 99, fusion 1.51
-> 3.70: the merged span runs its rounds at the wider ladder floors),
plus the lax.cond flush copied the banked buffers through the
conditional (~60 ms/frame of copy kernels; the flush is straight-line
in the nested-fori rewrite). The deep-traversal-ladder rescue
(traverse.STAGE_MAX=10, reaching 32-packet floors on the merged width)
recovered only a third of the gap:

    p2_off_sm6        7.589 Mrays/s (1.165 s)  [fusion fixes in tree]
    p2_off_sm10       7.595 (1.164) — sm10 neutral on the normal path
    p2_cut3_g8_sm10   6.819 (1.297) — still -10%
    p2_cut3_g8_sm6    6.843 (1.292) — ladder depth immaterial; the
                      no-cond rewrite recovered ~3% of the phase-1 gap

FINAL: REFUTED. Fewer-but-wider rounds conserve wall on this VPU — the
same conservation law as probe_advstage/probe_fanout4, now measured
from the kernel-count side (40% fewer kernels, 0% less wall). The
per-batch round floor the coalescing was built to amortize is, post
fusion surgery, already volume not latency.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_render import bench_config  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpurt import config, render

    cfg = bench_config("c3-mesh")
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    def run(tag):
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        jax.block_until_ready(film)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        print(json.dumps({
            "probe": tag, "mrays_per_s": round(rays / wall / 1e6, 3),
            "wall_best_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls]}), flush=True)

    if len(sys.argv) > 1 and sys.argv[1] == "phase2":
        # Phase 2 (after the phase-1 refutation): is the regression the
        # traversal ladder's relative floor (512-packet minimum at a
        # 32768-packet merged entry vs 64 in-batch)? STAGE_MAX=10 lets
        # the ladder reach 32-packet widths. clear_cache: the jits
        # close over the traverse global, so a stale trace would
        # otherwise be reused for identical static args.
        from tpurt.kernels import traverse

        render.TAIL_COALESCE = False
        run("p2_off_sm6")
        traverse.STAGE_MAX = 10
        render._accum_frame.clear_cache()
        render._accum_frame_coalesced.clear_cache()
        run("p2_off_sm10")
        render.TAIL_COALESCE = True
        render.TAIL_CUT = 3
        render.TAIL_GROUP = 8
        run("p2_cut3_g8_sm10")
        traverse.STAGE_MAX = 6
        render._accum_frame_coalesced.clear_cache()
        run("p2_cut3_g8_sm6")  # drift bracket vs phase-1's 6.501
        return

    render.TAIL_COALESCE = False
    run("coalesce_off")
    render.TAIL_COALESCE = True
    for cut in (2, 3, 4):
        render.TAIL_CUT = cut
        render.TAIL_GROUP = 8
        run(f"coalesce_cut{cut}_g8")
    render.TAIL_CUT = 3
    render.TAIL_GROUP = 16
    run("coalesce_cut3_g16")
    render.TAIL_COALESCE = False
    run("coalesce_off_again")  # drift control bracket


if __name__ == "__main__":
    main()
