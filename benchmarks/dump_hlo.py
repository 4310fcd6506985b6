"""Dump the OPTIMIZED TPU HLO of the c3 traversal (and optionally the
full trace step) to /tmp/tpurt-hlo/ for fusion-boundary analysis.

Round-4 tooling for VERDICT items 1 (phase-A fusion surgery) and 3
(while-carry copies): the device profile prices kernel classes but not
WHICH HLO ops they are; the post-optimization module shows the exact
fusion boundaries, the while-body tuple, and every copy instruction —
statically, without burning a 3-10 min profile run per iteration.

Usage:
    python benchmarks/dump_hlo.py            # bounce-1 traversal only
    python benchmarks/dump_hlo.py trace      # the full staged megakernel
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent)]

import jax
import jax.numpy as jnp

from tpurt import config
from tpurt.kernels import traverse

OUT = _Path("/tmp/tpurt-hlo")
N = 131072


def main() -> None:
    what = _sys.argv[1] if len(_sys.argv) > 1 else "traverse"
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    o = jnp.zeros((N, 3), jnp.float32)
    d = jnp.ones((N, 3), jnp.float32)
    t = jnp.full((N,), jnp.inf, jnp.float32)

    if what == "traverse":
        # ALL outputs — winner epilogue included (a [0]-only dump lets
        # DCE delete the one-hot selects and misrepresents the drain)
        fn = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            scene, o, d, t))
        lowered = fn.lower(o, d, t)
    else:
        from tpurt import trace
        fn = jax.jit(lambda o, d: trace.intersect(scene, o, d).t)
        lowered = fn.lower(o, d)

    compiled = lowered.compile()
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / f"{what}.opt.txt"
    txts = compiled.as_text()
    path.write_text(txts)
    print("wrote", path, len(txts), "bytes")


if __name__ == "__main__":
    main()
