"""Do K independent traversal-shaped op chains overlap on this TPU?

VERDICT round-2 item "missing #3": mc_wide wins on NARROW entries by
splitting one walk into MC_K overlapping gather chains — but it merges
them into ONE op stream over a K*cp virtual packet axis (each op serves
all K cursors). The open question is whether K chains left as SEPARATE
op sequences in program order also overlap — i.e. whether advancing K
packet groups' rounds inside one loop body would hide the per-link
latency at FULL width, where the merged (virtual-axis) variant was
measured a loss (un-synced cursors lose occlusion pruning).

Probe: a traversal-realistic link = row gather from a (M,16) node table
-> per-row math -> lane reduce -> data-dependent next index. Measure, at
several widths pp:

  * chain1:      one chain of L links at width pp
  * chainK_sep:  K chains of L links each at width pp/K, written as K
                 separate op sequences in program order (total work ==
                 chain1 up to gather count; overlap would make this
                 ~= chain1 / K per-chain, i.e. ~= chain1 total)
  * chainK_mrg:  the same K chains merged on the packet axis (one op
                 stream at width pp — the mc_wide trick; the control)

If chainK_sep ~= chain1, chains overlap and full-width interleaving is a
free K-x on the latency floor. If chainK_sep ~= K * (chain at pp/K),
ops serialize and the only way to overlap chains is merging them into
shared ops (which full width already does).

MEASURED (TPU v5e via axon relay, 2026-08-17, L=8, M=2048, iters=384;
an earlier iters=128 run agreed on the ratios but hit the timer noise
floor on the short variants):

    pp=1024: chain1 28.8 us | chain8_sep 102.9 us | chain8_mrg 29.8 us
    pp=128:  chain1 13.7 us | chain8_sep 102.1 us | chain8_mrg 15.4 us
    (~1.7 us/link at pp=128 -> the pure latency floor; pp=1024 adds
    bandwidth, ~3.6 us/link)

VERDICT: REFUTED. At the latency floor (pp=128) K separate chains cost
7.5x one chain — each of the 8 narrow chains pays the full ~12.8 us
walk; the TPU executes the HLO schedule strictly sequentially and XLA
does not horizontally fuse independent gather->reduce chains, so there
is NO latency hiding across independent op sequences. The merged
control costs the same as one chain (1.04-1.13x) — confirming that the
ONLY way to overlap K walks is to batch them into shared ops (the
virtual packet axis), which full width already does and which was
measured to lose pruning (MC_PACKETS comment in kernels/traverse.py).
Full-width chain interleaving is closed; round cost must fall by
REMOVING links (wide fanout, batched drains), not by overlapping them.
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

M = 2048     # node-table rows
L = 8        # links per chain (ADV_STEPS-realistic)
K = 8


def make_link(nodes):
    def link(idx, carry):
        rows = nodes[idx]                         # (pp, 16) row gather
        s = jnp.sum(rows * (1.0 + carry[:, None]), axis=-1)   # row math
        r = jnp.max(s.reshape(idx.shape[0] // 8, 8), axis=-1)  # reduce
        r = jnp.repeat(r, 8)
        nxt = (idx + 1 + (r > 0).astype(jnp.int32)) % M       # select
        return nxt, s * 1e-9
    return link


def chain(nodes, idx, carry, links):
    for _ in range(links):
        idx, carry = make_link(nodes)(idx, carry)
    return idx, carry


def main() -> None:
    rs = np.random.default_rng(0)
    nodes = jnp.asarray(rs.standard_normal((M, 16)), jnp.float32)

    for pp in (1024, 128):
        idx0 = jnp.asarray(rs.integers(0, M, pp), jnp.int32)
        c0 = jnp.zeros(pp, jnp.float32)

        def t(name, fn, *args, iters=384):
            sec = device_time_fused(jax.jit(fn), *args, iters=iters)
            print(json.dumps({"probe": f"{name}_pp{pp}",
                              "us": round(sec * 1e6, 2)}), flush=True)

        def chain1(idx, c):
            idx, c = chain(nodes, idx, c, L)
            return (c + idx.astype(jnp.float32)).sum(keepdims=True)

        def chainK_sep(idx, c):
            # K chains over disjoint pp/K-wide slices, separate op chains
            outs = []
            w = pp // K
            for k in range(K):
                i, cc = chain(nodes, idx[k * w:(k + 1) * w],
                              c[k * w:(k + 1) * w], L)
                outs.append((cc + i.astype(jnp.float32)).sum())
            return jnp.stack(outs).sum(keepdims=True)

        def chainK_mrg(idx, c):
            # same K chains merged on the packet axis: one op stream
            idx, c = chain(nodes, idx, c, L)
            return (c + idx.astype(jnp.float32)).sum(keepdims=True)

        t("chain1", chain1, idx0, c0)
        t(f"chain{K}_sep", chainK_sep, idx0, c0)
        t(f"chain{K}_mrg", chainK_mrg, idx0, c0)


if __name__ == "__main__":
    main()
