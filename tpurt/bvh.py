"""Host-side BVH builder -> flattened, skip-linked node arrays (SURVEY §1 L4).

The reference builds a pointer-based node tree and traverses it with a
recursive descent + stack per ray (SURVEY.md §2 "BVH build"/"BVH traversal").
On TPU a per-lane stack means scattered per-lane memory updates, so instead
the tree is flattened in depth-first order with *skip links* (escape
indices): traversal keeps a single int32 node cursor per ray and never
pushes/pops (SURVEY.md §7 M2 "rope/escape-index truly stackless").

For node i in DFS order:
  * inner node entered & box hit  -> next node is i + 1 (its left child);
  * leaf node entered & box hit   -> intersect its LEAF_N-padded triangle
    run, then continue at skip[i];
  * box missed                    -> continue at skip[i];
  * skip == -1                    -> traversal done.

Build policy (Appendix A.11): sort triangle centroids on the widest axis of
the centroid bounds, median split, leaf <= LEAF_N tris. Triangles are
permuted so each leaf's run is contiguous and padded to LEAF_N with a
degenerate (never-hit) triangle, letting the traversal loop intersect a
fixed-shape (N, LEAF_N) block every leaf visit.

Build runs once per scene on the host in NumPy (off the hot path,
SURVEY.md §3.5); the arrays live in HBM for the device traversal loop.
"""

from __future__ import annotations

import sys
from typing import NamedTuple

import numpy as np

LEAF_N = 4
SAH_BINS = 16


def _sah_partition(idx: np.ndarray, tlo, thi, centroid,
                   leaf_n: int) -> tuple[np.ndarray, np.ndarray]:
    """Binned-SAH split (A.11 'SAH optional later' — enabled: measured
    fewer node visits than median split on blobby meshes). Falls back to
    the widest-axis median when every centroid lands in one bin."""
    c = centroid[idx]
    cb_lo = c.min(axis=0)
    cb_hi = c.max(axis=0)
    ext = cb_hi - cb_lo

    best_cost = np.inf
    best = None  # (axis, bin_edge)
    for axis in range(3):
        if ext[axis] < 1e-12:
            continue
        which = np.clip(
            ((c[:, axis] - cb_lo[axis]) / ext[axis] * SAH_BINS).astype(
                np.int64
            ),
            0, SAH_BINS - 1,
        )
        counts = np.bincount(which, minlength=SAH_BINS)
        # per-bin bounds over triangle bboxes
        blo = np.full((SAH_BINS, 3), np.inf, np.float64)
        bhi = np.full((SAH_BINS, 3), -np.inf, np.float64)
        np.minimum.at(blo, which, tlo[idx])
        np.maximum.at(bhi, which, thi[idx])
        # prefix/suffix accumulations
        plo = np.minimum.accumulate(blo, axis=0)
        phi = np.maximum.accumulate(bhi, axis=0)
        slo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
        shi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
        pcnt = np.cumsum(counts)

        def area(lo, hi):
            e = np.maximum(hi - lo, 0)
            return e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]

        nl = pcnt[:-1]
        nr = idx.size - nl
        cost = area(plo[:-1], phi[:-1]) * nl + area(slo[1:], shi[1:]) * nr
        cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
        k = int(np.argmin(cost))
        if cost[k] < best_cost:
            best_cost = cost[k]
            best = (axis, which, k)

    if best is None:
        # all centroids coincide: arbitrary halves
        half = idx.size // 2
        return idx[:half], idx[half:], 0
    axis, which, k = best
    left = idx[which <= k]
    right = idx[which > k]
    if left.size == 0 or right.size == 0:  # degenerate; median fallback
        axis = int(np.argmax(ext))
        order = idx[np.argsort(c[:, axis], kind="stable")]
        half = idx.size // 2
        return order[:half], order[half:], axis
    return left, right, axis


class BVH(NamedTuple):
    """Flattened skip-linked tree. All arrays device-ready (f32/i32)."""

    lo: np.ndarray       # (M,3) node bbox min
    hi: np.ndarray       # (M,3) node bbox max
    skip: np.ndarray     # (M,)  DFS escape index, -1 terminates
    first: np.ndarray    # (M,)  first padded-triangle index (leaves)
    count: np.ndarray    # (M,)  leaf triangle count, 0 for inner nodes
    # Leaf-order triangle soup, padded to LEAF_N per leaf with degenerates:
    tri_v0: np.ndarray   # (Tp,3)
    tri_e1: np.ndarray   # (Tp,3)
    tri_e2: np.ndarray   # (Tp,3)
    tri_mat: np.ndarray  # (Tp,) int32


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, mat: np.ndarray,
          leaf_n: int = LEAF_N) -> BVH:
    """Median-split BVH over a triangle soup; returns flattened arrays."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    mat = np.asarray(mat, np.int32)
    ntri = v0.shape[0]
    assert ntri > 0, "BVH over empty triangle soup"

    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tlo + thi) * 0.5

    lo_l: list[np.ndarray] = []
    hi_l: list[np.ndarray] = []
    skip_l: list[int] = []
    first_l: list[int] = []
    count_l: list[int] = []
    leaf_runs: list[np.ndarray] = []  # original-index runs, leaf order
    pad_cursor = 0

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))

    UNSET = -2

    def rec(idx: np.ndarray) -> int:
        """Emit the subtree over triangles idx in DFS order; return root id."""
        nonlocal pad_cursor
        node_id = len(skip_l)
        lo_l.append(tlo[idx].min(axis=0))
        hi_l.append(thi[idx].max(axis=0))
        skip_l.append(UNSET)
        if idx.size <= leaf_n:
            first_l.append(pad_cursor)
            count_l.append(idx.size)
            leaf_runs.append(idx)
            pad_cursor += leaf_n
        else:
            first_l.append(0)
            count_l.append(0)
            left_idx, right_idx, _ = _sah_partition(idx, tlo, thi, centroid,
                                                    leaf_n)
            left_root = rec(left_idx)
            right_root = rec(right_idx)
            assert left_root == node_id + 1
            # Every exit inside the left subtree lands on the right subtree.
            for i in range(left_root, right_root):
                if skip_l[i] == UNSET:
                    skip_l[i] = right_root
        return node_id

    root = rec(np.arange(ntri, dtype=np.int64))
    assert root == 0
    for i, s in enumerate(skip_l):
        if s == UNSET:
            skip_l[i] = -1  # exits the whole tree
    sys.setrecursionlimit(old_limit)

    # Pad each leaf run to leaf_n with a degenerate triangle (zero edges ->
    # det == 0 -> Möller–Trumbore rejects it).
    n_pad = pad_cursor
    pv0 = np.zeros((n_pad, 3), np.float32)
    pe1 = np.zeros((n_pad, 3), np.float32)
    pe2 = np.zeros((n_pad, 3), np.float32)
    pmat = np.zeros((n_pad,), np.int32)
    cursor = 0
    for run in leaf_runs:
        k = run.size
        pv0[cursor : cursor + k] = v0[run]
        pe1[cursor : cursor + k] = v1[run] - v0[run]
        pe2[cursor : cursor + k] = v2[run] - v0[run]
        pmat[cursor : cursor + k] = mat[run]
        cursor += leaf_n

    return BVH(
        lo=np.stack(lo_l).astype(np.float32),
        hi=np.stack(hi_l).astype(np.float32),
        skip=np.asarray(skip_l, np.int32),
        first=np.asarray(first_l, np.int32),
        count=np.asarray(count_l, np.int32),
        tri_v0=pv0,
        tri_e1=pe1,
        tri_e2=pe2,
        tri_mat=pmat,
    )


PACKET_LEAF_N = 32


class PacketBVH(NamedTuple):
    """Gather-minimal layout for packet traversal (trace.packet_nearest_tri).

    Measured on this TPU, an XLA gather costs ~3-8 ns per *row* nearly
    independent of row width, so the layout packs everything a traversal
    step needs into ONE row per visit:

      nodes: (8*M, 8) f32 — EIGHT direction-ordered DFS layouts of the
        same M-node tree, one per ray-direction octant, concatenated.
        Layout o emits, at every inner node, the child nearer along the
        octant's signs FIRST, so a packet traversing with its majority
        octant's layout finds close hits early and the shrinking t window
        prunes the rest (the classic ordered-traversal win, which plain
        skip-link DFS forfeits). Row = [lo.xyz, hi.xyz, skip_bits,
        meta_bits]; skip is an ABSOLUTE index into the concatenated array
        (-1 terminates), meta is 0 for inner nodes and (leaf_row << 1) | 1
        for leaves (leaf rows shared by all layouts).
      leaves: (L, PACKET_LEAF_N * 10) f32 — per leaf row, PACKET_LEAF_N
        triangles of [v0.xyz, e1.xyz, e2.xyz, mat_bits], padded with
        degenerate triangles, so one row gather (PACKET_LEAF_N * 40
        bytes) yields the whole leaf.
      n_nodes: M (per-layout node count; packet base = octant * M).
    """

    nodes: np.ndarray    # (8*M, 8) f32
    leaves: np.ndarray   # (L, PACKET_LEAF_N*10) f32
    n_nodes: int
    # K=8 disjoint subtree spans [start, end) of layout 0, balanced by
    # node count (padded with (-1,-1)). Used by the multi-cursor tail
    # traversal (kernels/traverse.py): each cursor owns one span, so K
    # independent gather chains overlap — the narrow-stage round cost is
    # LATENCY-bound (~12 us/round at 16 packets, measured), and K cursors
    # divide the serial chain length by ~K.
    cut: np.ndarray      # (8, 2) int32


def build_packet(v0, v1, v2, mat, leaf_n: int = PACKET_LEAF_N) -> PacketBVH:
    """Build the 8-octant packet layout from one median-split topology."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    mat = np.asarray(mat, np.int32)
    ntri = v0.shape[0]
    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tlo + thi) * 0.5

    # --- topology (one recursive build) -----------------------------------
    # per node: bbox, split axis, children ids (-1 for leaf), leaf run
    n_lo: list = []
    n_hi: list = []
    n_axis: list = []
    n_kids: list = []
    leaf_runs: list = []
    n_leaf: list = []   # leaf row id or -1

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))

    def rec(idx: np.ndarray) -> int:
        nid = len(n_lo)
        n_lo.append(tlo[idx].min(axis=0))
        n_hi.append(thi[idx].max(axis=0))
        n_axis.append(0)
        n_kids.append((-1, -1))
        n_leaf.append(-1)
        if idx.size <= leaf_n:
            n_leaf[nid] = len(leaf_runs)
            leaf_runs.append(idx)
        else:
            left_idx, right_idx, axis = _sah_partition(idx, tlo, thi,
                                                       centroid, leaf_n)
            n_axis[nid] = axis
            # left partition has the lower coordinates along the split axis
            left = rec(left_idx)
            right = rec(right_idx)
            n_kids[nid] = (left, right)
        return nid

    rec(np.arange(ntri, dtype=np.int64))
    sys.setrecursionlimit(old)
    m = len(n_lo)

    # --- 8 direction-ordered DFS emissions (iterative) --------------------
    lo_arr = np.stack(n_lo)
    hi_arr = np.stack(n_hi)
    nodes = np.zeros((8 * m, 8), np.float32)
    for octant in range(8):
        neg = [(octant >> k) & 1 for k in range(3)]  # 1 = direction < 0
        base = octant * m
        # emit DFS: positions within this layout
        pos = np.empty(m, np.int64)
        order_nodes = np.empty(m, np.int64)
        cursor = 0
        stack = [0]
        while stack:
            nid = stack.pop()
            pos[nid] = cursor
            order_nodes[cursor] = nid
            cursor += 1
            l, r = n_kids[nid]
            if l >= 0:
                near, far = (r, l) if neg[n_axis[nid]] else (l, r)
                stack.append(far)   # popped second
                stack.append(near)  # popped first -> emitted at pos+1
        # subtree sizes via DFS property: a node's subtree occupies
        # [pos, pos+size); skip = pos + size (or -1 past the end)
        size = np.ones(m, np.int64)
        for c in range(m - 1, -1, -1):  # reverse emission order
            nid = order_nodes[c]
            l, r = n_kids[nid]
            if l >= 0:
                size[nid] = 1 + size[l] + size[r]
        # skip for node nid = pos[nid] + size[nid]
        blk = nodes[base : base + m]
        blk[pos, 0:3] = lo_arr
        blk[pos, 3:6] = hi_arr
        sk = pos + size
        sk_abs = np.where(sk >= m, -1, sk + base).astype(np.int32)
        blk[pos, 6] = sk_abs.view(np.float32)
        meta = np.where(
            np.asarray(n_leaf) >= 0,
            ((np.maximum(np.asarray(n_leaf), 0)) << 1) | 1,
            0,
        ).astype(np.int32)
        blk[pos, 7] = meta.view(np.float32)

    # --- packed leaf rows ---------------------------------------------------
    n_rows = len(leaf_runs)
    leaves = np.zeros((n_rows, leaf_n, 10), np.float32)
    for row, run in enumerate(leaf_runs):
        k = run.size
        leaves[row, :k, 0:3] = v0[run]
        leaves[row, :k, 3:6] = v1[run] - v0[run]
        leaves[row, :k, 6:9] = v2[run] - v0[run]
        leaves[row, :k, 9] = mat[run].view(np.float32)

    # --- K-way subtree cut of layout 0 (multi-cursor tail traversal) --------
    # Greedily split the largest span at its root's children until 8
    # pieces. pos0/size are the layout-0 DFS positions/subtree sizes.
    pos0 = np.empty(m, np.int64)
    order0 = np.empty(m, np.int64)
    cursor = 0
    stack = [0]
    while stack:
        nid = stack.pop()
        pos0[nid] = cursor
        order0[cursor] = nid
        cursor += 1
        l, r = n_kids[nid]
        if l >= 0:
            stack.append(r)
            stack.append(l)
    size0 = np.ones(m, np.int64)
    for c in range(m - 1, -1, -1):
        nid = order0[c]
        l, r = n_kids[nid]
        if l >= 0:
            size0[nid] = 1 + size0[l] + size0[r]
    pieces = [0]                      # node ids whose subtrees form the cut
    while len(pieces) < 8:
        pieces.sort(key=lambda nid: -size0[nid])
        split = next((i for i, nid in enumerate(pieces)
                      if n_kids[nid][0] >= 0), None)
        if split is None:
            break
        nid = pieces.pop(split)
        pieces.extend(n_kids[nid])
    cut = np.full((8, 2), -1, np.int32)
    for i, nid in enumerate(sorted(pieces, key=lambda nid: pos0[nid])):
        cut[i] = (pos0[nid], pos0[nid] + size0[nid])

    return PacketBVH(nodes=nodes, leaves=leaves.reshape(n_rows, leaf_n * 10),
                     n_nodes=m, cut=cut)


def validate(b: BVH) -> None:
    """Structural invariants, used by tests (SURVEY.md §4 'BVH' row)."""
    m = b.lo.shape[0]
    assert b.skip.shape == (m,) and b.count.shape == (m,)
    assert np.all(b.lo <= b.hi + 1e-6)
    ids = np.arange(m)
    ok = (b.skip == -1) | (b.skip > ids)
    assert np.all(ok), "skip links must move forward in DFS order"
    leaves = b.count > 0
    assert np.all(b.first[leaves] % LEAF_N == 0)
    assert np.all(b.first[leaves] + b.count[leaves] <= b.tri_v0.shape[0])
    # Leaf bboxes contain their (real) triangles.
    for nid in np.nonzero(leaves)[0][:256]:
        f, c = int(b.first[nid]), int(b.count[nid])
        vs = np.concatenate(
            [
                b.tri_v0[f : f + c],
                b.tri_v0[f : f + c] + b.tri_e1[f : f + c],
                b.tri_v0[f : f + c] + b.tri_e2[f : f + c],
            ]
        )
        assert np.all(vs >= b.lo[nid] - 1e-4) and np.all(vs <= b.hi[nid] + 1e-4)
