"""Wavefront OBJ loader (SURVEY.md §2 "OBJ loader").

Host-side parse of ``v``/``f`` records into a triangle soup; polygon faces
are fan-triangulated, ``v/vt/vn`` index triples and negative (relative)
indices are accepted, everything else is skipped. Runs once per scene,
off the hot path (SURVEY.md §3.5).
"""

from __future__ import annotations

import numpy as np


def load(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (vertices (V,3) f64, faces (F,3) i64, zero-indexed)."""
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []

    def resolve(token: str) -> int:
        idx = int(token.split("/", 1)[0])
        return idx - 1 if idx > 0 else len(verts) + idx

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]),
                              float(parts[3])))
            elif line.startswith("f "):
                idx = [resolve(tok) for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))

    if not faces:
        raise ValueError(f"no faces in OBJ file {path!r}")
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)
