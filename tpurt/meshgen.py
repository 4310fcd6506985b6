"""Deterministic procedural meshes (host-side, NumPy).

The BASELINE config 3 calls for a "Stanford-bunny-class OBJ" (~70k tris).
No such asset exists in this offline environment (SURVEY.md §0), so the
benchmark mesh is generated: an icosphere displaced by a fixed sum of
random-direction sinusoids ("blob"). Subdiv 6 gives 81,920 triangles —
bunny-class BVH stress with zero assets. Fully deterministic for a seed.
"""

from __future__ import annotations

import numpy as np


def icosphere(subdiv: int) -> tuple[np.ndarray, np.ndarray]:
    """Unit icosphere. Returns (verts (V,3) f64, faces (F,3) i64);
    F = 20 * 4**subdiv."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            (-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
            (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
            (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1),
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ],
        np.int64,
    )

    for _ in range(subdiv):
        vlist = [v for v in verts]
        midpoint: dict[tuple[int, int], int] = {}

        def mid(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            m = midpoint.get(key)
            if m is None:
                p = vlist[a] + vlist[b]
                p = p / np.linalg.norm(p)
                vlist.append(p)
                m = len(vlist) - 1
                midpoint[key] = m
            return m

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts, faces


def blob(subdiv: int = 6, seed: int = 7,
         n_waves: int = 24, amp: float = 0.35) -> tuple[np.ndarray, np.ndarray]:
    """Icosphere displaced radially by a fixed sum of sinusoidal waves."""
    verts, faces = icosphere(subdiv)
    rs = np.random.default_rng(seed)
    dirs = rs.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    freqs = rs.uniform(1.5, 7.0, size=n_waves)
    phases = rs.uniform(0.0, 2 * np.pi, size=n_waves)
    weights = rs.uniform(0.3, 1.0, size=n_waves)
    weights /= weights.sum()

    proj = verts @ dirs.T                                  # (V, n_waves)
    disp = (np.sin(proj * freqs[None, :] + phases[None, :]) * weights).sum(1)
    r = 1.0 + amp * disp
    return verts * r[:, None], faces


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal OBJ writer (fixtures + interop with the reference's format)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {a} {b} {c}\n")
