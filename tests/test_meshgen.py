"""The vectorized icosphere subdivision must be BIT-IDENTICAL to the
classic dict-cached loop it replaced — the blob mesh's exact vertex
ORDER (not just geometry) feeds triangle order, the BVH build, and the
golden images."""

import numpy as np

from tpurt import meshgen


def _icosphere_ref(subdiv):
    """The original loop implementation, kept verbatim as the oracle."""
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
        midpoint = {}

        def mid(a, b):
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
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc),
                          (ab, bc, ca)]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts, faces


def test_icosphere_bit_identical_to_loop_reference():
    for subdiv in (0, 1, 2, 4):
        v_new, f_new = meshgen.icosphere(subdiv)
        v_ref, f_ref = _icosphere_ref(subdiv)
        assert v_new.shape == v_ref.shape and f_new.shape == f_ref.shape
        assert v_new.tobytes() == v_ref.tobytes(), subdiv
        assert f_new.tobytes() == f_ref.tobytes(), subdiv


def test_blob_deterministic_and_well_formed():
    v1, f1 = meshgen.blob(subdiv=3, seed=7)
    v2, f2 = meshgen.blob(subdiv=3, seed=7)
    assert v1.tobytes() == v2.tobytes() and f1.tobytes() == f2.tobytes()
    assert f1.shape[0] == 20 * 4**3
    assert f1.min() >= 0 and f1.max() < v1.shape[0]
