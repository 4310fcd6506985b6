"""The native OBJ parser must produce ARRAY-IDENTICAL meshes to the
pure-Python parser (both parse decimals to the nearest float64, indices
are integers — equality, not tolerance)."""

import os
from pathlib import Path

import numpy as np
import pytest

from tpurt import native
from tpurt.io import obj

FIXTURES = Path(__file__).parent / "fixtures"

ADVERSARIAL = """
# comment line
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 2.0
vn 0.0 0.0 -2.0
f 1//1 2//1 3//2 4//2
v 2.5e-1 -3.25 1e3
v +4 5 6
f -1 -2 -3
f 1/7/1 2/8/1 3//2
vt 0.5 0.5
g group-name
usemtl whatever
f 1 2 4
""".strip()

PARTIAL_VN = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3
f 1//1 2//1 3//1
""".strip()

NO_VN = """
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
f 3 2 1
""".strip()


def _python_mesh(path):
    os.environ["TPURT_NATIVE"] = "0"
    native._libs.clear()
    try:
        return obj.load_mesh(str(path))
    finally:
        del os.environ["TPURT_NATIVE"]
        native._libs.clear()


def _assert_same(a: obj.Mesh, b: obj.Mesh):
    assert np.array_equal(a.verts, b.verts)
    assert np.array_equal(a.faces, b.faces)
    assert (a.normals is None) == (b.normals is None)
    if a.normals is not None:
        assert np.array_equal(a.normals, b.normals)
        assert np.array_equal(a.face_vn, b.face_vn)


@pytest.mark.skipif(not native.available("objparse"),
                    reason="native objparse unavailable (no g++)")
@pytest.mark.parametrize("text", [ADVERSARIAL, PARTIAL_VN, NO_VN],
                         ids=["adversarial", "partial_vn", "no_vn"])
def test_native_obj_matches_python(tmp_path, text):
    p = tmp_path / "m.obj"
    p.write_text(text + "\n")
    _assert_same(obj.load_mesh(str(p)), _python_mesh(p))


@pytest.mark.skipif(not native.available("objparse"),
                    reason="native objparse unavailable (no g++)")
def test_native_obj_matches_python_on_fixtures():
    objs = sorted(FIXTURES.glob("*.obj"))
    assert objs, "no OBJ fixtures found"
    for p in objs:
        _assert_same(obj.load_mesh(str(p)), _python_mesh(p))


@pytest.mark.skipif(not native.available("objparse"),
                    reason="native objparse unavailable (no g++)")
def test_native_obj_error_behavior_matches(tmp_path):
    p = tmp_path / "empty.obj"
    p.write_text("v 0 0 0\nv 1 0 0\n")      # no faces
    with pytest.raises(ValueError):
        obj.load_mesh(str(p))
    p2 = tmp_path / "bad.obj"
    p2.write_text("v 0 0\nf 1 2 3\n")       # malformed vertex ->
    with pytest.raises(Exception):          # native falls back, Python
        obj.load_mesh(str(p2))              # raises as before
