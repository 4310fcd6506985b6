"""Tonemap spec (A.9) + PPM roundtrip + OBJ loader."""

import numpy as np

from tpurt import film, meshgen
from tpurt.io import obj as obj_io
from tpurt.io import ppm


def test_tonemap_spec():
    linear = np.array(
        [[[0.0, 0.25, 1.0], [np.nan, -0.5, 2.0]]], np.float32
    )
    out = film.tonemap(linear)
    # sqrt(0)=0 -> 0; sqrt(0.25)=0.5 -> floor(128)=128; sqrt(1)=1 -> 255
    assert out[0, 0, 0] == 0
    assert out[0, 0, 1] == 128
    assert out[0, 0, 2] == 255
    # NaN -> 0; negative clamps to 0; >1 clamps to 255
    assert out[0, 1, 0] == 0
    assert out[0, 1, 1] == 0
    assert out[0, 1, 2] == 255


def test_ppm_roundtrip(tmp_path):
    rs = np.random.default_rng(0)
    img = rs.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    path = str(tmp_path / "x.ppm")
    ppm.write(path, img)
    with open(path, "rb") as f:
        assert f.read(9) == b"P6\n5 7\n25"  # header P6\n{W} {H}\n255\n
    assert np.array_equal(ppm.read(path), img)


def test_obj_roundtrip(tmp_path, micro_mesh):
    v, f = micro_mesh
    path = str(tmp_path / "m.obj")
    meshgen.write_obj(path, v, f)
    v2, f2 = obj_io.load(path)
    assert v2.shape == v.shape and f2.shape == f.shape
    assert np.allclose(v, v2, atol=1e-5)
    assert np.array_equal(f, f2)


def test_obj_quad_and_negative_indices(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"   # quad with v/vt/vn -> 2 tris
        "f -4 -3 -2\n"                   # negative (relative) indices
    )
    v, f = obj_io.load(str(p))
    assert len(v) == 4
    assert len(f) == 3
    assert tuple(f[0]) == (0, 1, 2) and tuple(f[1]) == (0, 2, 3)
    assert tuple(f[2]) == (0, 1, 2)


def test_rmse():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 2.0)
    assert np.isclose(film.rmse(a, b), 2.0)


def test_cli_png_output_matches_ppm(tmp_path):
    """--out x.png writes the SAME tonemapped bytes as the PPM path,
    PNG-encoded (PPM remains the golden/parity format)."""
    import numpy as np
    from PIL import Image

    from tpurt import cli
    from tpurt.io import ppm

    args = ["render", "--width", "32", "--height", "16", "--spp", "1",
            "--scene", "spheres_plane", "--mode", "primary", "--seed", "2"]
    p_ppm = tmp_path / "a.ppm"
    p_png = tmp_path / "a.png"
    assert cli.main(args + ["--out", str(p_ppm)]) == 0
    assert cli.main(args + ["--out", str(p_png)]) == 0
    a = ppm.read(str(p_ppm))
    b = np.asarray(Image.open(p_png))
    assert np.array_equal(a, b)
