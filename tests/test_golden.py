"""Golden-image tests (SURVEY.md §4 "Golden / integration" row).

Each golden PPM was produced by the NumPy oracle (tests/gen_goldens.py).
The oracle must reproduce it byte-exactly (freezing scene constants,
camera, RNG streams, tonemap); the JAX tracer must match within float
reassociation noise at the tonemapped-byte level.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from golden_defs import GOLDENS  # noqa: E402

from tpurt import config, cpu_ref, film, render  # noqa: E402
from tpurt.io import ppm  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_oracle_reproduces_golden(name):
    cfg = GOLDENS[name]
    scene, cam = config.build_scene(cfg)
    img, _ = cpu_ref.render(cfg, scene, cam)
    golden = ppm.read(str(GOLDEN_DIR / f"{name}.ppm"))
    assert np.array_equal(film.tonemap(img), golden), (
        f"{name}: oracle no longer reproduces its golden byte-exactly — "
        "a scene/camera/RNG/tonemap constant changed; regenerate goldens "
        "only if the change is intentional (tests/gen_goldens.py)"
    )


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_device_matches_golden(name):
    cfg = GOLDENS[name]
    scene, cam = config.build_scene(cfg)
    img, _ = render.render(cfg, scene, cam)
    golden = ppm.read(str(GOLDEN_DIR / f"{name}.ppm"))
    got = film.tonemap(img)
    # tonemapped bytes may differ by a quantization step where float
    # reassociation lands on a bucket edge; nothing more
    diff = np.abs(got.astype(int) - golden.astype(int))
    frac_off = (diff > 1).mean()
    assert frac_off < 0.002, (
        f"{name}: {frac_off:.4%} of bytes differ by >1 from the golden"
    )
    assert diff.max() <= 8
