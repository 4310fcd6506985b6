"""Regenerate the golden PPMs from the NumPy oracle (cpu_ref).

    python tests/gen_goldens.py

Rerun ONLY when an intentional spec change invalidates them; the diff in
tests/golden/ then documents the change.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from golden_defs import GOLDENS  # noqa: E402

from tpurt import config, cpu_ref, film  # noqa: E402
from tpurt.io import ppm  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent / "golden"


def main() -> None:
    OUT.mkdir(exist_ok=True)
    for name, cfg in GOLDENS.items():
        scene, cam = config.build_scene(cfg)
        img, stats = cpu_ref.render(cfg, scene, cam)
        path = OUT / f"{name}.ppm"
        ppm.write(str(path), film.tonemap(img))
        print(f"{name}: {path} rays={stats['rays']}")


if __name__ == "__main__":
    main()
