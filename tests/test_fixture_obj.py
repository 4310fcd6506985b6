"""The checked-in micro-OBJ (SURVEY.md §4 fixtures): the full OBJ -> scene
-> BVH -> render path without needing a real asset."""

import pathlib

import numpy as np

from tpurt import config, cpu_ref, film as film_mod, render

FIXTURE = str(pathlib.Path(__file__).resolve().parent / "fixtures"
              / "micro.obj")


def test_obj_scene_renders_and_matches_oracle():
    cfg = config.RenderConfig(width=48, height=36, spp=3, max_depth=5,
                              scene=f"obj:{FIXTURE}", mode="mega", seed=1)
    scene, cam = config.build_scene(cfg)
    assert scene.tri_v0.shape[0] >= 80
    f_dev, s_dev = render.render(cfg, scene, cam)
    f_ref, s_ref = cpu_ref.render(cfg, scene, cam)
    assert s_dev["rays"] == s_ref["rays"]
    assert film_mod.rmse(f_dev, f_ref) < 1e-4
    assert np.isfinite(f_dev).all()
