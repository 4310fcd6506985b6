"""Persistent-wavefront mode: exact ray accounting and image parity with
the megakernel (mutual-oracle property, SURVEY.md §4)."""

import numpy as np
import pytest

from tpurt import config, film as film_mod, render

CFG = config.RenderConfig(width=48, height=36, spp=6, max_depth=6,
                          scene="spheres_plane", mode="mega", seed=9)


@pytest.fixture(scope="module")
def sp():
    scene, cam = config.build_scene(CFG)
    return scene.device(), cam


def test_persist_matches_mega(sp):
    scene, cam = sp
    f1, s1 = render.render(CFG, scene, cam)
    f2, s2 = render.render(CFG.replace(mode="persist"), scene, cam)
    assert s1["rays"] == s2["rays"]  # same RNG streams -> same paths
    assert film_mod.rmse(f1, f2) < 1e-6


def test_persist_small_capacity_regenerates(sp):
    """Queue far smaller than the workload: slots must be refilled many
    times and the image must be unchanged (streams are counter-derived)."""
    scene, cam = sp
    f1, s1 = render.render(CFG, scene, cam)
    cfg = CFG.replace(mode="persist", ray_batch=512)
    f2, s2 = render.render(cfg, scene, cam)
    assert s1["rays"] == s2["rays"]
    assert film_mod.rmse(f1, f2) < 1e-6
    assert 0.0 < s2["occupancy"]["mean_occupancy"] <= 1.0


def test_persist_with_rr_and_mesh(micro_mesh):
    from tpurt import scene as scene_mod

    v, f = micro_mesh
    cfg = CFG.replace(mode="persist", rr_start=2, max_depth=8)
    sc, cam = scene_mod.mesh_scene(cfg.aspect, v, f, use_bvh=True)
    f1, s1 = render.render(cfg, sc, cam)
    f2, s2 = render.render(cfg.replace(mode="mega"), sc, cam)
    assert s1["rays"] == s2["rays"]
    assert film_mod.rmse(f1, f2) < 1e-6
    assert np.isfinite(f1).all()
