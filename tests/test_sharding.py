"""Multi-chip sharding correctness on the fake 8-device CPU mesh
(SURVEY.md §4 Distributed row): sharded render must match the 1-device
render at RMSE ~ float-summation noise, for both partitionings."""

import jax
import numpy as np
import pytest

from tpurt import config, film as film_mod, mesh as mesh_mod, render

CFG = config.RenderConfig(width=48, height=32, spp=8, max_depth=6,
                          scene="spheres_plane", mode="mega", seed=4)


@pytest.fixture(scope="module")
def sp():
    return config.build_scene(CFG)


@pytest.fixture(scope="module")
def single(sp):
    scene, cam = sp
    f, s = render.render(CFG, scene, cam)
    return f, s


def test_eight_devices_available():
    assert len(jax.devices()) == 8  # conftest forces the fake CPU mesh


def test_tiles_sharded_matches_single(sp, single):
    scene, cam = sp
    f1, s1 = single
    mesh = mesh_mod.make_mesh(8)
    f8, s8 = mesh_mod.render_sharded(CFG.replace(shard="tiles"), scene, cam,
                                     mesh)
    assert s8["devices"] == 8
    assert s8["rays"] == s1["rays"]  # same RNG -> same paths, shard-invariant
    assert film_mod.rmse(f1, f8) < 1e-6


def test_spp_sharded_matches_single(sp, single):
    scene, cam = sp
    f1, s1 = single
    mesh = mesh_mod.make_mesh(8)
    f8, s8 = mesh_mod.render_sharded(CFG.replace(shard="spp"), scene, cam,
                                     mesh)
    assert s8["rays"] == s1["rays"]
    assert film_mod.rmse(f1, f8) < 1e-6


def test_spp_sharding_rejects_indivisible(sp):
    scene, cam = sp
    mesh = mesh_mod.make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        mesh_mod.render_sharded(CFG.replace(shard="spp", spp=9), scene, cam,
                                mesh)


def test_tiles_wavefront_sharded(sp, single):
    scene, cam = sp
    f1, _ = single
    mesh = mesh_mod.make_mesh(8)
    f8, _ = mesh_mod.render_sharded(
        CFG.replace(shard="tiles", mode="wavefront"), scene, cam, mesh
    )
    assert film_mod.rmse(f1, f8) < 1e-6


def test_nonmultiple_pixel_count(sp):
    """npix not divisible by ndev exercises the pad path: image must match
    AND the psum'd ray counter must not count the pad duplicates (the pad
    rays start dead — the Mrays numerator counts real pixels only)."""
    scene_cam = config.build_scene(CFG.replace(width=45, height=31))
    cfg = CFG.replace(width=45, height=31, shard="tiles")
    mesh = mesh_mod.make_mesh(8)   # 1395 pixels % 8 != 0
    f8, s8 = mesh_mod.render_sharded(cfg, *scene_cam, mesh)
    f1, s1 = render.render(cfg.replace(shard="none"), *scene_cam)
    assert film_mod.rmse(f1, f8) < 1e-6
    assert s8["rays"] == s1["rays"]


def test_nonmultiple_pixel_count_wavefront(sp):
    """Same pad-masking contract through the SPMD wavefront path."""
    scene_cam = config.build_scene(CFG.replace(width=45, height=31))
    cfg = CFG.replace(width=45, height=31, shard="tiles", mode="wavefront")
    mesh = mesh_mod.make_mesh(8)
    f8, s8 = mesh_mod.render_sharded(cfg, *scene_cam, mesh)
    f1, s1 = render.render(cfg.replace(shard="none", mode="mega"),
                           *scene_cam)
    assert film_mod.rmse(f1, f8) < 1e-6
    assert s8["rays"] == s1["rays"]


def test_one_device_mesh_degenerate(sp, single):
    scene, cam = sp
    f1, _ = single
    mesh = mesh_mod.make_mesh(1)
    fm, sm = mesh_mod.render_sharded(CFG.replace(shard="tiles"), scene, cam,
                                     mesh)
    assert sm["devices"] == 1
    assert film_mod.rmse(f1, fm) < 1e-7


def test_sub_block_loop_matches_single(sp, single, monkeypatch):
    """config 5's on-device per-chip sub-block loop (mesh.SUB_BLOCK) is
    only reached when a chip's pixel block exceeds the tuned batch size;
    shrink the constant so the tiny test frame exercises it, and require
    the image AND ray count to match the unsharded render."""
    scene, cam = sp
    f1, s1 = single
    monkeypatch.setattr(mesh_mod, "SUB_BLOCK", 128)
    mesh = mesh_mod.make_mesh(2)  # 48*32/2 = 768 px/chip -> 6 sub-blocks
    fm, sm = mesh_mod.render_sharded(CFG.replace(shard="tiles"), scene, cam,
                                     mesh)
    assert sm["rays"] == s1["rays"]
    assert film_mod.rmse(f1, fm) < 1e-6


def test_sub_block_loop_bvh_matches_single(monkeypatch):
    """The c5 path shape: the per-chip SUB_BLOCK loop over a BVH scene
    (mesh._device_trace) — per-ray radiance and ray counts must match
    the unsharded render, including a pixel count that is not a
    sub-block multiple per chip."""
    cfg = CFG.replace(scene="blob", mesh_subdiv=2, spp=4)
    scene, cam = config.build_scene(cfg)
    f1, s1 = render.render(cfg, scene, cam)
    monkeypatch.setattr(mesh_mod, "SUB_BLOCK", 128)
    mesh = mesh_mod.make_mesh(2)  # 768 px/chip -> 6 sub-blocks
    fm, sm = mesh_mod.render_sharded(cfg.replace(shard="tiles"), scene,
                                     cam, mesh)
    assert sm["rays"] == s1["rays"]
    assert film_mod.rmse(f1, fm) < 1e-6


def test_tiles_sharded_octant_bit_identical():
    """OCT_ENABLE under shard_map (c5's adopted shape: sharded tiles
    over a BVH mesh scene): the octant tables ride the replicated scene
    pytree and the sharded film is bit-identical to the base order."""
    from tpurt.kernels import traverse

    cfg = config.RenderConfig(width=48, height=32, spp=4, max_depth=6,
                              scene="blob", mesh_subdiv=2, seed=4,
                              mode="mega", shard="tiles")
    mesh = mesh_mod.make_mesh(8)
    old = traverse.OCT_ENABLE
    try:
        traverse.OCT_ENABLE = True
        scene, cam = config.build_scene(cfg)   # builds the 8 tables
        assert scene.pk_oct_nodes is not None
        f1, s1 = mesh_mod.render_sharded(cfg, scene, cam, mesh)
        traverse.OCT_ENABLE = False
        f0, s0 = mesh_mod.render_sharded(cfg, scene, cam, mesh)
    finally:
        traverse.OCT_ENABLE = old
    assert s1["rays"] == s0["rays"]
    assert np.array_equal(f1, f0)
