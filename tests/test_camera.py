"""Camera ray-gen conventions (Appendix A.2 + decreed pixel mapping)."""

import jax.numpy as jnp
import numpy as np

from tpurt import camera


def test_center_ray_hits_lookat():
    cam = camera.make_camera((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 4 / 3)
    w, h = 8, 6
    pid = jnp.asarray([(h // 2) * w + w // 2], jnp.int32)
    jitter = jnp.zeros((4, 1), jnp.float32)  # corner of center pixel
    o, d = camera.generate_rays(cam, w, h, pid, jitter)
    d = np.asarray(d)[0]
    # looking down -z; center pixel corner is exactly the axis for even dims
    assert d[2] < 0
    assert abs(d[0]) < 0.12 and abs(d[1]) < 0.15


def test_directions_unit():
    cam = camera.make_camera((1, 2, 3), (0, 0, 0), (0, 1, 0), 45.0, 16 / 9)
    pid = jnp.arange(64, dtype=jnp.int32)
    jitter = jnp.full((4, 64), 0.5, jnp.float32)
    _, d = camera.generate_rays(cam, 8, 8, pid, jitter)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)


def test_y0_is_top_row():
    cam = camera.make_camera((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 1.0)
    w = 4
    top = jnp.asarray([0], jnp.int32)          # (x=0, y=0)
    bottom = jnp.asarray([3 * w], jnp.int32)   # (x=0, y=3)
    jitter = jnp.full((4, 1), 0.5, jnp.float32)
    _, d_top = camera.generate_rays(cam, w, 4, top, jitter)
    _, d_bot = camera.generate_rays(cam, w, 4, bottom, jitter)
    assert float(d_top[0, 1]) > float(d_bot[0, 1])  # top row looks up


def test_pinhole_ignores_lens_draws():
    """aperture 0 => lens vectors are zero and rays are bit-identical for
    any lens-draw values (the A.2 'defocus off' guarantee the goldens
    rely on)."""
    cam = camera.make_camera((1, 2, 3), (0, 0, 0), (0, 1, 0), 45.0, 16 / 9)
    pid = jnp.arange(64, dtype=jnp.int32)
    j0 = jnp.full((4, 64), 0.25, jnp.float32)
    j1 = j0.at[2:].set(0.9)
    o0, d0 = camera.generate_rays(cam, 8, 8, pid, j0)
    o1, d1 = camera.generate_rays(cam, 8, 8, pid, j1)
    assert np.array_equal(np.asarray(o0), np.asarray(o1))
    assert np.array_equal(np.asarray(d0), np.asarray(d1))


def test_thin_lens_focus_plane_sharp():
    """Rays from different lens points through the same film (s, t) must
    meet at the focus plane: o + f_eff*d identical across lens samples."""
    cam = camera.make_camera((0, 0, 5), (0, 0, 0), (0, 1, 0), 40.0, 1.0,
                             aperture=0.4, focus_dist=5.0)
    pid = jnp.zeros(8, jnp.int32)
    jit = jnp.zeros((4, 8), jnp.float32)
    jit = jit.at[0].set(0.5).at[1].set(0.5)
    jit = jit.at[2].set(jnp.linspace(0.0, 0.95, 8))
    jit = jit.at[3].set(jnp.linspace(0.0, 0.95, 8))
    o, d = camera.generate_rays(cam, 4, 4, pid, jit)
    o, d = np.asarray(o), np.asarray(d)
    # origins genuinely spread over the lens disk
    assert np.ptp(o[:, 0]) > 1e-3 or np.ptp(o[:, 1]) > 1e-3
    # scale each unit dir so its z-component spans the focus distance
    tt = (o[:, 2] - 0.0) / -d[:, 2]          # focus plane z=0
    hit = o + tt[:, None] * d
    assert np.allclose(hit, hit[0], atol=1e-5)


def test_with_lens_matches_direct_construction():
    base = camera.make_camera((0, 1, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.5)
    direct = camera.make_camera((0, 1, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.5,
                                aperture=0.3, focus_dist=3.0)
    retro = camera.with_lens(base, 0.3, 3.0)
    for a, b in zip(direct, retro):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_defocus_device_matches_oracle():
    """End-to-end thin-lens parity: device render vs the NumPy oracle at
    aperture > 0 must agree byte-exactly after tonemap (same threefry
    lens draws, same disk transform)."""
    import numpy as _np

    from tpurt import config, cpu_ref, film, render

    cfg = config.RenderConfig(width=48, height=32, spp=2, seed=9,
                              scene="spheres_plane", mode="mega",
                              max_depth=4, aperture=0.25, focus_dist=4.0)
    scene, cam = config.build_scene(cfg)
    img, _ = render.render(cfg, scene, cam)
    ref, _ = cpu_ref.render(cfg, scene.device(), cam)
    assert _np.array_equal(film.tonemap(img),
                           film.tonemap(_np.asarray(ref)))
    # and the blur is real: the pinhole image differs
    cfg0 = cfg.replace(aperture=0.0)
    scene0, cam0 = config.build_scene(cfg0)
    img0, _ = render.render(cfg0, scene0, cam0)
    assert not _np.array_equal(film.tonemap(img),
                               film.tonemap(_np.asarray(img0)))
