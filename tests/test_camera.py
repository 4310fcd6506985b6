"""Camera ray-gen conventions (Appendix A.2 + decreed pixel mapping)."""

import jax.numpy as jnp
import numpy as np

from tpurt import camera


def test_center_ray_hits_lookat():
    cam = camera.make_camera((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 4 / 3)
    w, h = 8, 6
    pid = jnp.asarray([(h // 2) * w + w // 2], jnp.int32)
    jitter = jnp.zeros((2, 1), jnp.float32)  # corner of center pixel
    o, d = camera.generate_rays(cam, w, h, pid, jitter)
    d = np.asarray(d)[0]
    # looking down -z; center pixel corner is exactly the axis for even dims
    assert d[2] < 0
    assert abs(d[0]) < 0.12 and abs(d[1]) < 0.15


def test_directions_unit():
    cam = camera.make_camera((1, 2, 3), (0, 0, 0), (0, 1, 0), 45.0, 16 / 9)
    pid = jnp.arange(64, dtype=jnp.int32)
    jitter = jnp.full((2, 64), 0.5, jnp.float32)
    _, d = camera.generate_rays(cam, 8, 8, pid, jitter)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)


def test_y0_is_top_row():
    cam = camera.make_camera((0, 0, 5), (0, 0, 0), (0, 1, 0), 60.0, 1.0)
    w = 4
    top = jnp.asarray([0], jnp.int32)          # (x=0, y=0)
    bottom = jnp.asarray([3 * w], jnp.int32)   # (x=0, y=3)
    jitter = jnp.full((2, 1), 0.5, jnp.float32)
    _, d_top = camera.generate_rays(cam, w, 4, top, jitter)
    _, d_bot = camera.generate_rays(cam, w, 4, bottom, jitter)
    assert float(d_top[0, 1]) > float(d_bot[0, 1])  # top row looks up
