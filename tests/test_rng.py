"""RNG stream properties (SURVEY.md §4 Unit RNG row)."""

import jax.numpy as jnp
import numpy as np

from tpurt import rng


def test_reproducible():
    pix = jnp.arange(100, dtype=jnp.int32)
    smp = jnp.zeros(100, jnp.int32)
    k1 = rng.base_keys(7, pix, smp)
    k2 = rng.base_keys(7, pix, smp)
    assert np.array_equal(np.asarray(rng.bounce_draws(k1, 3)),
                          np.asarray(rng.bounce_draws(k2, 3)))


def test_streams_disjoint_across_pixels_samples_bounces():
    pix = jnp.arange(64, dtype=jnp.int32)
    smp = jnp.zeros(64, jnp.int32)
    k = rng.base_keys(0, pix, smp)
    d0 = np.asarray(rng.bounce_draws(k, 0))
    d1 = np.asarray(rng.bounce_draws(k, 1))
    # different bounces give different draws
    assert not np.allclose(d0, d1)
    # different pixels give different draws (no two rows equal)
    assert len({tuple(row) for row in d0.round(7).tolist()}) == 64
    # different samples give different draws
    k2 = rng.base_keys(0, pix, smp + 1)
    assert not np.allclose(d0, np.asarray(rng.bounce_draws(k2, 0)))
    # camera stream disjoint from every bounce stream
    cam = np.asarray(rng.camera_draws(k))
    assert not np.allclose(cam, d0[:, :2])


def test_order_independence():
    """Counter-based streams: a pixel's draws don't depend on batching."""
    pix = jnp.arange(128, dtype=jnp.int32)
    smp = jnp.zeros(128, jnp.int32)
    full = np.asarray(rng.bounce_draws(rng.base_keys(3, pix, smp), 2))
    half = np.asarray(
        rng.bounce_draws(rng.base_keys(3, pix[64:], smp[64:]), 2)
    )
    assert np.array_equal(full[64:], half)


def test_np_bridge_bit_identical():
    pix = np.arange(32, dtype=np.int64)
    smp = np.full(32, 5, np.int64)
    via_np = rng.np_bounce_draws(11, pix, smp, 4)
    k = rng.base_keys(11, jnp.asarray(pix), jnp.asarray(smp))
    via_jax = np.asarray(rng.bounce_draws(k, 4))
    assert np.array_equal(via_np, via_jax)


def test_unit_vector_is_unit():
    u = np.random.default_rng(0).uniform(size=(1000, 2)).astype(np.float32)
    v = np.asarray(rng.unit_vector_from(jnp.asarray(u[:, 0]),
                                        jnp.asarray(u[:, 1])))
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # and numpy twin matches
    v2 = rng.np_unit_vector_from(u[:, 0], u[:, 1])
    assert np.allclose(v, v2, atol=1e-5)


def test_in_unit_sphere_inside():
    u = np.random.default_rng(1).uniform(size=(1000, 3)).astype(np.float32)
    v = np.asarray(rng.in_unit_sphere_from(*[jnp.asarray(u[:, i])
                                             for i in range(3)]))
    assert np.all(np.linalg.norm(v, axis=1) <= 1.0 + 1e-5)
