"""RNG stream properties (SURVEY.md §4 Unit RNG row) — threefry spec v2."""

import jax.numpy as jnp
import numpy as np

from tpurt import rng


def test_threefry_known_answers():
    """Random123 KAT vectors for Threefry-2x32, 20 rounds."""
    with np.errstate(over="ignore"):
        y = rng._threefry2x32(np.uint32(0), np.uint32(0),
                              np.uint32(0), np.uint32(0), np)
        assert (int(y[0]), int(y[1])) == (0x6B200159, 0x99BA4EFE)
        f = np.uint32(0xFFFFFFFF)
        y = rng._threefry2x32(f, f, f, f, np)
        assert (int(y[0]), int(y[1])) == (0x1CB996FC, 0xBB002BE7)
        y = rng._threefry2x32(np.uint32(0x13198A2E), np.uint32(0x03707344),
                              np.uint32(0x243F6A88), np.uint32(0x85A308D3),
                              np)
        assert (int(y[0]), int(y[1])) == (0xC4923A9C, 0x483DF7A0)


def _streams(seed=7, n=100, sample=0):
    pix = jnp.arange(n, dtype=jnp.int32)
    smp = jnp.full(n, sample, jnp.int32)
    return rng.make_streams(seed, pix, smp)


def test_reproducible():
    a = np.asarray(rng.bounce_draws(_streams(), 3))
    b = np.asarray(rng.bounce_draws(_streams(), 3))
    assert np.array_equal(a, b)


def test_streams_disjoint_across_pixels_samples_bounces():
    s = _streams(0, 64)
    d0 = np.asarray(rng.bounce_draws(s, 0))
    d1 = np.asarray(rng.bounce_draws(s, 1))
    assert not np.allclose(d0, d1)                    # bounces differ
    # different pixels give different draws (no two columns equal)
    assert len({tuple(col) for col in d0.round(7).T.tolist()}) == 64
    s2 = _streams(0, 64, sample=1)
    assert not np.allclose(d0, np.asarray(rng.bounce_draws(s2, 0)))
    cam = np.asarray(rng.camera_draws(s))
    assert not np.allclose(cam, d0[:4])               # camera stream disjoint
    s3 = _streams(1, 64)
    assert not np.allclose(d0, np.asarray(rng.bounce_draws(s3, 0)))  # seed


def test_order_independence():
    """Counter-based streams: a pixel\'s draws don\'t depend on batching."""
    pix = jnp.arange(128, dtype=jnp.int32)
    smp = jnp.zeros(128, jnp.int32)
    full = np.asarray(rng.bounce_draws(rng.make_streams(3, pix, smp), 2))
    half = np.asarray(
        rng.bounce_draws(rng.make_streams(3, pix[64:], smp[64:]), 2)
    )
    assert np.array_equal(full[:, 64:], half)


def test_np_twin_bit_identical():
    pix = np.arange(32, dtype=np.int64)
    smp = np.full(32, 5, np.int64)
    via_np = rng.np_bounce_draws(11, pix, smp, 4)
    via_jax = np.asarray(
        rng.bounce_draws(rng.make_streams(11, jnp.asarray(pix),
                                          jnp.asarray(smp)), 4)
    )
    assert np.array_equal(via_np, via_jax)
    assert np.array_equal(
        rng.np_camera_draws(11, pix, smp),
        np.asarray(rng.camera_draws(
            rng.make_streams(11, jnp.asarray(pix), jnp.asarray(smp))
        )),
    )


def test_uniform_range_and_distribution():
    s = _streams(0, 10000)
    d = np.asarray(rng.bounce_draws(s, 0))
    assert d.min() >= 0.0 and d.max() < 1.0
    assert abs(d.mean() - 0.5) < 0.01


def test_unit_vector_is_unit():
    u = np.random.default_rng(0).uniform(size=(1000, 2)).astype(np.float32)
    x, y, z = rng.unit_vector_from(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    v = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    v2 = rng.np_unit_vector_from(u[:, 0], u[:, 1])
    assert np.allclose(v, v2, atol=1e-5)


def test_in_unit_sphere_inside():
    u = np.random.default_rng(1).uniform(size=(1000, 3)).astype(np.float32)
    x, y, z = rng.in_unit_sphere_from(*[jnp.asarray(u[:, i])
                                        for i in range(3)])
    v = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1)
    assert np.all(np.linalg.norm(v, axis=1) <= 1.0 + 1e-5)
