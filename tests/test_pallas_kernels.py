"""Pallas kernel correctness vs the jnp implementations (interpret mode on
the CPU backend; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import config, geometry
from tpurt.kernels import intersect as pk


def _rays(n=1000, seed=3):
    rs = np.random.default_rng(seed)
    o = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rs.uniform(-0.9, 0.9, (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_pallas_brute_matches_jnp_brute():
    scene, _ = config.build_scene(
        config.RenderConfig(scene="cornell", width=4, height=4)
    )
    scene = scene.device()
    o, d = _rays()
    t_max = jnp.full(o.shape[0], geometry.INF)

    rows = jnp.asarray(pk.tri_rows_from_scene(scene))
    interp = jax.default_backend() != "tpu"
    t_k, n_k, m_k, hit_k = pk.nearest_tri_small(o, d, rows, t_max,
                                                interpret=interp)

    t_b, n_b, m_b, hit_b, _ = geometry.hit_triangles_brute(
        o, d, jnp.asarray(scene.tri_v0), jnp.asarray(scene.tri_e1),
        jnp.asarray(scene.tri_e2), jnp.asarray(scene.tri_mat), t_max
    )
    hit_k = np.asarray(hit_k)
    hit_b = np.asarray(hit_b)
    assert np.array_equal(hit_k, hit_b)
    m = hit_k
    assert np.allclose(np.asarray(t_k)[m], np.asarray(t_b)[m], rtol=1e-5)
    assert np.array_equal(np.asarray(m_k)[m], np.asarray(m_b)[m])
    # normals agree up to sign convention (front-face flip happens later)
    dots = np.abs(np.sum(np.asarray(n_k)[m] * np.asarray(n_b)[m], axis=-1))
    assert np.allclose(dots, 1.0, atol=1e-4)


def test_pallas_respects_t_window():
    scene, _ = config.build_scene(
        config.RenderConfig(scene="cornell", width=4, height=4)
    )
    scene = scene.device()
    o, d = _rays(256)
    rows = jnp.asarray(pk.tri_rows_from_scene(scene))
    interp = jax.default_backend() != "tpu"
    t_max = jnp.zeros(o.shape[0])  # dead rays: zero-width window
    _, _, _, hit = pk.nearest_tri_small(o, d, rows, t_max, interpret=interp)
    assert not np.asarray(hit).any()


def test_slab_step_matches_slab_any2_semantics():
    """kernels/slab.py (the Mosaic phase-A step, probe_slabk.py — NOT
    adopted, tie end-to-end) must keep matching the XLA slab semantics:
    hitcode bits + meta decode, including int-bit-pattern meta columns
    loaded as f32 and bitcast in-kernel."""
    from tpurt.geometry import T_MIN
    from tpurt.kernels import slab as slab_k

    rs = np.random.RandomState(1)
    P, R = 256, 128
    rows = rs.randn(P, 16).astype(np.float32)
    meta = rs.randint(0, 5000, (P, 3)).astype(np.int32)
    rows[:, 12:15] = meta.view(np.float32)
    ox, oy, oz, ix, iy, iz = (rs.randn(P, R).astype(np.float32)
                              for _ in range(6))
    tb = (np.abs(rs.randn(P, R)) * 10).astype(np.float32)

    interp = jax.default_backend() != "tpu"
    code, ml, mr, sk = slab_k.slab_step(
        *map(jnp.asarray, (rows, ox, oy, oz, ix, iy, iz, tb)),
        interpret=interp)

    hits = []
    for off in (0, 6):
        tn = np.full((P, R), np.float32(T_MIN), np.float32)
        tf = tb.copy()
        for k, (oc, ic) in enumerate(((ox, ix), (oy, iy), (oz, iz))):
            t0 = (rows[:, off + k:off + k + 1] - oc) * ic
            t1 = (rows[:, off + k + 3:off + k + 4] - oc) * ic
            tn = np.maximum(tn, np.minimum(t0, t1))
            tf = np.minimum(tf, np.maximum(t0, t1))
        hits.append((tn <= tf).any(axis=1))
    ref_code = (hits[0].astype(np.int32) | (hits[1].astype(np.int32) << 1)
                | ((meta[:, 0] & 1) << 2) | ((meta[:, 1] & 1) << 3))
    assert np.array_equal(np.asarray(code), ref_code)
    assert np.array_equal(np.asarray(ml), meta[:, 0])
    assert np.array_equal(np.asarray(mr), meta[:, 1])
    assert np.array_equal(np.asarray(sk), meta[:, 2])
