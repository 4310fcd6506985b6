"""Unit tests for intersection math vs hand-computed analytic cases
(SURVEY.md §4 Unit row: grazing, behind-origin, degenerate)."""

import jax.numpy as jnp
import numpy as np

from tpurt import geometry
from tpurt.geometry import INF, T_MIN


def _one(o, d):
    return (jnp.asarray([o], jnp.float32),
            jnp.asarray([d], jnp.float32))


def _tmax(n=1):
    return jnp.full((n,), INF, jnp.float32)


class TestSpheres:
    C = jnp.asarray([[0.0, 0.0, 0.0]])
    R = jnp.asarray([1.0])
    M = jnp.asarray([3], jnp.int32)

    def test_head_on(self):
        o, d = _one((0, 0, 5), (0, 0, -1))
        t, n, m, hit = geometry.hit_spheres(o, d, self.C, self.R, self.M,
                                            _tmax())
        assert bool(hit[0]) and np.isclose(float(t[0]), 4.0, atol=1e-5)
        assert np.allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)
        assert int(m[0]) == 3

    def test_from_inside(self):
        o, d = _one((0, 0, 0), (0, 0, -1))
        t, n, m, hit = geometry.hit_spheres(o, d, self.C, self.R, self.M,
                                            _tmax())
        assert bool(hit[0]) and np.isclose(float(t[0]), 1.0, atol=1e-5)

    def test_behind_origin(self):
        o, d = _one((0, 0, 5), (0, 0, 1))  # sphere behind the ray
        _, _, _, hit = geometry.hit_spheres(o, d, self.C, self.R, self.M,
                                            _tmax())
        assert not bool(hit[0])

    def test_grazing_miss(self):
        o, d = _one((0, 1.001, 5), (0, 0, -1))
        _, _, _, hit = geometry.hit_spheres(o, d, self.C, self.R, self.M,
                                            _tmax())
        assert not bool(hit[0])

    def test_zero_radius_is_inert(self):
        o, d = _one((0, 0, 5), (0, 0, -1))
        _, _, _, hit = geometry.hit_spheres(
            o, d, self.C, jnp.asarray([0.0]), self.M, _tmax()
        )
        assert not bool(hit[0])

    def test_t_window_respects_tmin(self):
        # starts on the surface heading out: the near root is ~0 < T_MIN,
        # so it must not self-hit
        o, d = _one((0, 0, 1.0), (0, 0, 1))
        _, _, _, hit = geometry.hit_spheres(o, d, self.C, self.R, self.M,
                                            _tmax())
        assert not bool(hit[0])


class TestPlanes:
    N = jnp.asarray([[0.0, 1.0, 0.0]])
    K = jnp.asarray([2.0])
    M = jnp.asarray([1], jnp.int32)

    def test_hit(self):
        o, d = _one((0, 5, 0), (0, -1, 0))
        t, n, m, hit = geometry.hit_planes(o, d, self.N, self.K, self.M,
                                           _tmax())
        assert bool(hit[0]) and np.isclose(float(t[0]), 3.0, atol=1e-5)

    def test_parallel_miss(self):
        o, d = _one((0, 5, 0), (1, 0, 0))
        _, _, _, hit = geometry.hit_planes(o, d, self.N, self.K, self.M,
                                           _tmax())
        assert not bool(hit[0])

    def test_zero_normal_is_inert(self):
        o, d = _one((0, 5, 0), (0, -1, 0))
        _, _, _, hit = geometry.hit_planes(
            o, d, jnp.zeros((1, 3)), self.K, self.M, _tmax()
        )
        assert not bool(hit[0])


class TestTriangles:
    # unit right triangle in z=0 plane
    V0 = jnp.asarray([[0.0, 0.0, 0.0]])
    E1 = jnp.asarray([[1.0, 0.0, 0.0]])
    E2 = jnp.asarray([[0.0, 1.0, 0.0]])
    M = jnp.asarray([2], jnp.int32)

    def hit(self, o, d, e1=None, e2=None):
        o, d = _one(o, d)
        return geometry.hit_triangles_brute(
            o, d, self.V0, e1 if e1 is not None else self.E1,
            e2 if e2 is not None else self.E2, self.M, _tmax()
        )

    def test_inside(self):
        t, n, m, hit, _ = self.hit((0.25, 0.25, 3), (0, 0, -1))
        assert bool(hit[0]) and np.isclose(float(t[0]), 3.0, atol=1e-5)
        assert np.allclose(np.abs(np.asarray(n[0])), [0, 0, 1], atol=1e-5)

    def test_outside_edge(self):
        _, _, _, hit, _ = self.hit((0.6, 0.6, 3), (0, 0, -1))  # u+v > 1
        assert not bool(hit[0])

    def test_negative_barycentric(self):
        _, _, _, hit, _ = self.hit((-0.1, 0.25, 3), (0, 0, -1))
        assert not bool(hit[0])

    def test_degenerate_is_inert(self):
        z = jnp.zeros((1, 3))
        _, _, _, hit, _ = self.hit((0.25, 0.25, 3), (0, 0, -1), e1=z, e2=z)
        assert not bool(hit[0])

    def test_parallel_ray(self):
        _, _, _, hit, _ = self.hit((0.25, 0.25, 1), (1, 0, 0))
        assert not bool(hit[0])


class TestAABB:
    def test_slab_basic(self):
        o = jnp.asarray([[0.0, 0.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        inv = geometry.safe_inv_dir(d)
        lo = jnp.asarray([[-1.0, -1.0, -1.0]])
        hi = jnp.asarray([[1.0, 1.0, 1.0]])
        assert bool(geometry.slab_test(o, inv, lo, hi, T_MIN,
                                       jnp.asarray([INF]))[0])
        # t_max closer than the box -> prune
        assert not bool(geometry.slab_test(o, inv, lo, hi, T_MIN,
                                           jnp.asarray([2.0]))[0])

    def test_axis_parallel_ray_inside_slab(self):
        o = jnp.asarray([[0.0, 0.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])  # dx=dy=0, ox within x/y slabs
        inv = geometry.safe_inv_dir(d)
        lo = jnp.asarray([[-1.0, -1.0, -1.0]])
        hi = jnp.asarray([[1.0, 1.0, 1.0]])
        assert bool(geometry.slab_test(o, inv, lo, hi, T_MIN,
                                       jnp.asarray([INF]))[0])

    def test_axis_parallel_ray_outside_slab(self):
        o = jnp.asarray([[3.0, 0.0, 5.0]])  # outside x slab, parallel to it
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        inv = geometry.safe_inv_dir(d)
        lo = jnp.asarray([[-1.0, -1.0, -1.0]])
        hi = jnp.asarray([[1.0, 1.0, 1.0]])
        assert not bool(geometry.slab_test(o, inv, lo, hi, T_MIN,
                                           jnp.asarray([INF]))[0])
