"""Material scatter edge cases: TIR, Schlick limits, metal absorption
(SURVEY.md §4 Unit row; Appendix A.6)."""

import jax.numpy as jnp
import numpy as np

from tpurt import linalg, materials
from tpurt.scene import DIELECTRIC, EMISSIVE, LAMBERTIAN, METAL


def _scatter(d, n, front, mtype, draws, fuzz=0.0, ior=1.5):
    n_rays = len(d)
    return materials.scatter(
        jnp.asarray(d, jnp.float32),
        jnp.asarray(n, jnp.float32),
        jnp.asarray(front),
        jnp.full(n_rays, mtype, jnp.int32),
        jnp.full((n_rays, 3), 0.8, jnp.float32),
        jnp.full(n_rays, fuzz, jnp.float32),
        jnp.full(n_rays, ior, jnp.float32),
        jnp.asarray(draws, jnp.float32),
    )


def test_reflect_refract_helpers():
    d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = np.asarray(linalg.reflect(d, n))[0]
    assert np.allclose(r, [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)

    # refraction into denser medium bends toward the normal
    refr = np.asarray(linalg.refract(d, n, jnp.asarray([1 / 1.5])))[0]
    assert np.isclose(np.linalg.norm(refr), 1.0, atol=1e-5)
    assert abs(refr[0]) < abs(d[0, 0])  # tangential component shrank


def test_total_internal_reflection():
    # inside glass (front=False -> eta=ior=1.5), grazing incidence:
    # sin > 1/1.5 -> must reflect no matter the draw
    d = np.array([[0.9, -np.sqrt(1 - 0.81), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    draws = np.zeros((8, 1), np.float32)
    draws[3, 0] = 0.999999  # would choose refract if allowed
    new_d, atten, alive = _scatter(d, n, [False], DIELECTRIC, draws)
    got = np.asarray(new_d)[0]
    expected = np.asarray(linalg.reflect(jnp.asarray(d), jnp.asarray(n)))[0]
    assert np.allclose(got, expected, atol=1e-5)
    assert bool(alive[0]) and np.allclose(np.asarray(atten)[0], 1.0)


def test_schlick_at_normal_incidence():
    # head-on into glass: reflectance = r0 = ((1-1/1.5)/(1+1/1.5))^2 = 0.04
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    lo = np.zeros((8, 1), np.float32)
    lo[3, 0] = 0.05  # draw above r0 -> refract
    new_d, _, _ = _scatter(d, n, [True], DIELECTRIC, lo)
    assert np.asarray(new_d)[0, 1] < 0  # transmitted (still going down)

    hi = np.zeros((8, 1), np.float32)
    hi[3, 0] = 0.03  # draw below r0 -> reflect
    new_d, _, _ = _scatter(d, n, [True], DIELECTRIC, hi)
    assert np.asarray(new_d)[0, 1] > 0  # reflected (going up)


def test_metal_absorbs_below_horizon():
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    # enormous fuzz pushed opposite the normal: draws make unit=(0,0,-1)?
    # pick draws so the fuzz sphere vector points straight down:
    # unit_vector_from(u0=0 -> z=-1...) z=2*0-1=-1 => vector (0,0,-1) in
    # *world* z; normal is +y so use normal (0,0,1) instead for clarity.
    n2 = np.array([[0.0, 0.0, 1.0]], np.float32)
    d2 = np.array([[0.0, -1.0, 0.0]], np.float32)  # grazing along the surface
    draws = np.zeros((8, 1), np.float32)  # unit=(0,0,-1), cbrt(0)=0 though
    draws[2, 0] = 1.0  # full radius
    _, _, alive = _scatter(d2, n2, [True], METAL, draws, fuzz=10.0)
    assert not bool(alive[0])  # reflected ray pushed below the surface


def test_lambertian_degenerate_fallback():
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    draws = np.zeros((8, 1), np.float32)
    draws[0, 0] = 0.0  # z = -1 -> unit = (0,0,-1)... not anti-normal
    # craft anti-normal: need unit == -n == (0,-1,0): z=0 -> u0=0.5,
    # phi=3pi/2 -> u1=0.75
    draws[0, 0] = 0.5
    draws[1, 0] = 0.75
    new_d, _, alive = _scatter(d, n, [True], LAMBERTIAN, draws)
    got = np.asarray(new_d)[0]
    # fallback to n, normalized
    assert np.allclose(got, [0, 1, 0], atol=1e-4)
    assert bool(alive[0])


def test_emissive_terminates():
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    draws = np.full((8, 1), 0.5, np.float32)
    _, atten, alive = _scatter(d, n, [True], EMISSIVE, draws)
    assert not bool(alive[0])
    assert np.allclose(np.asarray(atten), 0.0)
