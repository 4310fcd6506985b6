"""Deterministic counter-based RNG streams (SURVEY.md Appendix A.10).

Replaces the reference's per-thread PRNG (SURVEY.md §2 "RNG"): instead of a
stateful per-worker generator whose stream depends on scheduling, every draw
is derived purely from ``(seed, pixel_index, sample_index, stream)`` with
jax.random's threefry. Consequences:

  * renders are bit-reproducible for a fixed seed regardless of tiling,
    sample chunking, device count, or wavefront queue order;
  * checkpoint/resume produces streams identical to an uninterrupted run;
  * the NumPy oracle (cpu_ref) consumes the *same bits* by evaluating these
    functions on the CPU backend, so CPU/TPU image differences are purely
    floating-point reassociation (the RMSE-parity contract).

Draw layout — fixed by decree so megakernel, wavefront, and cpu_ref agree:

  base_key(pixel, sample) = fold_in(fold_in(PRNGKey(seed), pixel), sample)
  camera jitter           = uniform(fold_in(base_key, CAMERA_STREAM), (2,))
  bounce b scatter draws  = uniform(fold_in(base_key, b), (NDRAWS,)) with
      [0], [1] : direction draws (unit-vector z/phi for lambertian;
                 same unit vector scaled by cbrt([2]) for metal fuzz)
      [2]      : radius draw for random-in-unit-sphere
      [3]      : dielectric reflect-vs-refract decision
      [4]      : Russian-roulette survival draw
      [5:8]    : reserved

Sampling primitives are rejection-free closed forms (vectorization- and
determinism-friendly) rather than the reference's rejection loops:
  random_unit_vector(u0, u1): z = 2*u0 - 1, phi = 2*pi*u1
  random_in_unit_sphere(u0, u1, u2): random_unit_vector * cbrt(u2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NDRAWS = 8
CAMERA_STREAM = 0x43414D  # 'CAM' — disjoint from any bounce index


def base_keys(seed, pixel_ids, sample_ids):
    """Per-ray stream keys. pixel_ids/sample_ids: (N,) int32 -> keys (N,)."""
    root = jax.random.PRNGKey(seed)

    def one(p, s):
        return jax.random.fold_in(jax.random.fold_in(root, p), s)

    return jax.vmap(one)(
        pixel_ids.astype(jnp.uint32), sample_ids.astype(jnp.uint32)
    )


def camera_draws(keys):
    """(N,) keys -> (N, 2) uniforms in [0,1) for pixel-footprint jitter."""
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, CAMERA_STREAM), (2,))
    )(keys)


def bounce_draws(keys, bounce):
    """(N,) keys, scalar bounce -> (N, NDRAWS) uniforms in [0,1)."""
    b = jnp.asarray(bounce, jnp.uint32)
    return jax.vmap(
        lambda k: jax.random.uniform(jax.random.fold_in(k, b), (NDRAWS,))
    )(keys)


def unit_vector_from(u0, u1):
    """Uniform direction on the unit sphere from two uniforms (batched)."""
    z = 2.0 * u0 - 1.0
    phi = (2.0 * np.pi) * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_unit_sphere_from(u0, u1, u2):
    """Uniform point in the unit ball from three uniforms (batched)."""
    return unit_vector_from(u0, u1) * jnp.cbrt(u2)[..., None]


# ---------------------------------------------------------------------------
# CPU-backend accessors for the NumPy oracle (cpu_ref). These run the exact
# same threefry computation pinned to the CPU backend and hand back ndarray
# results, so the oracle's streams are bit-identical to the TPU tracer's.
# ---------------------------------------------------------------------------

def _cpu():
    return jax.devices("cpu")[0]


def np_camera_draws(seed, pixel_ids, sample_ids):
    with jax.default_device(_cpu()):
        k = base_keys(seed, jnp.asarray(pixel_ids), jnp.asarray(sample_ids))
        return np.asarray(camera_draws(k))


def np_bounce_draws(seed, pixel_ids, sample_ids, bounce):
    with jax.default_device(_cpu()):
        k = base_keys(seed, jnp.asarray(pixel_ids), jnp.asarray(sample_ids))
        return np.asarray(bounce_draws(k, bounce))


def np_unit_vector_from(u0, u1):
    z = 2.0 * u0 - 1.0
    phi = (2.0 * np.pi) * u1
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


def np_in_unit_sphere_from(u0, u1, u2):
    return np_unit_vector_from(u0, u1) * np.cbrt(u2)[..., None]
