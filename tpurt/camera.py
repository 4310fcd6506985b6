"""Pinhole camera with per-sample AA jitter (SURVEY.md §1 L7, Appendix A.2).

The reference generates one ray at a time inside its pixel loop; here ray
generation is a pure batched function over flat pixel indices so an entire
tile/shard of rays materializes as SoA arrays in one XLA op.

Convention (fixed by decree, A.2): pixel (x, y) with y=0 the TOP row;
flat pixel_id = y * width + x; film plane parameter
    s = (x + jx) / W,   t = (H - (y + jy)) / H
so t→1 at the top. Directions are unit-normalized at generation (decree;
simplifies every downstream invariant: sphere quadratic a=1, dielectric
cosines, sky lerp). Defocus blur is off in all five BASELINE configs.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from . import linalg


class Camera(NamedTuple):
    """Precomputed RTiOW-style basis; all fields are f32 arrays, shape (3,)."""

    origin: jnp.ndarray
    lower_left: jnp.ndarray
    horizontal: jnp.ndarray  # u * viewport_width
    vertical: jnp.ndarray    # v * viewport_height


def make_camera(lookfrom, lookat, vup, vfov_deg: float, aspect: float) -> Camera:
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)

    h = math.tan(math.radians(float(vfov_deg)) / 2.0)
    viewport_h = 2.0 * h
    viewport_w = aspect * viewport_h

    w = linalg.normalize(lookfrom - lookat)
    u = linalg.normalize(jnp.cross(vup, w))
    v = jnp.cross(w, u)

    horizontal = viewport_w * u
    vertical = viewport_h * v
    lower_left = lookfrom - horizontal / 2.0 - vertical / 2.0 - w
    return Camera(lookfrom, lower_left, horizontal, vertical)


def generate_rays(cam: Camera, width: int, height: int, pixel_ids, jitter):
    """pixel_ids (N,) int32, jitter (2, N) in [0,1) -> (origins, unit dirs)."""
    x = (pixel_ids % width).astype(jnp.float32)
    y = (pixel_ids // width).astype(jnp.float32)
    s = (x + jitter[0]) / width
    t = (height - (y + jitter[1])) / height
    d = (
        cam.lower_left[None, :]
        + s[:, None] * cam.horizontal[None, :]
        + t[:, None] * cam.vertical[None, :]
        - cam.origin[None, :]
    )
    o = jnp.broadcast_to(cam.origin[None, :], d.shape)
    return o, linalg.normalize(d)
