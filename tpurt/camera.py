"""Thin-lens camera with per-sample AA jitter (SURVEY.md §1 L7, A.2).

The reference generates one ray at a time inside its pixel loop; here ray
generation is a pure batched function over flat pixel indices so an entire
tile/shard of rays materializes as SoA arrays in one XLA op.

Convention (fixed by decree, A.2): pixel (x, y) with y=0 the TOP row;
flat pixel_id = y * width + x; film plane parameter
    s = (x + jx) / W,   t = (H - (y + jy)) / H
so t→1 at the top. Directions are unit-normalized at generation (decree;
simplifies every downstream invariant: sphere quadratic a=1, dielectric
cosines, sky lerp).

Defocus blur (A.2's optional thin-lens path; off in all five BASELINE
configs) is ONE unconditional code path: the lens basis vectors are zero
at aperture 0, and adding an exact float zero is the identity, so the
pinhole images — including the byte-exact goldens — are unchanged bit
for bit. With aperture > 0 the ray origin jitters on the lens disk and
the direction re-aims at the focus-plane point (RTiOW thin lens).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import linalg


class Camera(NamedTuple):
    """Precomputed RTiOW-style basis; all fields are f32 arrays, shape (3,)."""

    origin: jnp.ndarray
    lower_left: jnp.ndarray  # of the FOCUS plane (distance focus_dist)
    horizontal: jnp.ndarray  # u * viewport_width * focus_dist
    vertical: jnp.ndarray    # v * viewport_height * focus_dist
    lens_u: jnp.ndarray      # u * aperture/2 (zero vectors when pinhole)
    lens_v: jnp.ndarray      # v * aperture/2


def make_camera(lookfrom, lookat, vup, vfov_deg: float, aspect: float,
                aperture: float = 0.0, focus_dist: float = 1.0) -> Camera:
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)

    h = math.tan(math.radians(float(vfov_deg)) / 2.0)
    viewport_h = 2.0 * h
    viewport_w = aspect * viewport_h

    w = linalg.normalize(lookfrom - lookat)
    u = linalg.normalize(jnp.cross(vup, w))
    v = jnp.cross(w, u)

    f = jnp.float32(focus_dist)
    horizontal = f * viewport_w * u
    vertical = f * viewport_h * v
    lower_left = lookfrom - horizontal / 2.0 - vertical / 2.0 - f * w
    r = jnp.float32(aperture / 2.0)
    return Camera(lookfrom, lower_left, horizontal, vertical, r * u, r * v)


def with_lens(cam: Camera, aperture: float, focus_dist: float) -> Camera:
    """Retrofit a thin lens onto an existing (pinhole) camera without
    knowing its build parameters: the unit view basis is recoverable from
    the stored vectors. Used by config.build_scene so the scene builders'
    camera setups stay untouched."""
    scale = jnp.float32(1.0) / linalg.norm(
        cam.origin - cam.lower_left
        - cam.horizontal / 2.0 - cam.vertical / 2.0
    )  # 1/f_old; unit w points from lower_left-center back to origin
    w = (cam.origin - cam.lower_left
         - cam.horizontal / 2.0 - cam.vertical / 2.0) * scale
    u = linalg.normalize(cam.horizontal)
    v = linalg.normalize(cam.vertical)
    f_old = 1.0 / scale
    f = jnp.float32(focus_dist)
    horizontal = cam.horizontal * (f / f_old)
    vertical = cam.vertical * (f / f_old)
    lower_left = cam.origin - horizontal / 2.0 - vertical / 2.0 - f * w
    r = jnp.float32(aperture / 2.0)
    return Camera(cam.origin, lower_left, horizontal, vertical,
                  r * u, r * v)


def generate_rays(cam: Camera, width: int, height: int, pixel_ids, jitter):
    """pixel_ids (N,) int32, jitter (4, N) in [0,1) -> (origins, unit
    dirs). jitter rows 0-1 are the pixel-footprint AA jitter; rows 2-3
    feed the lens-disk sample (unused bits when the aperture is zero)."""
    x = (pixel_ids % width).astype(jnp.float32)
    y = (pixel_ids // width).astype(jnp.float32)
    s = (x + jitter[0]) / width
    t = (height - (y + jitter[1])) / height
    # uniform point on the unit disk (rejection-free)
    lr = jnp.sqrt(jitter[2])
    lphi = (2.0 * np.pi) * jitter[3]
    lp = lr * jnp.cos(lphi)
    lq = lr * jnp.sin(lphi)
    o = (
        cam.origin[None, :]
        + lp[:, None] * cam.lens_u[None, :]
        + lq[:, None] * cam.lens_v[None, :]
    )
    d = (
        cam.lower_left[None, :]
        + s[:, None] * cam.horizontal[None, :]
        + t[:, None] * cam.vertical[None, :]
        - o
    )
    return o, linalg.normalize(d)
