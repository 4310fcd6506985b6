"""Sample-batch checkpoint/resume (SURVEY.md §5 "Failure detection /
checkpoint-resume").

The reference restarts a crashed render from scratch; config 5's renders
(4K × 1024 spp) are long enough that this framework checkpoints the film
accumulator + next sample index every K spp. Resume is *exact*: RNG streams
are (pixel, sample)-counter-derived, so the samples rendered after a resume
are bit-identical to the ones an uninterrupted run would have produced, and
film accumulation is an order-free sum.

Format: NumPy .npz holding (film_sum f64-safe f32, spp_done, rays, and a
config fingerprint that refuses to resume across mismatched configs).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import render as render_mod
from .config import RenderConfig, build_scene
from .scene import Scene


def _fingerprint(cfg: RenderConfig) -> str:
    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save(path: str, cfg: RenderConfig, film_sum: np.ndarray,
         spp_done: int, rays: int) -> None:
    tmp = path + ".tmp.npz"  # np.savez appends .npz unless present
    np.savez(tmp, film_sum=film_sum, spp_done=np.int64(spp_done),
             rays=np.int64(rays),
             fingerprint=np.bytes_(_fingerprint(cfg).encode()))
    os.replace(tmp, path)  # atomic publish


def load(path: str, cfg: RenderConfig):
    """Returns (film_sum, spp_done, rays); raises on config mismatch."""
    with np.load(path) as z:
        fp = bytes(z["fingerprint"]).decode()
        if fp != _fingerprint(cfg):
            raise ValueError(
                f"checkpoint {path!r} was written by a different config "
                f"(fingerprint {fp} != {_fingerprint(cfg)})"
            )
        return (np.asarray(z["film_sum"], np.float32),
                int(z["spp_done"]), int(z["rays"]))


def render_with_checkpoints(cfg: RenderConfig, scene: Optional[Scene] = None,
                            cam=None, path: str = "render.ckpt.npz",
                            every: int = 64, resume: bool = False,
                            mesh=None):
    """Full-frame render that checkpoints every `every` samples.

    Same output contract as render.render(); if `resume` and `path` exists,
    continues from the recorded sample index. Composes with sharding:
    cfg.shard != 'none' routes each sample chunk through
    mesh.render_samples_sharded, so a config-5 multi-chip render can be
    interrupted after any chunk and resumed to the bit-identical image
    (SURVEY.md §5 checkpoint bullet — written about config 5).
    """
    if scene is None or cam is None:
        scene, cam = build_scene(cfg)
    npix = cfg.width * cfg.height
    sharded = cfg.shard != "none"
    if sharded:
        from . import mesh as mesh_mod
        if mesh is None:
            mesh = mesh_mod.make_mesh()
    else:
        scene = scene.device()

    start, total_rays = 0, 0
    film_flat = (np.zeros((npix, 3), np.float32) if sharded
                 else jnp.zeros((npix, 3), jnp.float32))
    resumed_from = None
    if resume and os.path.exists(path):
        film_np, start, total_rays = load(path, cfg)
        film_flat = film_np if sharded else jnp.asarray(film_np)
        resumed_from = start

    t0 = time.perf_counter()
    ckpts = 0
    for s0 in range(start, cfg.spp, every):
        s1 = min(s0 + every, cfg.spp)
        if sharded:
            film_flat, nrays = mesh_mod.render_samples_sharded(
                cfg, scene, cam, s0, s1, film_flat, mesh
            )
        else:
            film_flat, nrays = render_mod.render_samples(
                cfg, scene, cam, s0, s1, film_flat
            )
        total_rays += nrays
        if s1 < cfg.spp:  # final state goes to the image, not the ckpt
            save(path, cfg,
                 np.asarray(jax.block_until_ready(film_flat)),
                 s1, total_rays)
            ckpts += 1

    film = np.asarray(
        jax.block_until_ready(film_flat / cfg.spp)
    ).reshape(cfg.height, cfg.width, 3)
    wall = time.perf_counter() - t0
    stats = {
        "rays": int(total_rays),
        "wall_s": wall,
        "mrays_per_s": total_rays / wall / 1e6 if wall > 0 else 0.0,
        "spp_per_s": cfg.spp / wall if wall > 0 else 0.0,
        "pixels": npix,
        "spp": cfg.spp,
        "checkpoints_written": ckpts,
        "resumed_from_spp": resumed_from,
    }
    if sharded:
        stats["devices"] = mesh.size
        stats["shard"] = cfg.shard
    return film, stats
