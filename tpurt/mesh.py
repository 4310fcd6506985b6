"""Multi-chip rendering: shard_map over the device mesh + ICI collectives
(SURVEY.md §1 L0/L9, §2 "Distributed communication backend").

Replaces the reference's thread-pool work queue: instead of worker threads
pulling tile indices from an atomic counter, the frame's flat pixel axis is
statically sharded across a 1-D ``('chips',)`` mesh — each chip traces its
own pixel block in lockstep SPMD, and the only cross-chip traffic is the
final film collective over ICI (BASELINE "final psum over ICI"):

  * shard='tiles': pixels sharded, film stays sharded (all_gather happens
    implicitly when the host reads the global array); ray-count psum.
  * shard='spp' : the DP-over-samples alternative (SURVEY.md §2 table, TP
    analog) — every chip renders all pixels with a disjoint slice of the
    sample indices, film is psum-reduced over ICI.

Because RNG streams are (pixel, sample)-counter-derived, both shardings
produce the same image as the 1-chip render up to float summation order —
asserted by the fake-mesh tests (SURVEY.md §4 Distributed row).

Degrades to a 1-chip mesh on this host's single TPU [ENV]; tested on an
8-device forced-CPU mesh.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from . import camera as camera_mod
from . import rng, trace, wavefront
from .config import RenderConfig, build_scene
from .scene import Scene

AXIS = "chips"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _device_trace(scene: Scene, cam, gpix, sample_ids, seed,
                  width, height, mode: str, max_depth: int, rr_start):
    """Trace one device's (pixel-block × sample-slice); returns the
    per-pixel radiance sum (B,3) and rays-cast scalar. Pure SPMD body."""
    b = gpix.shape[0]
    c = sample_ids.shape[0]
    pix = jnp.tile(gpix, c)
    smp = jnp.repeat(sample_ids, b)
    keys = rng.make_streams(seed, pix, smp)
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, width, height, pix, jit2)

    if mode == "primary":
        rad, nrays = trace.shade_primary(scene, o, d)
        return rad.reshape(c, b, 3).sum(axis=0), nrays
    if mode == "wavefront":
        lpix = jnp.tile(jnp.arange(b, dtype=jnp.int32), c)  # local film slot
        film_local = jnp.zeros((b, 3), jnp.float32)
        queue = wavefront.make_queue(o, d, lpix, keys)
        return wavefront.trace_static(scene, film_local, queue,
                                      max_depth, rr_start)
    rad, nrays = trace.trace(scene, o, d, keys, max_depth, rr_start)
    return rad.reshape(c, b, 3).sum(axis=0), nrays


@partial(jax.jit,
         static_argnames=("mesh", "mode", "max_depth", "rr_start",
                          "width", "height"))
def _tiles_chunk(scene: Scene, cam, gpix_pad, sample_ids, seed,
                 mesh: Mesh, mode: str, max_depth: int, rr_start,
                 width: int, height: int):
    """One sample-chunk over the pixel-sharded frame."""

    def body(scene, cam, gpix_block, sample_ids, seed):
        rad, nrays = _device_trace(scene, cam, gpix_block, sample_ids, seed,
                                   width, height, mode, max_depth, rr_start)
        return rad, jax.lax.psum(nrays, AXIS)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P()),
        check_vma=False,  # while_loop carries start as replicated constants
    )
    return fn(scene, cam, gpix_pad, sample_ids, seed)


@partial(jax.jit,
         static_argnames=("mesh", "mode", "max_depth", "rr_start",
                          "width", "height"))
def _spp_chunk(scene: Scene, cam, pixel_ids, sample_ids_pad, seed,
               mesh: Mesh, mode: str, max_depth: int, rr_start,
               width: int, height: int):
    """One pixel-block over the sample-sharded axis; film psum over ICI."""

    def body(scene, cam, pixel_ids, sample_block, seed):
        rad, nrays = _device_trace(scene, cam, pixel_ids, sample_block, seed,
                                   width, height, mode, max_depth, rr_start)
        return jax.lax.psum(rad, AXIS), jax.lax.psum(nrays, AXIS)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,  # while_loop carries start as replicated constants
    )
    return fn(scene, cam, pixel_ids, sample_ids_pad, seed)


def render_sharded(cfg: RenderConfig, scene: Optional[Scene] = None,
                   cam=None, mesh: Optional[Mesh] = None):
    """Multi-chip render; same contract as render.render()."""
    if scene is None or cam is None:
        scene, cam = build_scene(cfg)
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.size

    # Explicit placement so the render works on a mesh that is NOT the
    # default backend (e.g. the fake CPU mesh while axon/TPU is default).
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(AXIS))
    scene = jax.device_put(scene, repl)
    cam = jax.device_put(cam, repl)

    npix = cfg.width * cfg.height
    seed = jax.device_put(np.uint32(cfg.seed), repl)
    t0 = time.perf_counter()
    total_rays = 0

    if cfg.shard == "spp":
        if cfg.spp % ndev:
            raise ValueError(
                f"spp sharding needs spp ({cfg.spp}) divisible by the mesh "
                f"size ({ndev}); pick shard='tiles' otherwise"
            )
        per_dev = cfg.spp // ndev
        pixel_block = min(npix, max(1, cfg.ray_batch // ndev))
        film_flat = jax.device_put(np.zeros((npix, 3), np.float32), repl)
        # chunk the per-device sample count so each SPMD call stays bounded
        chunk = max(1, min(per_dev,
                           cfg.ray_batch // max(1, pixel_block)))
        for p0 in range(0, npix, pixel_block):
            p1 = min(p0 + pixel_block, npix)
            pixel_ids = jax.device_put(
                np.arange(p0, p1, dtype=np.int32), repl
            )
            for s0 in range(0, per_dev, chunk):
                s1 = min(s0 + chunk, per_dev)
                # device k takes samples [k*per_dev + s0, k*per_dev + s1)
                blocks = [
                    np.arange(k * per_dev + s0, k * per_dev + s1,
                              dtype=np.int32)
                    for k in range(ndev)
                ]
                sample_ids = jax.device_put(np.concatenate(blocks), sharded)
                rad, nrays = _spp_chunk(
                    scene, cam, pixel_ids, sample_ids, seed, mesh,
                    cfg.mode, cfg.max_depth, cfg.rr_start,
                    cfg.width, cfg.height,
                )
                film_flat = film_flat.at[p0:p1].add(rad)
                total_rays += int(nrays)
    else:  # tiles
        from . import render as render_mod

        npix_pad = -(-npix // ndev) * ndev
        order = render_mod._tile_order_cached(cfg.width, cfg.height)
        gpix = np.concatenate(
            [order, np.full(npix_pad - npix, order[-1], np.int32)]
        )
        gpix = jax.device_put(gpix, sharded)
        block = npix_pad // ndev
        spp_chunk = max(1, cfg.ray_batch // max(1, block))
        film_pad = jax.device_put(np.zeros((npix_pad, 3), np.float32),
                                  sharded)
        for s0 in range(0, cfg.spp, spp_chunk):
            s1 = min(s0 + spp_chunk, cfg.spp)
            sample_ids = jax.device_put(np.arange(s0, s1, dtype=np.int32),
                                        repl)
            rad, nrays = _tiles_chunk(
                scene, cam, gpix, sample_ids, seed, mesh,
                cfg.mode, cfg.max_depth, cfg.rr_start,
                cfg.width, cfg.height,
            )
            film_pad = film_pad + rad
            total_rays += int(nrays)
        # rows of film_pad follow the tile-order enumeration; un-permute
        film_flat = jnp.zeros((npix, 3), jnp.float32).at[order].set(
            film_pad[:npix]
        )

    from . import metrics

    film_flat = film_flat / cfg.spp
    film = np.asarray(jax.block_until_ready(film_flat)).reshape(
        cfg.height, cfg.width, 3
    )
    wall = time.perf_counter() - t0
    stats = metrics.build_stats(total_rays, wall, cfg.width, cfg.height,
                                cfg.spp, devices=ndev, shard=cfg.shard)
    return film, stats
