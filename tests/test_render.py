"""Render-loop structure properties (SURVEY.md §1 L9).

Cross-batch tail coalescing (render._accum_frame_coalesced) must be
invisible: bit-identical film and identical ray accounting vs the plain
per-batch loop, at every group size — including flushes that land on a
group boundary and partial final groups. The per-ray RNG/accumulation
chains are untouched by construction (trace.trace bounce0 is absolute;
dead lanes only add exact 0.0); these tests pin that the film FOLD
order is also preserved.
"""

import numpy as np
import pytest

from tpurt import config, render

CFG = config.RenderConfig(width=64, height=32, spp=4, scene="blob",
                          mesh_subdiv=2, mode="mega", max_depth=6,
                          seed=5, ray_batch=1024)
# 2048 px / 1024-block => 2 blocks x 4 sample-chunks = 8 iterations


@pytest.fixture(scope="module")
def blob_scene():
    scene, cam = config.build_scene(CFG)
    return scene.device(), cam


@pytest.fixture(scope="module")
def plain_frame(blob_scene):
    scene, cam = blob_scene
    old = render.TAIL_COALESCE
    render.TAIL_COALESCE = False
    try:
        f0, n0 = render.render_samples(CFG, scene, cam, 0, CFG.spp)
    finally:
        render.TAIL_COALESCE = old
    return np.asarray(f0), n0


@pytest.mark.parametrize("group", [4, 3])
def test_tail_coalesce_bit_identical(blob_scene, plain_frame, group):
    """group=4: both flushes land exactly on group boundaries.
    group=3: flushes at iterations 2, 5 and a PARTIAL final group (8 %
    3 = 2 filled slots) — covers the stale-slot reset path."""
    scene, cam = blob_scene
    f0, n0 = plain_frame
    old = (render.TAIL_COALESCE, render.TAIL_GROUP)
    render.TAIL_COALESCE, render.TAIL_GROUP = True, group
    try:
        f1, n1 = render.render_samples(CFG, scene, cam, 0, CFG.spp)
    finally:
        render.TAIL_COALESCE, render.TAIL_GROUP = old
    assert n1 == n0
    assert np.array_equal(np.asarray(f1), f0)


def test_tail_coalesce_composes_with_sample_spans(blob_scene, plain_frame):
    """The checkpoint/resume contract (render samples in any grouping)
    must hold through the coalesced path: two sample spans accumulated
    into one film equal the one-call render bit-exactly."""
    scene, cam = blob_scene
    f0, n0 = plain_frame
    old = (render.TAIL_COALESCE, render.TAIL_GROUP)
    render.TAIL_COALESCE, render.TAIL_GROUP = True, 4
    try:
        f1, n1a = render.render_samples(CFG, scene, cam, 0, 2)
        f1, n1b = render.render_samples(CFG, scene, cam, 2, CFG.spp, f1)
    finally:
        render.TAIL_COALESCE, render.TAIL_GROUP = old
    assert n1a + n1b == n0
    assert np.array_equal(np.asarray(f1), f0)


def test_spmajor_bit_identical(blob_scene, plain_frame):
    """Sample-major packets (render.SPMAJOR) must be invisible: the
    regrouping only permutes rows WITHIN a chunk dispatch, and per pixel
    the chunk's samples are summed in the same ascending order, so the
    film and the ray count are bit-identical to the default layout.
    Engages here as (256-pixel x 4-sample) chunks vs (1024 x 1)."""
    scene, cam = blob_scene
    f0, n0 = plain_frame
    old, orig = render.SPMAJOR, render._accum_frame
    engaged = []
    render.SPMAJOR = True
    render._accum_frame = lambda *a, **k: (
        engaged.append(k.get("spmajor", False)), orig(*a, **k))[1]
    try:
        f1, n1 = render.render_samples(CFG, scene, cam, 0, CFG.spp)
    finally:
        render.SPMAJOR, render._accum_frame = old, orig
    assert engaged and all(engaged)   # the flag actually took the path
    assert n1 == n0
    assert np.array_equal(np.asarray(f1), f0)


def test_spmajor_composes_with_sample_spans(blob_scene, plain_frame):
    """Checkpoint/resume contract through the sample-major path: a
    3-sample span (ragged c=3) plus a 1-sample span (c=1: spmajor
    disengages, the span runs the default layout) accumulate to the
    one-call film bit-exactly."""
    scene, cam = blob_scene
    f0, n0 = plain_frame
    old = render.SPMAJOR
    render.SPMAJOR = True
    try:
        f1, n1a = render.render_samples(CFG, scene, cam, 0, 3)
        f1, n1b = render.render_samples(CFG, scene, cam, 3, CFG.spp, f1)
    finally:
        render.SPMAJOR = old
    assert n1a + n1b == n0
    assert np.array_equal(np.asarray(f1), f0)


def test_spmajor_wavefront_bit_identical(blob_scene):
    """The wavefront chunk loop (_wavefront_frame) under SPMAJOR: queue
    rows are pixel-major but trace_chunk_staged restores original queue
    order, so the per-pixel sample sums — and the film — are
    bit-identical to the default layout."""
    scene, cam = blob_scene
    cfg = CFG.replace(mode="wavefront", rr_start=3)
    old, orig = render.SPMAJOR, render._wavefront_frame
    engaged = []
    render.SPMAJOR = False
    render._wavefront_frame = lambda *a, **k: (
        engaged.append(k.get("spmajor", False)), orig(*a, **k))[1]
    try:
        f0, n0 = render.render_samples(cfg, scene, cam, 0, cfg.spp)
        assert engaged and not any(engaged)
        engaged.clear()
        render.SPMAJOR = True
        f1, n1 = render.render_samples(cfg, scene, cam, 0, cfg.spp)
    finally:
        render.SPMAJOR, render._wavefront_frame = old, orig
    assert engaged and all(engaged)   # the flag actually took the path
    assert n1 == n0
    assert np.array_equal(np.asarray(f1), np.asarray(f0))
