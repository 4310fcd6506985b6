"""BVH build invariants + traversal == brute force (SURVEY.md §4 Unit BVH)."""

import jax.numpy as jnp
import numpy as np

from tpurt import bvh, geometry, scene as scene_mod, trace


def _soup(mesh):
    v, f = mesh
    v = np.asarray(v, np.float32)
    return v[f[:, 0]], v[f[:, 1]], v[f[:, 2]], np.zeros(len(f), np.int32)


def test_build_invariants(micro_mesh):
    tree = bvh.build(*_soup(micro_mesh))
    bvh.validate(tree)
    # root bbox contains every vertex
    v = np.asarray(micro_mesh[0], np.float32)
    assert np.all(v >= tree.lo[0] - 1e-4) and np.all(v <= tree.hi[0] + 1e-4)
    # leaf counts sum to the triangle count
    assert tree.count.sum() == len(micro_mesh[1])


def test_traversal_matches_brute(micro_mesh, rays_random):
    v, f = micro_mesh
    sc_bvh, _ = scene_mod.mesh_scene(1.0, v, f, use_bvh=True)
    o, d = (jnp.asarray(x) for x in rays_random)

    t_max = jnp.full(o.shape[0], geometry.INF)
    t_bvh, tri = trace.bvh_nearest_tri(sc_bvh.device(), o, d, t_max)

    t_brute, _, _, hit_brute, _ = geometry.hit_triangles_brute(
        o, d, jnp.asarray(sc_bvh.tri_v0), jnp.asarray(sc_bvh.tri_e1),
        jnp.asarray(sc_bvh.tri_e2), jnp.asarray(sc_bvh.tri_mat), t_max
    )
    hit_bvh = np.asarray(tri) >= 0
    assert np.array_equal(hit_bvh, np.asarray(hit_brute))
    assert np.allclose(np.asarray(t_bvh)[hit_bvh],
                       np.asarray(t_brute)[hit_bvh], rtol=1e-5)


def test_single_triangle_tree():
    tree = bvh.build(
        np.array([[0, 0, 0]], np.float32),
        np.array([[1, 0, 0]], np.float32),
        np.array([[0, 1, 0]], np.float32),
        np.array([5], np.int32),
    )
    bvh.validate(tree)
    assert tree.lo.shape[0] == 1 and tree.count[0] == 1
    assert tree.skip[0] == -1
