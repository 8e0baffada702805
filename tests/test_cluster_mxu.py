"""MXU matmul formulation of the cluster triangle solve vs direct Cramer."""

import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.ops import cluster as cl
from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.ops.render import render
from myraytracer_tpu.ops.traverse import pack_tri_vertices

from test_bvh import random_tris, _scene_with_tris


def test_mxu_solve_matches_direct():
    rng = np.random.default_rng(21)
    tri = random_tris(200, rng, spread=5.0)
    scene = _scene_with_tris(tri)
    tri_flat = pack_tri_vertices(scene)

    R = 333
    o = rng.uniform(-10, 10, size=(R, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, size=(R, 3)).astype(np.float32)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    raw = cl.intersect_clusters(
        scene, jnp.asarray(o), jnp.asarray(d),
        cl_tris=cl.pack_cluster_tris(scene, tri_flat))
    mxu = cl.intersect_clusters(
        scene, jnp.asarray(o), jnp.asarray(d),
        cl_tris=cl.pack_cluster_matrices(scene, tri_flat))

    hit_raw = np.asarray(raw.idx) >= 0
    hit_mxu = np.asarray(mxu.idx) >= 0
    # identical hit sets and distances (tiny tolerance for reassociation)
    assert (hit_raw == hit_mxu).mean() > 0.995
    both = hit_raw & hit_mxu
    np.testing.assert_allclose(
        np.asarray(mxu.t)[both], np.asarray(raw.t)[both], rtol=2e-4, atol=1e-4)


def test_mxu_render_matches_vpu_render():
    from test_render import mesh_scene
    from myraytracer_tpu.models.mesh import PHONG

    s = mesh_scene(PHONG, w=24, h=24)
    data = s.build()
    a = np.asarray(render(data, s.camera,
                          cfg=tr.TraceConfig(tri_method="cluster", cluster_mxu=True)))
    b = np.asarray(render(data, s.camera,
                          cfg=tr.TraceConfig(tri_method="cluster", cluster_mxu=False)))
    # pixels may differ only where reassociated fp changes a silhouette hit
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99
    assert np.median(diff) < 1e-5


def test_chunked_phase1_matches_dense(monkeypatch):
    """Large-K fallback (no [R, K] mask) gives identical hits."""
    import myraytracer_tpu.ops.cluster as clmod
    from myraytracer_tpu.ops.traverse import pack_tri_vertices

    rng = np.random.default_rng(31)
    tri = random_tris(700, rng, spread=8.0)
    scene = _scene_with_tris(tri)
    tri_flat = pack_tri_vertices(scene)
    packed = clmod.pack_cluster_tris(scene, tri_flat)

    R = 257
    o = rng.uniform(-15, 15, size=(R, 3)).astype(np.float32)
    tgt = rng.uniform(-6, 6, size=(R, 3)).astype(np.float32)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    dense = clmod.intersect_clusters(scene, jnp.asarray(o), jnp.asarray(d),
                                     cl_tris=packed)
    monkeypatch.setattr(clmod, "STORE_LIMIT", 1)
    chunked = clmod.intersect_clusters(scene, jnp.asarray(o), jnp.asarray(d),
                                       cl_tris=packed)
    np.testing.assert_array_equal(np.asarray(dense.idx), np.asarray(chunked.idx))
    both = np.asarray(dense.idx) >= 0
    np.testing.assert_allclose(np.asarray(dense.t)[both],
                               np.asarray(chunked.t)[both], rtol=1e-6)
