"""Pallas cluster-scan kernel vs the XLA cluster scan (interpret mode on
the CPU backend; compiled via Mosaic on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.ops import cluster as cl
from myraytracer_tpu.ops.pallas_cluster import (
    PALLAS_OK, intersect_clusters_pallas,
)

from test_bvh import random_tris, _scene_with_tris

needs_pallas = pytest.mark.skipif(not PALLAS_OK, reason="no pallas")


def _rays(rng, R, spread=15.0):
    o = rng.uniform(-spread, spread, size=(R, 3)).astype(np.float32)
    tgt = rng.uniform(-6, 6, size=(R, 3)).astype(np.float32)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


@needs_pallas
def test_matches_xla_cluster_scan():
    rng = np.random.default_rng(41)
    tri = random_tris(600, rng, spread=8.0)
    scene = _scene_with_tris(tri)
    o, d = _rays(rng, 700)  # non-multiple of tile: exercises padding

    want = cl.intersect_clusters(scene, o, d)
    got = intersect_clusters_pallas(scene, o, d, interpret=True)

    # the kernel computes the solve from precomputed constants —
    # same math, different association: tiny fp drift is expected
    gi, wi = np.asarray(got.idx), np.asarray(want.idx)
    assert (gi == wi).mean() > 0.995
    both = (wi >= 0) & (gi == wi)
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(want.t)[both], rtol=5e-5)


@needs_pallas
def test_any_hit_and_active():
    rng = np.random.default_rng(42)
    tri = random_tris(200, rng, spread=6.0)
    scene = _scene_with_tris(tri)
    o, d = _rays(rng, 300)

    closest = cl.intersect_clusters(scene, o, d)
    hit = np.asarray(closest.idx) >= 0
    t_ref = np.asarray(closest.t)

    below = intersect_clusters_pallas(
        scene, o, d, t_max=jnp.asarray(np.where(hit, t_ref * 0.999, 1e30)),
        any_hit=True, interpret=True)
    assert (np.asarray(below.idx)[hit] == -1).all()

    above = intersect_clusters_pallas(
        scene, o, d, t_max=jnp.asarray(np.where(hit, t_ref * 1.001, 1e30)),
        any_hit=True, interpret=True)
    assert (np.asarray(above.idx)[hit] >= 0).all()

    none = intersect_clusters_pallas(
        scene, o, d, active=jnp.zeros((300,), bool), interpret=True)
    assert (np.asarray(none.idx) == -1).all()


@needs_pallas
def test_end_to_end_render_with_pallas_flag():
    from myraytracer_tpu.ops import tracer as tr
    from myraytracer_tpu.ops.render import render
    from test_render import mesh_scene
    from myraytracer_tpu.models.mesh import PHONG

    s = mesh_scene(PHONG, w=20, h=20)
    data = s.build()
    a = np.asarray(render(data, s.camera,
                          cfg=tr.TraceConfig(tri_method="cluster")))
    b = np.asarray(render(data, s.camera,
                          cfg=tr.TraceConfig(tri_method="cluster",
                                             use_pallas_cluster=True)))
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 1e-3).mean() > 0.99
    assert np.median(diff) < 1e-5


@pytest.mark.slow
@needs_pallas
def test_smem_chunking_agrees(monkeypatch):
    """Forcing a tiny SMEM table budget splits the ray batch into chunks;
    results must equal the unchunked call exactly (rays are independent).
    Guards the large-K path: at K~600 clusters a 131072-ray any-hit batch
    overflows the real 1 MB SMEM budget unless chunked."""
    rng = np.random.default_rng(77)
    tri = random_tris(500, rng, spread=8.0)
    scene = _scene_with_tris(tri)
    o, d = _rays(rng, 4096)

    want = intersect_clusters_pallas(scene, o, d, interpret=True)
    # any-hit reference with finite bounds (the shadow-query shape that
    # overflowed), computed BEFORE the budget shrinks
    t_max = jnp.full((4096,), 20.0)
    want_ah = intersect_clusters_pallas(scene, o, d, t_max=t_max,
                                        any_hit=True, interpret=True)

    # budget that allows only ~1 ray tile worth of subgroups per chunk
    monkeypatch.setenv("MRT_SMEM_TABLE_BUDGET", "1")
    got = intersect_clusters_pallas(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(want.idx))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))
    got_ah = intersect_clusters_pallas(scene, o, d, t_max=t_max,
                                       any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_ah.idx) >= 0,
                                  np.asarray(want_ah.idx) >= 0)


@needs_pallas
def test_anyhit_hull_phase1_is_superset():
    """The hull phase-1 (segment swept volume) must mark a SUPERSET of
    the clusters any active ray's exact per-ray slab test touches —
    a false negative would silently drop occluders (wrong shadows)."""
    from myraytracer_tpu.ops import intersect as isx
    from myraytracer_tpu.ops import pallas_cluster as pc

    rng = np.random.default_rng(3)
    tri = random_tris(400, rng, spread=9.0)
    scene = _scene_with_tris(tri)
    cl_bbmin, cl_bbmax = scene.cl_bbmin, scene.cl_bbmax

    SUBV = pc.SUB
    R = 4 * SUBV
    # shadow-like bundles: origins clustered per subgroup, one target
    # point per subgroup (a light), finite t_max at the target
    o = np.zeros((R, 3), np.float32)
    d = np.zeros((R, 3), np.float32)
    t0 = np.zeros((R,), np.float32)
    act = rng.uniform(0, 1, R) > 0.2
    for s in range(R // SUBV):
        centr = rng.uniform(-6, 6, 3)
        light = rng.uniform(-8, 8, 3)
        orig = centr + rng.normal(0, 0.8, (SUBV, 3))
        vec = light - orig
        dist = np.linalg.norm(vec, axis=1)
        d[s*SUBV:(s+1)*SUBV] = (vec / dist[:, None]).astype(np.float32)
        o[s*SUBV:(s+1)*SUBV] = orig.astype(np.float32)
        t0[s*SUBV:(s+1)*SUBV] = dist.astype(np.float32)

    n_sub = R // SUBV
    key = pc._phase1_anyhit_hull(
        jnp.asarray(o).reshape(n_sub, SUBV, 3),
        jnp.asarray(d).reshape(n_sub, SUBV, 3),
        jnp.asarray(t0).reshape(n_sub, SUBV),
        jnp.asarray(act).reshape(n_sub, SUBV),
        cl_bbmin, cl_bbmax)
    hull_touch = np.asarray(key) < isx.INF          # [S, K]

    # exact per-ray union (the kernel's in-kernel test semantics)
    box_hit, tmin_k = isx.ray_aabb(
        jnp.asarray(o)[:, None, :], (1.0 / jnp.asarray(d))[:, None, :],
        cl_bbmin[None], cl_bbmax[None])
    ray_touch = (np.asarray(box_hit) & act[:, None]
                 & (np.asarray(tmin_k) <= t0[:, None]))
    exact_touch = ray_touch.reshape(n_sub, SUBV, -1).any(axis=1)

    missed = exact_touch & ~hull_touch
    assert not missed.any(), f"hull dropped {missed.sum()} touched clusters"
    # and it should not be wildly loose either (sanity, not correctness)
    assert hull_touch.sum() <= 4 * max(1, exact_touch.sum())
