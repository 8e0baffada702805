"""Large-scene hardening: >100k tris, >1000 clusters, at real size.

Two independent triangle-intersection paths (the cluster scan and the
threaded-BVH walk) must agree on a 112k-triangle office build — this
exercises cluster cutting, packing and the scan at a scale the toy
tests never reach, plus the chunked phase-1 path with its real
cluster count (STORE_LIMIT forced down, not a monkeypatched toy).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.ops import cluster, traverse
from myraytracer_tpu.scenes.golden import scene_08_office

TESS = 28  # 112,296 tris, 1,345 clusters (measured)


@pytest.fixture(scope="module")
def big_scene():
    sc = scene_08_office(tess=TESS, resolution=(64, 64))
    return sc, sc.build()


def _rays(sc, n=512):
    rng = np.random.default_rng(5)
    xs = rng.uniform(0, 64, n).astype(np.float32)
    ys = rng.uniform(0, 64, n).astype(np.float32)
    return sc.camera.primary_rays(jnp.asarray(xs), jnp.asarray(ys))


def test_scene_scale(big_scene):
    _, scene = big_scene
    assert int(scene.n_tris) > 100_000
    assert int(scene.cl_first.shape[0]) > 1_000


def test_cluster_agrees_with_bvh_walk(big_scene):
    sc, scene = big_scene
    o, d = _rays(sc)
    got = cluster.intersect_clusters(scene, o, d)
    want = traverse.traverse_bvh(scene, o, d)
    np.testing.assert_array_equal(np.asarray(got.idx) >= 0,
                                  np.asarray(want.idx) >= 0)
    hit = np.asarray(want.idx) >= 0
    assert hit.mean() > 0.5, "camera rays should mostly hit the office"
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(want.t)[hit], rtol=1e-5)


def test_chunked_phase1_at_real_cluster_count(big_scene, monkeypatch):
    sc, scene = big_scene
    o, d = _rays(sc, n=256)
    want = cluster.intersect_clusters(scene, o, d)
    # force the chunked/recompute phase-1 with the real 1.3k-cluster list
    monkeypatch.setattr(cluster, "STORE_LIMIT", 1)
    got = cluster.intersect_clusters(scene, o, d)
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(want.idx))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t))
