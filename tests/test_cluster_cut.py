"""SA-optimal DP cluster cut (ops/cluster._dp_cut) invariants.

The DP replaces the subtree cut as the default (round 4, PERF.md): it
must produce a valid partition of the leaf order (contiguous ranges
covering [0, T), every count in [1, M]) with total surface area no
worse than the subtree cut at the same kappa=0 limit, and the rendered
image must not depend on which cut was used (clustering is a pure
execution-strategy choice).
"""

import numpy as np
import pytest

from myraytracer_tpu.ops.cluster import _dp_cut


def _boxes(T, seed=0, jitter=0.02):
    # a coherent 1-D layout: consecutive tris are near one another, like
    # a BVH-DFS leaf order
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 10, T)[:, None] * np.float32([1, 0.2, 0.05])
    c = (t + rng.normal(0, jitter, (T, 3))).astype(np.float32)
    return c - 0.05, c + 0.05


@pytest.mark.parametrize("T", [1, 2, 5, 127, 128, 129, 1000])
def test_partition_is_valid(T):
    bmin, bmax = _boxes(T)
    first, count, cbmin, cbmax = _dp_cut(bmin, bmax, 128)
    assert first[0] == 0
    assert (count >= 1).all() and (count <= 128).all()
    # contiguous coverage of [0, T)
    np.testing.assert_array_equal(first[1:], (first + count)[:-1])
    assert int(first[-1] + count[-1]) == T
    # every cluster box contains its triangles' boxes
    for k in range(len(first)):
        a, b = int(first[k]), int(first[k] + count[k])
        np.testing.assert_allclose(cbmin[k], bmin[a:b].min(0), rtol=1e-6)
        np.testing.assert_allclose(cbmax[k], bmax[a:b].max(0), rtol=1e-6)


def test_dp_beats_fixed_chunking_on_sa():
    """On a layout with a spatial jump, the DP must place a boundary at
    the jump; naive 128-chunking straddles it with a huge union box."""
    bmin1, bmax1 = _boxes(100, seed=1)
    bmin2, bmax2 = _boxes(100, seed=2)
    bmin = np.concatenate([bmin1, bmin2 + np.float32([0, 50, 0])])
    bmax = np.concatenate([bmax1, bmax2 + np.float32([0, 50, 0])])
    first, count, cbmin, cbmax = _dp_cut(bmin, bmax, 128)

    def total_sa(mn, mx):
        e = np.maximum(mx - mn, 0)
        return float((2 * (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                           + e[:, 2] * e[:, 0])).sum())

    # naive: [0,128) + [128,200)
    naive_mn = np.stack([bmin[:128].min(0), bmin[128:].min(0)])
    naive_mx = np.stack([bmax[:128].max(0), bmax[128:].max(0)])
    assert total_sa(cbmin, cbmax) < 0.5 * total_sa(naive_mn, naive_mx)
    # the jump at index 100 is a cluster boundary
    assert 100 in set(int(f) for f in first)


def test_render_independent_of_cut(monkeypatch):
    """dp and subtree cuts give the same image (strategy, not policy)."""
    from myraytracer_tpu.models.material import Material
    from myraytracer_tpu.models.scene import Scene
    from myraytracer_tpu.ops import tracer as tr
    from myraytracer_tpu.scenes import shapes
    from myraytracer_tpu.models.mesh import TriangleMesh, PHONG

    def build_scene():
        s = Scene()
        s.set_camera(eye=(0, 1, 4), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45, width=40, height=30)
        s.add_light((2, 4, 3), (0.8, 0.8, 0.8))
        v, f = shapes.uv_sphere(1.0, 24, 32)
        s.add_mesh(TriangleMesh(v, f, material=Material(
            diffuse=(0.7, 0.2, 0.2), specular=(0.4, 0.4, 0.4),
            shininess=20), draw_mode=PHONG))
        s.add_plane((0, -1, 0), (0, 1, 0), Material(diffuse=(0.5,) * 3))
        return s

    imgs = {}
    for cut in ("dp", "subtree"):
        monkeypatch.setenv("MRT_CLUSTER_CUT", cut)
        sc = build_scene()
        data = sc.build()
        cam = sc.camera
        o, d = cam.primary_rays(*[a.ravel() for a in cam.pixel_grid()])
        imgs[cut] = np.asarray(
            tr.trace(data, o, d, tr.TraceConfig(tri_method="cluster")))
    np.testing.assert_array_equal(imgs["dp"], imgs["subtree"])
