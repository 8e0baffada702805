"""Fused Pallas shading kernels vs the XLA shading path.

ops/pallas_shade.py re-implements resolve_hit + shadow setup + Phong +
the Whitted blend/bounce as two Pallas kernels (interpret mode here).
These tests pin the fused trace against the reference XLA trace on
triangle-only scenes covering: FLAT + PHONG normals, shadows (facing
cull + occluders), multiple lights, the mirror chain, and dead-ray
gating across segments.
"""

import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, FLAT, PHONG
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.scenes.shapes import uv_sphere

#: cluster+pallas on the CPU backend -> interpret mode
FUSED = tr.TraceConfig(tri_method="cluster", use_pallas_cluster=True,
                       fused_shade=True)
PLAIN = tr.TraceConfig(tri_method="cluster", use_pallas_cluster=True)


def tri_scene(mirror=0.0, phong=True, two_lights=True, w=32, h=32):
    s = Scene()
    s.set_camera(eye=(0, 0.8, 4.5), center=(0, 0, 0), up=(0, 1, 0),
                 fovy=50, width=w, height=h)
    s.add_light((2, 4, 3), (0.7, 0.7, 0.65))
    if two_lights:
        s.add_light((-3, 2, 1), (0.3, 0.2, 0.2))
    s.ambience = (0.2, 0.2, 0.2)
    s.background = (0.05, 0.1, 0.2)
    s.max_depth = 2

    v, f = uv_sphere(0.7, 8, 12, center=(0.6, 0.1, 0))
    s.add_mesh(TriangleMesh(v, f, material=Material(
        diffuse=(0.6, 0.2, 0.2), specular=(0.5, 0.5, 0.5), shininess=30,
        mirror=mirror), draw_mode=PHONG if phong else FLAT))
    v2, f2 = uv_sphere(0.5, 6, 9, center=(-0.8, -0.1, 0.3))
    s.add_mesh(TriangleMesh(v2, f2, material=Material(
        diffuse=(0.2, 0.5, 0.3), specular=(0.2, 0.2, 0.2), shininess=8),
        draw_mode=FLAT))
    # floor plate (two triangles) to catch shadows
    fv = np.asarray([[-3, -0.9, -3], [3, -0.9, -3], [3, -0.9, 3],
                     [-3, -0.9, 3]], np.float32)
    ff = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    s.add_mesh(TriangleMesh(fv, ff, material=Material(
        diffuse=(0.45, 0.45, 0.45), mirror=mirror * 0.5)))
    return s


def rays_of(s):
    xs, ys = s.camera.pixel_grid()
    return s.camera.primary_rays(xs.ravel(), ys.ravel())


@pytest.mark.parametrize("mirror,phong,two_lights", [
    (0.0, True, True),
    (0.0, False, False),
    (0.4, True, True),   # mirror chain: multi-segment bounce state
])
def test_fused_matches_xla(mirror, phong, two_lights):
    s = tri_scene(mirror=mirror, phong=phong, two_lights=two_lights)
    data = s.build()
    o, d = rays_of(s)
    want = np.asarray(tr.trace(data, o, d, PLAIN))
    got = np.asarray(tr.trace(data, o, d, FUSED))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_fused_falls_back_when_not_applicable():
    """Textured / non-tri / lightless scenes silently keep the XLA path."""
    s = tri_scene()
    s.add_sphere((0, 2, 0), 0.3, Material(diffuse=(1, 1, 1)))  # non-tri
    data = s.build()
    assert not FUSED.resolved_fused_shade(data)
    s2 = tri_scene()
    s2.lights = []
    data2 = s2.build()
    assert not FUSED.resolved_fused_shade(data2)
    o, d = rays_of(s2)
    # runs (falls back) and matches the plain path
    want = np.asarray(tr.trace(data2, o, d, PLAIN))
    got = np.asarray(tr.trace(data2, o, d, FUSED))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_render_clamp_false_stays_differentiable():
    """render(clamp=False) must keep the XLA shading so jax.grad works."""
    import jax
    import jax.numpy as jnp

    from myraytracer_tpu.ops.render import render

    s = tri_scene(w=16, h=16)
    data = s.build()

    def loss(diff):
        import dataclasses

        sc = dataclasses.replace(data, mat_diffuse=diff)
        img = render(sc, s.camera, cfg=PLAIN, clamp=False)
        return jnp.sum(img)

    g = jax.grad(loss)(data.mat_diffuse)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).sum()) > 0
