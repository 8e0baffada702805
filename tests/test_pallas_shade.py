"""Fused Pallas shading kernels vs the XLA shading path.

ops/pallas_shade.py re-implements resolve_hit + shadow setup + Phong +
the Whitted blend/bounce as two Pallas kernels (interpret mode here).
These tests pin the fused trace against the reference XLA trace on:
triangle-only scenes (FLAT + PHONG normals, shadows with facing cull +
occluders, multiple lights, the mirror chain, dead-ray gating across
segments), TEXTURED triangle scenes (in-kernel nearest atlas index +
the diffuse override), ANALYTIC primitives (sphere/plane/cylinder
resolve in-kernel, tri-less scenes included), and mixed-kind scenes —
the full scope of the reference's single GPU kernel
(mytracer_gpu.cu:237-312, 511-544).
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


def mixed_scene(mirror=0.0, w=40, h=40, cyl=True, tris=True):
    """Triangles + sphere + plane (+ cylinder): every hit kind on screen."""
    s = Scene()
    s.set_camera(eye=(0, 1.2, 5.0), center=(0, 0, 0), up=(0, 1, 0),
                 fovy=55, width=w, height=h)
    s.add_light((3, 5, 4), (0.8, 0.75, 0.7))
    s.add_light((-2, 3, 2), (0.25, 0.25, 0.35))
    s.ambience = (0.15, 0.15, 0.18)
    s.background = (0.04, 0.07, 0.12)
    s.max_depth = 2
    s.add_sphere((-1.1, 0.1, 0.4), 0.6, Material(
        diffuse=(0.2, 0.3, 0.7), specular=(0.6, 0.6, 0.6), shininess=40,
        mirror=mirror))
    s.add_plane((0, -0.9, 0), (0, 1, 0), Material(
        diffuse=(0.5, 0.5, 0.45), mirror=mirror * 0.5))
    if cyl:
        s.add_cylinder((1.6, -0.3, -0.5), (0.1, 1, 0.15), 0.35, 1.4,
                       Material(diffuse=(0.6, 0.5, 0.2), specular=(0.3,) * 3,
                                shininess=12))
    if tris:
        v, f = uv_sphere(0.55, 7, 11, center=(0.4, 0.0, 0.8))
        s.add_mesh(TriangleMesh(v, f, material=Material(
            diffuse=(0.6, 0.2, 0.2), specular=(0.4,) * 3, shininess=25,
            mirror=mirror), draw_mode=PHONG))
    return s


def textured_scene(w=40, h=40):
    """Two textured quads (different texture sizes) + an untextured mesh."""
    s = Scene()
    s.set_camera(eye=(0, 0.4, 4.0), center=(0, 0, 0), up=(0, 1, 0),
                 fovy=50, width=w, height=h)
    s.add_light((2, 3, 4), (0.9, 0.85, 0.8))
    s.ambience = (0.25, 0.25, 0.25)
    s.background = (0.1, 0.05, 0.15)

    def quad(cx, cy, size, tex, mat=None):
        fv = np.asarray([[cx - size, cy - size, 0], [cx + size, cy - size, 0],
                         [cx + size, cy + size, 0], [cx - size, cy + size, 0]],
                        np.float32)
        ff = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        uvi = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        uu = np.asarray([0, 1, 1, 0], np.float32)
        vv = np.asarray([0, 0, 1, 1], np.float32)
        return TriangleMesh(fv, ff, material=mat or Material(
            diffuse=(1, 0, 1), specular=(0.2,) * 3, shininess=10),
            uv_indices=uvi, u_coords=uu, v_coords=vv, texture=tex,
            draw_mode=FLAT)

    rng = np.random.RandomState(7)
    tex1 = rng.rand(13, 9, 3).astype(np.float32)   # odd sizes: round/clamp
    tex2 = rng.rand(6, 17, 3).astype(np.float32)
    s.add_mesh(quad(-0.8, 0.0, 0.7, tex1))
    s.add_mesh(quad(0.9, 0.2, 0.6, tex2))
    v, f = uv_sphere(0.35, 6, 9, center=(0.0, -0.5, 1.2))
    s.add_mesh(TriangleMesh(v, f, material=Material(
        diffuse=(0.3, 0.6, 0.3), specular=(0.3,) * 3, shininess=20),
        draw_mode=PHONG))
    return s


@pytest.mark.parametrize("mirror,cyl,tris", [
    (0.0, True, True),
    (0.35, False, True),   # mirror chain across kinds
    (0.0, True, False),    # tri-less: analytic-only fused path
])
def test_fused_matches_xla_mixed_kinds(mirror, cyl, tris):
    s = mixed_scene(mirror=mirror, cyl=cyl, tris=tris)
    data = s.build()
    assert FUSED.resolved_fused_shade(data)
    o, d = rays_of(s)
    want = np.asarray(tr.trace(data, o, d, PLAIN))
    got = np.asarray(tr.trace(data, o, d, FUSED))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_fused_matches_xla_textured():
    s = textured_scene()
    data = s.build()
    assert data.has_textures
    assert FUSED.resolved_fused_shade(data)
    o, d = rays_of(s)
    want = np.asarray(tr.trace(data, o, d, PLAIN))
    got = np.asarray(tr.trace(data, o, d, FUSED))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_fused_topology_matches_xla_mixed():
    """trace_topology's fused record == the XLA record on mixed scenes."""
    s = mixed_scene(mirror=0.3)
    data = s.build()
    o, d = rays_of(s)
    want = tr.trace_topology(data, o, d, PLAIN)
    got = tr.trace_topology(data, o, d, FUSED)
    np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
    # indices compare only where a hit was recorded (miss rows carry 0)
    hit = np.asarray(want.hit)
    np.testing.assert_array_equal(np.asarray(got.idx)[hit],
                                  np.asarray(want.idx)[hit])
    np.testing.assert_array_equal(np.asarray(got.hit), hit)
    np.testing.assert_array_equal(np.asarray(got.miss), np.asarray(want.miss))
    np.testing.assert_array_equal(np.asarray(got.shadow),
                                  np.asarray(want.shadow))


def test_fused_falls_back_when_not_applicable():
    """Lightless scenes / oversized material tables keep the XLA path."""
    s2 = tri_scene()
    s2.lights = []
    data2 = s2.build()
    assert not FUSED.resolved_fused_shade(data2)
    o, d = rays_of(s2)
    # runs (falls back) and matches the plain path
    want = np.asarray(tr.trace(data2, o, d, PLAIN))
    got = np.asarray(tr.trace(data2, o, d, FUSED))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # > MAX_MATERIALS distinct materials -> gate off (in-kernel select
    # unrolls over the material table)
    s3 = tri_scene()
    rng = np.random.RandomState(3)
    for i in range(70):
        s3.add_sphere((10 + i, 0, 0), 0.1,
                      Material(diffuse=tuple(rng.rand(3))))
    data3 = s3.build()
    assert data3.mat_diffuse.shape[0] > 64
    assert not FUSED.resolved_fused_shade(data3)


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
