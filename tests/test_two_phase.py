"""Two-phase (topology + shading replay) equals the fused trace.

The fwd+bwd driver records discrete topology once and replays only the
differentiable shading in the backward (ops/render._loss_grad_tiled).
These tests pin: (a) trace_shade(trace_topology(...)) == trace(...)
exactly on a scene exercising every primitive kind, textures, shadows
and a mirror chain; (b) the two-phase loss/grads match the full-remat
path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, FLAT, PHONG
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops import render as rd
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.scenes import shapes


@pytest.fixture(scope="module")
def rich_scene():
    """Spheres + plane + cylinder + FLAT/PHONG meshes + texture + mirrors."""
    s = Scene()
    s.set_camera(eye=(0, 1.2, 5), center=(0, 0.3, 0), up=(0, 1, 0),
                 fovy=50, width=48, height=48)
    s.add_light((3, 5, 4), (0.8, 0.8, 0.75))
    s.add_light((-4, 2, 3), (0.3, 0.3, 0.35))
    s.ambience = (0.2, 0.2, 0.2)
    s.background = (0.1, 0.15, 0.3)
    s.add_sphere((-1.1, 0.2, 0.5), 0.55, Material(
        diffuse=(0.7, 0.1, 0.1), specular=(0.5,) * 3, shininess=40,
        mirror=0.35))
    s.add_cylinder((1.2, -0.1, 0.2), (0, 1, 0), 0.35, 1.1, Material(
        diffuse=(0.1, 0.5, 0.6), specular=(0.3,) * 3, shininess=25))
    s.add_plane((0, -0.7, 0), (0, 1, 0), Material(
        diffuse=(0.4, 0.4, 0.4), mirror=0.25))
    v, f = shapes.uv_sphere(0.5, 10, 12, center=(0, 0.4, -0.6))
    s.add_mesh(TriangleMesh(v, f, material=Material(
        diffuse=(0.8, 0.7, 0.2), specular=(0.4,) * 3, shininess=60),
        draw_mode=PHONG))
    g, gf, guvi, gu, gv = shapes.plane_uv_quad(
        (-2.5, -0.69, 2.5), (2.5, -0.69, 2.5), (2.5, -0.69, -2.5),
        (-2.5, -0.69, -2.5))
    s.add_mesh(TriangleMesh(g, gf, uv_indices=guvi, u_coords=gu, v_coords=gv,
                            texture=shapes.checkerboard(),
                            material=Material(diffuse=(0.6, 0.6, 0.6)),
                            draw_mode=FLAT))
    s.max_depth = 3
    return s


def test_trace_shade_equals_trace(rich_scene):
    sc = rich_scene
    scene = sc.build()
    xs, ys = sc.camera.pixel_grid()
    o, d = sc.camera.primary_rays(xs.ravel(), ys.ravel())

    want = np.asarray(tr.trace(scene, o, d))
    topo = tr.trace_topology(scene, o, d)
    got = np.asarray(tr.trace_shade(scene, o, d, topo))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_two_phase_grads_match_full_remat(rich_scene, monkeypatch):
    sc = rich_scene
    scene = sc.build()
    xs, ys = sc.camera.pixel_grid()
    o, d = sc.camera.primary_rays(xs.ravel(), ys.ravel())
    target = jnp.zeros((o.shape[0], 3))
    w = jnp.ones((o.shape[0],))

    monkeypatch.setattr(rd, "TWO_PHASE", True)
    loss_a, grads_a = rd._loss_grad_tiled(scene, o, d, target, w,
                                          tr.TraceConfig(), 1024)
    monkeypatch.setattr(rd, "TWO_PHASE", False)
    loss_b, grads_b = rd._loss_grad_tiled(scene, o, d, target, w,
                                          tr.TraceConfig(), 1024)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for k in grads_a:
        np.testing.assert_allclose(
            np.asarray(grads_a[k]), np.asarray(grads_b[k]),
            rtol=1e-4, atol=1e-5, err_msg=f"grad mismatch: {k}")
