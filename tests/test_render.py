"""End-to-end render tests: semantics + cross-validation vs the scalar
NumPy oracle (tests/oracle.py), the framework's analogue of the
reference's CPU/GPU cross-backend agreement check (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, FLAT, PHONG
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops.render import render, render_aa
from myraytracer_tpu.ops import tracer as tr

from oracle import OracleRenderer


def small_sphere_scene(w=24, h=24, mirror=0.0):
    s = Scene()
    s.set_camera(eye=(0, 1, 5), center=(0, 0, 0), up=(0, 1, 0), fovy=45, width=w, height=h)
    s.add_light((2, 4, 4), (0.8, 0.8, 0.8))
    s.ambience = (0.2, 0.2, 0.2)
    s.background = (0.0, 0.0, 0.05)
    s.add_sphere((0, 0, 0), 1.0,
                 Material(ambient=(0.2, 0, 0), diffuse=(0.7, 0, 0),
                          specular=(0.5, 0.5, 0.5), shininess=30, mirror=mirror))
    s.add_plane((0, -1, 0), (0, 1, 0),
                Material(ambient=(0.1, 0.1, 0.1), diffuse=(0.5, 0.5, 0.5)))
    s.max_depth = 2
    return s


def mesh_scene(draw_mode, w=24, h=24):
    s = Scene()
    s.set_camera(eye=(0, 0.5, 4), center=(0, 0, 0), up=(0, 1, 0), fovy=45, width=w, height=h)
    s.add_light((3, 3, 3), (0.9, 0.9, 0.9))
    s.ambience = (0.15, 0.15, 0.15)
    s.background = (0.02, 0.02, 0.02)
    # icosahedron-ish blob: a coarse UV-sphere mesh
    from myraytracer_tpu.scenes.shapes import uv_sphere
    v, f = uv_sphere(0.9, 8, 12)
    s.add_mesh(TriangleMesh(v, f, material=Material(
        ambient=(0.1, 0.1, 0.05), diffuse=(0.4, 0.5, 0.2),
        specular=(0.3, 0.3, 0.3), shininess=10), draw_mode=draw_mode))
    s.max_depth = 2
    return s


class TestSemantics:
    def test_background_on_miss(self):
        s = small_sphere_scene()
        img = np.asarray(render(s.build(), s.camera))
        np.testing.assert_allclose(img[0, 0], [0, 0, 0.05], atol=1e-6)

    def test_sphere_visible_and_red(self):
        s = small_sphere_scene()
        img = np.asarray(render(s.build(), s.camera))
        c = img[img.shape[0] // 2, img.shape[1] // 2]
        assert c[0] > 0.2 and c[0] > c[1] and c[0] > c[2]

    def test_shadow_darkens_some_ground(self):
        # same scene with the ground's shadow test disabled must be
        # strictly brighter somewhere (the occluded region), equal elsewhere
        def build(shadowable):
            s = Scene()
            s.set_camera(eye=(0, 2, 6), center=(0, 0, 0), up=(0, 1, 0),
                         fovy=45, width=48, height=48)
            s.add_light((2, 6, 2), (0.8, 0.8, 0.8))
            s.ambience = (0.1, 0.1, 0.1)
            s.add_sphere((0, 0.5, 0), 0.7, Material(diffuse=(0.7, 0, 0)))
            s.add_plane((0, -0.5, 0), (0, 1, 0),
                        Material(diffuse=(0.5, 0.5, 0.5), shadowable=shadowable))
            return s

        s1, s0 = build(True), build(False)
        with_sh = np.asarray(render(s1.build(), s1.camera))
        without = np.asarray(render(s0.build(), s0.camera))
        diff = without - with_sh
        assert diff.min() >= -1e-6          # shadows only remove light
        assert diff.max() > 0.1             # a clearly shadowed region exists

    def test_mirror_adds_reflection(self):
        base = small_sphere_scene(mirror=0.0)
        img0 = np.asarray(render(base.build(), base.camera))
        mir = small_sphere_scene(mirror=0.5)
        img1 = np.asarray(render(mir.build(), mir.camera))
        assert not np.allclose(img0, img1)

    def test_clamped_to_one(self):
        s = small_sphere_scene()
        s.add_light((0, 5, 5), (5.0, 5.0, 5.0))  # blowout light
        img = np.asarray(render(s.build(), s.camera))
        assert img.max() <= 1.0 + 1e-6


class TestOracleAgreement:
    @pytest.mark.parametrize("mirror", [0.0, 0.4])
    def test_spheres_planes(self, mirror):
        s = small_sphere_scene(w=20, h=20, mirror=mirror)
        data = s.build()
        got = np.asarray(render(data, s.camera))
        want = OracleRenderer(data, s.camera).render()
        np.testing.assert_allclose(got, want, atol=2e-3)

    @pytest.mark.parametrize("mode", [FLAT, PHONG])
    def test_mesh(self, mode):
        s = mesh_scene(mode, w=20, h=20)
        data = s.build()
        got = np.asarray(render(data, s.camera))
        want = OracleRenderer(data, s.camera).render()
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_all_tri_methods_agree(self):
        s = mesh_scene(PHONG, w=20, h=20)
        data = s.build()
        imgs = [
            np.asarray(render(data, s.camera, cfg=tr.TraceConfig(tri_method=m)))
            for m in ("bvh", "cluster", "brute")
        ]
        np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)
        np.testing.assert_allclose(imgs[0], imgs[2], atol=1e-5)


class TestAdaptiveAA:
    def test_aa_changes_only_edges(self):
        s = small_sphere_scene(w=32, h=32)
        data = s.build()
        img1 = np.asarray(render(data, s.camera))
        img2 = np.asarray(render_aa(data, s.camera))
        diff = np.abs(img1 - img2).sum(-1)
        assert diff.max() > 0  # silhouettes supersampled
        # border never touched (reference skips the 1-px border)
        assert diff[0, :].max() == 0 and diff[:, 0].max() == 0
        assert diff[-1, :].max() == 0 and diff[:, -1].max() == 0
        # flat background interior untouched
        assert diff[2, 2] == 0


def test_zero_color_lights_are_culled_image_exact():
    """Scene.build statically drops lights whose color is exactly zero;
    the packed arrays shrink and the image is bit-identical (a zero
    light's diffuse/specular terms are scaled by its color, so it only
    ever contributed dead shadow-ray work)."""
    import numpy as np

    from myraytracer_tpu.models.material import Material
    from myraytracer_tpu.models.scene import Scene
    from myraytracer_tpu.ops.render import render

    def build(with_dead):
        s = Scene()
        s.set_camera(eye=(0, 1, 5), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45, width=48, height=48)
        s.add_light((2, 4, 4), (0.8, 0.7, 0.6))
        if with_dead:
            s.add_light((-3, 2, 1), (0.0, 0.0, 0.0))
        s.add_sphere((0, 0, 0), 1.0, Material(diffuse=(0.7, 0.1, 0.1)))
        s.add_plane((0, -1, 0), (0, 1, 0), Material(diffuse=(0.5,) * 3))
        return s

    live = build(with_dead=False)
    dead = build(with_dead=True)
    d_live = live.build()
    d_dead = dead.build()
    assert d_dead.n_lights == 1  # the zero light is culled at build
    img_a = np.asarray(render(d_live, live.camera))
    img_b = np.asarray(render(d_dead, dead.camera))
    np.testing.assert_array_equal(img_a, img_b)
