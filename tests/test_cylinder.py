"""Analytic cylinder primitive: intersector units + render/oracle/grammar."""

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops.render import render
from oracle import OracleRenderer


def _v(*a):
    return jnp.asarray(a, jnp.float32)


class TestRayCylinder:
    c = _v(0, 0, 0)
    axis = _v(0, 1, 0)

    def hit(self, o, d, r=1.0, h=2.0):
        return float(isx.ray_cylinder(
            _v(*o)[None], _v(*d)[None], self.c[None], self.axis[None],
            jnp.asarray([r]), jnp.asarray([h]))[0])

    def test_side_hit(self):
        np.testing.assert_allclose(self.hit((3, 0, 0), (-1, 0, 0)), 2.0, rtol=1e-5)

    def test_miss_above(self):
        assert self.hit((3, 5, 0), (-1, 0, 0)) == isx.INF

    def test_through_open_cap(self):
        # uncapped: axis-parallel ray inside the tube passes through
        assert self.hit((0, 5, 0), (0, -1, 0)) == isx.INF

    def test_inside_hits_far_wall(self):
        np.testing.assert_allclose(self.hit((0, 0, 0), (1, 0, 0)), 1.0, rtol=1e-5)

    def test_edge_of_height(self):
        t = self.hit((3, 0.99, 0), (-1, 0, 0))
        np.testing.assert_allclose(t, 2.0, rtol=1e-4)
        assert self.hit((3, 1.01, 0), (-1, 0, 0)) == isx.INF

    def test_tilted_axis(self):
        axis = _v(0, 0, 1)
        t = isx.ray_cylinder(_v(3, 0, 0)[None], _v(-1, 0, 0)[None],
                             self.c[None], axis[None],
                             jnp.asarray([1.0]), jnp.asarray([4.0]))[0]
        np.testing.assert_allclose(float(t), 2.0, rtol=1e-5)


def cyl_scene():
    s = Scene()
    s.set_camera(eye=(0, 1.5, 6), center=(0, 0.3, 0), up=(0, 1, 0), fovy=45,
                 width=24, height=24)
    s.add_light((3, 5, 4), (0.8, 0.8, 0.8))
    s.ambience = (0.2, 0.2, 0.2)
    s.add_cylinder((0, 0.3, 0), (0.2, 1, 0.1), 0.6, 1.6,
                   Material(diffuse=(0.2, 0.5, 0.7), specular=(0.4, 0.4, 0.4),
                            shininess=40, mirror=0.1))
    s.add_sphere((1.5, 0.2, -0.5), 0.5, Material(diffuse=(0.7, 0.2, 0.1)))
    s.add_plane((0, -0.6, 0), (0, 1, 0), Material(diffuse=(0.45, 0.45, 0.45)))
    s.max_depth = 2
    return s


def test_render_matches_oracle():
    s = cyl_scene()
    data = s.build()
    got = np.asarray(render(data, s.camera))
    want = OracleRenderer(data, s.camera).render()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_cylinder_casts_shadow():
    s = cyl_scene()
    img = np.asarray(render(s.build(), s.camera))
    assert img.std() > 0.05  # scene has structure (sanity)


def test_scene_grammar(tmp_path):
    p = tmp_path / "c.sce"
    p.write_text(
        "camera 0 1 5 0 0 0 0 1 0 45 16 16\n"
        "light 2 4 4 .8 .8 .8\n"
        "cylinder 0 0 0  0 1 0  0.5 2  .1 .1 .1  .6 .2 .2  .3 .3 .3  20 0\n"
    )
    from myraytracer_tpu.models.sceneio import read_scene

    s = read_scene(str(p))
    assert len(s._cylinders) == 1
    c, a, r, h, m = s._cylinders[0]
    assert r == 0.5 and h == 2.0 and m.shininess == 20
    data = s.build()
    assert data.n_cylinders == 1
