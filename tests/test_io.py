"""OBJ/OFF mesh IO + scene-file grammar round trips."""

import os
import textwrap

import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, FLAT, PHONG
from myraytracer_tpu.models.objio import read_mesh, read_obj, read_off, write_obj
from myraytracer_tpu.models.sceneio import read_scene, write_scene, SceneParseError
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.scenes.shapes import uv_sphere


OBJ_SIMPLE = """\
# a quad with uvs
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
mtllib ignored.mtl
usemtl ignored
f 1/1 2/2 3/3 4/4
"""

OFF_TETRA = """\
OFF
4 4 0
0 0 0
1 0 0
0 1 0
0 0 1
3 0 2 1
3 0 1 3
3 0 3 2
3 1 2 3
"""


class TestObj:
    def test_quad_fan_triangulated(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(OBJ_SIMPLE)
        m = read_obj(str(p))
        assert m.n_vertices == 4
        assert m.n_triangles == 2  # quad -> 2 tris
        assert m.uv_indices.shape == (2, 3)
        np.testing.assert_allclose(m.u_coords, [0, 1, 1, 0])

    def test_negative_indices(self, tmp_path):
        p = tmp_path / "neg.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        m = read_obj(str(p))
        assert m.triangles.tolist() == [[0, 1, 2]]

    def test_slash_forms(self, tmp_path):
        p = tmp_path / "forms.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n")
        m = read_obj(str(p))
        assert m.n_triangles == 1

    def test_roundtrip(self, tmp_path):
        v, f = uv_sphere(1.0, 4, 6)
        mesh = TriangleMesh(v, f)
        p = tmp_path / "s.obj"
        write_obj(str(p), mesh)
        back = read_obj(str(p))
        assert back.n_vertices == mesh.n_vertices
        assert back.n_triangles == mesh.n_triangles
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)


class TestOff:
    def test_tetra(self, tmp_path):
        p = tmp_path / "t.off"
        p.write_text(OFF_TETRA)
        m = read_off(str(p))
        assert m.n_vertices == 4 and m.n_triangles == 4

    def test_dispatch(self, tmp_path):
        p = tmp_path / "t.off"
        p.write_text(OFF_TETRA)
        assert read_mesh(str(p)).n_triangles == 4


class TestSceneFile:
    def test_full_grammar(self, tmp_path):
        obj = tmp_path / "tri.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        sce = tmp_path / "scene.sce"
        sce.write_text(textwrap.dedent("""\
            # test scene
            camera 0 1 5  0 0 0  0 1 0  45 64 48
            light 2 4 4  0.8 0.8 0.8
            light -2 4 4  0.2 0.2 0.2
            background 0 0 0.05
            ambience 0.2 0.2 0.2
            depth 3
            sphere 0 0 0 1  0.2 0 0  0.7 0 0  0.5 0.5 0.5  30 0.3
            plane 0 -1 0  0 1 0  0.1 0.1 0.1  0.5 0.5 0.5  0 0 0  5 0 0
            mesh tri.obj FLAT
        """))
        s = read_scene(str(sce))
        assert s.camera.width == 64 and s.camera.height == 48
        assert len(s.lights) == 2
        assert s.max_depth == 3
        assert len(s._spheres) == 1 and len(s._planes) == 1
        assert len(s.meshes) == 1 and s.meshes[0].draw_mode == FLAT
        c, r, m = s._spheres[0]
        assert r == 1.0 and m.mirror == 0.3 and m.shininess == 30
        _, _, pm = s._planes[0]
        assert pm.shadowable is False  # trailing 0 flag
        data = s.build()  # scene must pack
        assert data.n_tris == 1

    def test_unknown_directive(self, tmp_path):
        p = tmp_path / "bad.sce"
        p.write_text("bogus 1 2 3\n")
        with pytest.raises(SceneParseError):
            read_scene(str(p))

    def test_bad_draw_mode(self, tmp_path):
        obj = tmp_path / "t.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        p = tmp_path / "bad.sce"
        p.write_text("mesh t.obj GOURAUD\n")
        with pytest.raises(SceneParseError):
            read_scene(str(p))

    def test_write_read_roundtrip(self, tmp_path):
        s = Scene()
        s.set_camera(eye=(0, 1, 5), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45, width=32, height=32)
        s.add_light((1, 2, 3), (0.5, 0.6, 0.7))
        s.background = (0.1, 0.0, 0.0)
        s.max_depth = 4
        s.add_sphere((1, 2, 3), 0.5, Material(mirror=0.25, shininess=12))
        s.add_plane((0, -1, 0), (0, 1, 0), Material(shadowable=False))
        p = tmp_path / "rt.sce"
        write_scene(str(p), s)
        back = read_scene(str(p))
        assert back.max_depth == 4
        assert back.camera.width == 32
        c, r, m = back._spheres[0]
        assert r == 0.5 and m.mirror == 0.25
        _, _, pm = back._planes[0]
        assert pm.shadowable is False
