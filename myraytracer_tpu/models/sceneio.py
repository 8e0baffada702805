"""Text scene-file reader/writer.

The reference's ``read_scene`` lives in the missing course framework;
only two tokens are visible in the repo: ``#`` comments and
``mesh <file> <FLAT|PHONG>`` with paths resolved relative to the scene
file (mytracer.cpp:330-347). The Raytracer members prove the grammar also
carries camera, lights, background, ambience, recursion depth, planes and
spheres (mytracer.cpp:27-36, 88, 111-112, 143-145; SURVEY.md §1.1), so
this module re-derives a complete grammar:

    # comment
    camera  ex ey ez  cx cy cz  ux uy uz  fovy  width height
    light   px py pz  r g b                      (repeatable)
    background r g b
    ambience   r g b
    depth      n
    plane    cx cy cz  nx ny nz  <material>
    sphere   cx cy cz  radius    <material>
    cylinder cx cy cz  ax ay az  radius height  <material>
    mesh     <relpath.obj|.off>  FLAT|PHONG  [texture.png]

    <material> = ar ag ab  dr dg db  sr sg sb  shininess mirror [shadow01]

Values are whitespace-separated; a directive may span lines.
"""

from __future__ import annotations

import os
from typing import List

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import FLAT, PHONG
from myraytracer_tpu.models.objio import read_mesh
from myraytracer_tpu.models.scene import Scene


class SceneParseError(ValueError):
    pass


def read_scene(path: str) -> Scene:
    """Parse a scene file into a host Scene (meshes loaded from disk)."""
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        raw_lines = f.readlines()

    # strip comments, flatten into a token stream
    tokens: List[str] = []
    for line in raw_lines:
        line = line.split("#", 1)[0]
        tokens.extend(line.split())

    scene = Scene()
    i = 0

    def take(n: int) -> List[str]:
        nonlocal i
        if i + n > len(tokens):
            raise SceneParseError(f"{path}: unexpected end of file")
        out = tokens[i : i + n]
        i += n
        return out

    def floats(n: int):
        return [float(t) for t in take(n)]

    def material() -> Material:
        nonlocal i
        vals = floats(11)
        shadow = True
        # optional trailing shadow flag (0/1)
        if i < len(tokens):
            try:
                peek = float(tokens[i])
                if tokens[i] in ("0", "1") and _next_is_directive(i + 1):
                    shadow = bool(int(peek))
                    i += 1
            except ValueError:
                pass
        return Material(
            ambient=tuple(vals[0:3]), diffuse=tuple(vals[3:6]),
            specular=tuple(vals[6:9]), shininess=vals[9], mirror=vals[10],
            shadowable=shadow,
        )

    def _next_is_directive(j: int) -> bool:
        return j >= len(tokens) or tokens[j] in DIRECTIVES

    DIRECTIVES = {"camera", "light", "background", "ambience", "depth",
                  "plane", "sphere", "cylinder", "mesh"}

    while i < len(tokens):
        tok = tokens[i]
        i += 1
        if tok == "camera":
            v = floats(12)
            scene.set_camera(eye=v[0:3], center=v[3:6], up=v[6:9],
                             fovy=v[9], width=int(v[10]), height=int(v[11]))
        elif tok == "light":
            v = floats(6)
            scene.add_light(v[0:3], v[3:6])
        elif tok == "background":
            scene.background = tuple(floats(3))
        elif tok == "ambience":
            scene.ambience = tuple(floats(3))
        elif tok == "depth":
            scene.max_depth = int(float(take(1)[0]))
        elif tok == "plane":
            v = floats(6)
            scene.add_plane(v[0:3], v[3:6], material())
        elif tok == "sphere":
            v = floats(4)
            scene.add_sphere(v[0:3], v[3], material())
        elif tok == "cylinder":
            v = floats(8)
            scene.add_cylinder(v[0:3], v[3:6], v[6], v[7], material())
        elif tok == "mesh":
            fn, mode = take(2)
            mode_i = {"FLAT": FLAT, "PHONG": PHONG}.get(mode)
            if mode_i is None:
                raise SceneParseError(f"{path}: bad draw mode {mode!r}")
            texture = None
            if i < len(tokens) and tokens[i] not in DIRECTIVES:
                tex_path = os.path.join(base, take(1)[0])
                from myraytracer_tpu.utils.image import read_png
                texture = read_png(tex_path)
            mesh_path = os.path.join(base, fn)
            scene.add_mesh(read_mesh(mesh_path, draw_mode=mode_i, texture=texture))
        else:
            raise SceneParseError(f"{path}: unknown directive {tok!r}")
    return scene


def write_scene(path: str, scene: Scene, mesh_files=None) -> None:
    """Write analytic scene content to a scene file (meshes by reference:
    ``mesh_files`` is a list of (relpath, mode_str) already on disk)."""

    def mat(m: Material) -> str:
        return (" ".join(f"{x:g}" for x in (*m.ambient, *m.diffuse, *m.specular))
                + f" {m.shininess:g} {m.mirror:g} {1 if m.shadowable else 0}")

    cam = scene.camera
    with open(path, "w") as f:
        f.write("# myraytracer_tpu scene\n")
        e = [float(x) for x in cam.eye]
        c = [float(x) for x in cam.center]
        u = [float(x) for x in cam.up]
        f.write("camera " + " ".join(f"{x:g}" for x in (*e, *c, *u))
                + f" {float(cam.fovy):g} {cam.width} {cam.height}\n")
        f.write("background " + " ".join(f"{x:g}" for x in scene.background) + "\n")
        f.write("ambience " + " ".join(f"{x:g}" for x in scene.ambience) + "\n")
        f.write(f"depth {scene.max_depth}\n")
        for l in scene.lights:
            f.write("light " + " ".join(f"{x:g}" for x in (*l.position, *l.color)) + "\n")
        for c_, r, m in scene._spheres:
            f.write(f"sphere {c_[0]:g} {c_[1]:g} {c_[2]:g} {r:g} " + mat(m) + "\n")
        for c_, n, m in scene._planes:
            f.write(f"plane {c_[0]:g} {c_[1]:g} {c_[2]:g} "
                    f"{n[0]:g} {n[1]:g} {n[2]:g} " + mat(m) + "\n")
        for c_, a, r, h, m in scene._cylinders:
            f.write(f"cylinder {c_[0]:g} {c_[1]:g} {c_[2]:g} "
                    f"{a[0]:g} {a[1]:g} {a[2]:g} {r:g} {h:g} " + mat(m) + "\n")
        for fn, mode in (mesh_files or []):
            f.write(f"mesh {fn} {mode}\n")
