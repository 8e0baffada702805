"""Wavefront OBJ and OFF mesh readers.

OBJ token set matches what the reference consumes (pre_read_obj,
mytracer.cpp:454-487): ``v``, ``vt``, ``vn``, ``f``; ``mtllib`` /
``usemtl`` are deliberately ignored ("too expensive to read the file for
Raytracer!", mytracer.cpp:473). Improvements over the reference:
faces with more than 3 vertices are fan-triangulated instead of assumed
triangular, and ``v/vt/vn`` index syntax (including negative indices) is
handled.

OFF is the other format course meshes ship in; supported for parity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, PHONG


def read_obj(
    path: str,
    material: Optional[Material] = None,
    draw_mode: int = PHONG,
    texture: Optional[np.ndarray] = None,
) -> TriangleMesh:
    """Parse an OBJ file into a TriangleMesh."""
    verts, uvs_u, uvs_v = [], [], []
    faces, uv_faces = [], []
    has_uv_idx = False

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs_u.append(float(parts[1]))
                uvs_v.append(float(parts[2]) if len(parts) > 2 else 0.0)
            elif tag == "f":
                corners = []
                uv_corners = []
                for tok in parts[1:]:
                    comps = tok.split("/")
                    vi = int(comps[0])
                    vi = vi - 1 if vi > 0 else len(verts) + vi
                    corners.append(vi)
                    if len(comps) > 1 and comps[1]:
                        ti = int(comps[1])
                        uv_corners.append(ti - 1 if ti > 0 else len(uvs_u) + ti)
                    else:
                        uv_corners.append(0)
                # fan-triangulate
                for k in range(1, len(corners) - 1):
                    faces.append([corners[0], corners[k], corners[k + 1]])
                    uv_faces.append([uv_corners[0], uv_corners[k], uv_corners[k + 1]])
                    if any(uv_corners):
                        has_uv_idx = True
            # vn / mtllib / usemtl / o / g / s: ignored (parity)

    v = np.asarray(verts, np.float32)
    fc = np.asarray(faces, np.int32)
    kwargs = {}
    if uvs_u and has_uv_idx:
        kwargs.update(
            uv_indices=np.asarray(uv_faces, np.int32),
            u_coords=np.asarray(uvs_u, np.float32),
            v_coords=np.asarray(uvs_v, np.float32),
            texture=texture,
        )
    return TriangleMesh(v, fc, material=material or Material(),
                        draw_mode=draw_mode, **kwargs)


def read_off(
    path: str,
    material: Optional[Material] = None,
    draw_mode: int = PHONG,
) -> TriangleMesh:
    """Parse an OFF file (header 'OFF', counts line, verts, faces)."""
    with open(path) as f:
        tokens = []
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                tokens.extend(line.split())
    if tokens[0] != "OFF":
        raise ValueError(f"{path}: not an OFF file")
    nv, nf = int(tokens[1]), int(tokens[2])
    pos = 4
    verts = np.asarray(tokens[pos : pos + 3 * nv], np.float32).reshape(nv, 3)
    pos += 3 * nv
    faces = []
    for _ in range(nf):
        k = int(tokens[pos])
        idx = [int(t) for t in tokens[pos + 1 : pos + 1 + k]]
        pos += 1 + k
        for j in range(1, k - 1):
            faces.append([idx[0], idx[j], idx[j + 1]])
    return TriangleMesh(verts, np.asarray(faces, np.int32),
                        material=material or Material(), draw_mode=draw_mode)


def read_mesh(path: str, **kwargs) -> TriangleMesh:
    """Dispatch by extension (.obj / .off)."""
    lower = path.lower()
    if lower.endswith(".off"):
        kwargs.pop("texture", None)
        return read_off(path, **kwargs)
    return read_obj(path, **kwargs)


def write_obj(path: str, mesh: TriangleMesh) -> None:
    """Write a TriangleMesh to OBJ (vertices + faces [+ uv])."""
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if mesh.has_texture or mesh.u_coords is not None:
            for u, vv in zip(mesh.u_coords, mesh.v_coords):
                f.write(f"vt {u} {vv}\n")
            for tri, uvt in zip(mesh.triangles, mesh.uv_indices):
                f.write(
                    f"f {tri[0]+1}/{uvt[0]+1} {tri[1]+1}/{uvt[1]+1} {tri[2]+1}/{uvt[2]+1}\n"
                )
        else:
            for tri in mesh.triangles:
                f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
