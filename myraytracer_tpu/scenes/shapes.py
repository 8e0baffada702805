"""Procedural triangle-mesh primitives for scene authoring.

The reference repo ships no scene assets (SURVEY.md scope warning): the
.off/.obj meshes behind the 10 golden images are absent. These generators
author stand-in geometry for those scenes — boxes, spheres, tori,
cylinders, extruded profiles — all returning (vertices [V,3] float32,
faces [T,3] int32) ready for TriangleMesh.
"""

from __future__ import annotations

import numpy as np


def uv_sphere(radius: float, n_lat: int, n_lon: int, center=(0, 0, 0)):
    """Latitude/longitude sphere mesh."""
    cx, cy, cz = center
    verts = []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append([
                cx + radius * np.sin(theta) * np.cos(phi),
                cy + radius * np.cos(theta),
                cz + radius * np.sin(theta) * np.sin(phi),
            ])
    verts = np.asarray(verts, np.float32)

    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            if i > 0:
                faces.append([a, b, c])
            if i < n_lat - 1:
                faces.append([b, d, c])
    return verts, np.asarray(faces, np.int32)


def box(size=(1, 1, 1), center=(0, 0, 0)):
    """Axis-aligned box, 12 triangles, outward normals."""
    sx, sy, sz = (s / 2 for s in size)
    cx, cy, cz = center
    v = np.asarray(
        [
            [-sx, -sy, -sz], [sx, -sy, -sz], [sx, sy, -sz], [-sx, sy, -sz],
            [-sx, -sy, sz], [sx, -sy, sz], [sx, sy, sz], [-sx, sy, sz],
        ],
        np.float32,
    ) + np.float32([cx, cy, cz])
    f = np.asarray(
        [
            [0, 2, 1], [0, 3, 2],      # -z
            [4, 5, 6], [4, 6, 7],      # +z
            [0, 1, 5], [0, 5, 4],      # -y
            [3, 7, 6], [3, 6, 2],      # +y
            [0, 4, 7], [0, 7, 3],      # -x
            [1, 2, 6], [1, 6, 5],      # +x
        ],
        np.int32,
    )
    return v, f


def quad(p0, p1, p2, p3):
    """Two triangles spanning the (planar) quad p0-p1-p2-p3 (CCW)."""
    v = np.asarray([p0, p1, p2, p3], np.float32)
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def torus(major: float, minor: float, n_major: int, n_minor: int, center=(0, 0, 0)):
    """Torus in the xz-plane (axis = y)."""
    cx, cy, cz = center
    verts = []
    for i in range(n_major):
        a = 2 * np.pi * i / n_major
        ca, sa = np.cos(a), np.sin(a)
        for j in range(n_minor):
            b = 2 * np.pi * j / n_minor
            r = major + minor * np.cos(b)
            verts.append([cx + r * ca, cy + minor * np.sin(b), cz + r * sa])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_major):
        for j in range(n_minor):
            a = i * n_minor + j
            b = i * n_minor + (j + 1) % n_minor
            c = ((i + 1) % n_major) * n_minor + j
            d = ((i + 1) % n_major) * n_minor + (j + 1) % n_minor
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts, np.asarray(faces, np.int32)


def cylinder(radius: float, height: float, n_seg: int, center=(0, 0, 0), capped=True):
    """Y-axis cylinder with optional caps."""
    cx, cy, cz = center
    verts = []
    for sign in (-0.5, 0.5):
        y = cy + sign * height
        for j in range(n_seg):
            a = 2 * np.pi * j / n_seg
            verts.append([cx + radius * np.cos(a), y, cz + radius * np.sin(a)])
    bot_c = len(verts)
    verts.append([cx, cy - height / 2, cz])
    top_c = len(verts)
    verts.append([cx, cy + height / 2, cz])
    verts = np.asarray(verts, np.float32)

    faces = []
    for j in range(n_seg):
        a = j
        b = (j + 1) % n_seg
        c = n_seg + j
        d = n_seg + (j + 1) % n_seg
        faces.append([a, c, b])
        faces.append([b, c, d])
        if capped:
            faces.append([a, b, bot_c])
            faces.append([c, d, top_c][::-1])
    return verts, np.asarray(faces, np.int32)


def merge(*meshes):
    """Concatenate (verts, faces) pairs with index rebasing."""
    vs, fs = [], []
    base = 0
    for v, f in meshes:
        vs.append(v)
        fs.append(f + base)
        base += v.shape[0]
    return np.concatenate(vs), np.concatenate(fs)


def transformed(v, scale=1.0, rotate_y: float = 0.0, translate=(0, 0, 0)):
    """Uniform scale -> y-rotation (radians) -> translate."""
    out = np.asarray(v, np.float32) * scale
    if rotate_y:
        c, s = np.cos(rotate_y), np.sin(rotate_y)
        rot = np.float32([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        out = out @ rot.T
    return out + np.float32(translate)


def checkerboard(n: int = 8, size: int = 64, c0=(0.9, 0.9, 0.9), c1=(0.1, 0.1, 0.4)):
    """Checkerboard texture [size, size, 3]."""
    y, x = np.mgrid[0:size, 0:size]
    cell = ((x * n // size) + (y * n // size)) % 2
    tex = np.where(cell[..., None] == 0, np.float32(c0), np.float32(c1))
    return tex.astype(np.float32)


def plane_uv_quad(p0, p1, p2, p3):
    """Quad with UVs mapping the full texture once."""
    v, f = quad(p0, p1, p2, p3)
    uvi = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    u = np.asarray([0, 1, 1, 0], np.float32)
    vv = np.asarray([0, 0, 1, 1], np.float32)
    return v, f, uvi, u, vv
