"""Procedural shape generators: outward winding + watertight-ish checks."""

import numpy as np
import pytest

from myraytracer_tpu.scenes import shapes


def face_normals(v, f):
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(ln, 1e-12), (p0 + p1 + p2) / 3


def test_sphere_outward():
    v, f = shapes.uv_sphere(1.0, 8, 12)
    n, c = face_normals(v, f)
    assert (np.sum(n * c, axis=1) > 0).all()


def test_box_outward():
    v, f = shapes.box((1, 2, 3))
    n, c = face_normals(v, f)
    assert (np.sum(n * c, axis=1) > 0).all()


def test_torus_outward():
    v, f = shapes.torus(1.0, 0.3, 16, 8)
    n, c = face_normals(v, f)
    # outward = away from the tube's center circle
    ring = c.copy()
    ring[:, 1] = 0
    ring = ring / np.linalg.norm(ring, axis=1, keepdims=True)
    tube_out = c - ring * 1.0
    assert (np.sum(n * tube_out, axis=1) > 0).all()


def test_cylinder_outward():
    v, f = shapes.cylinder(0.5, 2.0, 16)
    n, c = face_normals(v, f)
    # side faces: outward = away from the y axis; caps: away from origin in y
    side = np.abs(n[:, 1]) < 0.9
    radial = c.copy()
    radial[:, 1] = 0
    assert (np.sum(n[side] * radial[side], axis=1) > 0).all()
    caps = ~side
    assert (n[caps, 1] * np.sign(c[caps, 1]) > 0).all()


def test_merge_rebases():
    v1, f1 = shapes.box()
    v2, f2 = shapes.uv_sphere(1, 4, 6)
    v, f = shapes.merge((v1, f1), (v2, f2))
    assert v.shape[0] == v1.shape[0] + v2.shape[0]
    assert f.max() == v.shape[0] - 1
    assert f.min() == 0


def test_transformed():
    v, _ = shapes.box()
    out = shapes.transformed(v, scale=2.0, rotate_y=np.pi / 2, translate=(1, 0, 0))
    assert out.shape == v.shape
    np.testing.assert_allclose(np.abs(out - [1, 0, 0]).max(), 1.0, rtol=1e-5)
