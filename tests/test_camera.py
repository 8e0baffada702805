"""Pinhole camera: ray geometry invariants."""

import math

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.models.camera import Camera


def make(w=100, h=50, fovy=60.0):
    return Camera.make(eye=(1, 2, 8), center=(1, 2, 0), up=(0, 1, 0),
                       fovy=fovy, width=w, height=h)


def test_center_ray_points_at_lookat():
    cam = make()
    # image center lies between pixels; average the 4 center pixels
    xs = jnp.asarray([49.5])
    ys = jnp.asarray([24.5])
    o, d = cam.primary_rays(xs, ys)
    np.testing.assert_allclose(np.asarray(o[0]), [1, 2, 8], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)


def test_directions_normalized():
    cam = make()
    xs, ys = cam.pixel_grid()
    o, d = cam.primary_rays(xs.ravel(), ys.ravel())
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)


def test_vertical_fov():
    cam = make(w=100, h=100, fovy=90.0)
    # rays through the extreme top/bottom pixel centers: the half-angle
    # between them and the view axis approaches fovy/2 as H grows
    o, d = cam.primary_rays(jnp.asarray([49.5, 49.5]), jnp.asarray([-0.5, 99.5]))
    d = np.asarray(d)
    view = np.float32([0, 0, -1])
    ang_top = math.degrees(math.acos(float(d[0] @ view)))
    ang_bot = math.degrees(math.acos(float(d[1] @ view)))
    np.testing.assert_allclose(ang_top, 45.0, atol=0.5)
    np.testing.assert_allclose(ang_bot, 45.0, atol=0.5)


def test_y_down_and_x_right():
    cam = make()
    o, d = cam.primary_rays(jnp.asarray([0.0, 99.0, 49.5, 49.5]),
                            jnp.asarray([24.5, 24.5, 0.0, 49.0]))
    d = np.asarray(d)
    assert d[0][0] < 0 and d[1][0] > 0      # left pixel -> -x, right -> +x
    assert d[2][1] > 0 and d[3][1] < 0      # top pixel -> +y (world up)


def test_fractional_supersampling_offsets():
    cam = make()
    # offsets within [-0.5, 0.5] around a pixel stay inside that pixel's cone
    o, d0 = cam.primary_rays(jnp.asarray([10.0]), jnp.asarray([10.0]))
    _, dm = cam.primary_rays(jnp.asarray([9.5]), jnp.asarray([10.0]))
    _, dp = cam.primary_rays(jnp.asarray([10.5]), jnp.asarray([10.0]))
    _, d_next = cam.primary_rays(jnp.asarray([11.0]), jnp.asarray([10.0]))
    x0, xm, xp, xn = (float(np.asarray(v)[0, 0]) for v in (d0, dm, dp, d_next))
    assert xm < x0 < xp <= xn
