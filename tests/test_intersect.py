import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.ops import intersect as isx


def _v(*args):
    return jnp.asarray(args, jnp.float32)


class TestSphere:
    def test_head_on(self):
        t = isx.ray_sphere(_v(0, 0, 5)[None], _v(0, 0, -1)[None], _v(0, 0, 0)[None], jnp.asarray([1.0]))
        np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)

    def test_miss(self):
        t = isx.ray_sphere(_v(0, 0, 5)[None], _v(0, 1, 0)[None], _v(0, 0, 0)[None], jnp.asarray([1.0]))
        assert t[0] == isx.INF

    def test_inside_hits_far_side(self):
        t = isx.ray_sphere(_v(0, 0, 0)[None], _v(0, 0, -1)[None], _v(0, 0, 0)[None], jnp.asarray([1.0]))
        np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)

    def test_behind(self):
        t = isx.ray_sphere(_v(0, 0, 5)[None], _v(0, 0, 1)[None], _v(0, 0, 0)[None], jnp.asarray([1.0]))
        assert t[0] == isx.INF


class TestPlane:
    def test_hit(self):
        t = isx.ray_plane(_v(0, 1, 0)[None], _v(0, -1, 0)[None], _v(0, 0, 0)[None], _v(0, 1, 0)[None])
        np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)

    def test_parallel(self):
        t = isx.ray_plane(_v(0, 1, 0)[None], _v(1, 0, 0)[None], _v(0, 0, 0)[None], _v(0, 1, 0)[None])
        assert t[0] == isx.INF

    def test_behind(self):
        t = isx.ray_plane(_v(0, 1, 0)[None], _v(0, 1, 0)[None], _v(0, 0, 0)[None], _v(0, 1, 0)[None])
        assert t[0] == isx.INF


class TestTriangle:
    p0 = _v(-1, -1, 0)
    p1 = _v(1, -1, 0)
    p2 = _v(0, 1, 0)

    def test_center_hit(self):
        t, a, b = isx.ray_triangle(
            _v(0, 0, 3)[None], _v(0, 0, -1)[None],
            self.p0[None], self.p1[None], self.p2[None],
        )
        np.testing.assert_allclose(t[0], 3.0, rtol=1e-5)
        g = 1 - a[0] - b[0]
        assert 0 <= a[0] <= 1 and 0 <= b[0] <= 1 and 0 <= g <= 1

    def test_outside(self):
        t, _, _ = isx.ray_triangle(
            _v(2, 2, 3)[None], _v(0, 0, -1)[None],
            self.p0[None], self.p1[None], self.p2[None],
        )
        assert t[0] == isx.INF

    def test_degenerate(self):
        # all three corners identical -> |S| < eps -> miss, finite output
        p = _v(0, 0, 0)
        t, a, b = isx.ray_triangle(
            _v(0, 0, 3)[None], _v(0, 0, -1)[None], p[None], p[None], p[None]
        )
        assert t[0] == isx.INF
        assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()

    def test_barycentric_interpolation_point(self):
        # hit point must equal alpha*p0 + beta*p1 + gamma*p2
        o = _v(0.2, -0.3, 5)[None]
        d = _v(0, 0, -1)[None]
        t, a, b = isx.ray_triangle(o, d, self.p0[None], self.p1[None], self.p2[None])
        g = 1 - a - b
        hit = o + t[:, None] * d
        interp = a[:, None] * self.p0 + b[:, None] * self.p1 + g[:, None] * self.p2
        np.testing.assert_allclose(hit, interp, atol=1e-5)


class TestAABB:
    def test_hit_and_tmin(self):
        o = _v(0, 0, 5)[None]
        inv_d = 1.0 / _v(1e-9, 1e-9, -1)[None]
        hit, tmin = isx.ray_aabb(o, inv_d, _v(-1, -1, -1)[None], _v(1, 1, 1)[None])
        assert bool(hit[0])
        np.testing.assert_allclose(tmin[0], 4.0, rtol=1e-4)

    def test_miss(self):
        o = _v(5, 5, 5)[None]
        inv_d = 1.0 / _v(1, 1e-9, 1e-9)[None]
        hit, _ = isx.ray_aabb(o, inv_d, _v(-1, -1, -1)[None], _v(1, 1, 1)[None])
        assert not bool(hit[0])

    def test_axis_aligned_zero_component(self):
        # direction exactly zero on two axes: IEEE infs must behave
        o = _v(0, 0, 5)[None]
        d = _v(0, 0, -1)
        inv_d = (1.0 / d)[None]
        hit, tmin = isx.ray_aabb(o, inv_d, _v(-1, -1, -1)[None], _v(1, 1, 1)[None])
        assert bool(hit[0])
        np.testing.assert_allclose(tmin[0], 4.0, rtol=1e-4)

    def test_origin_inside(self):
        o = _v(0, 0, 0)[None]
        inv_d = 1.0 / _v(0.0, 0.0, 1.0)[None]
        hit, _ = isx.ray_aabb(o, inv_d, _v(-1, -1, -1)[None], _v(1, 1, 1)[None])
        assert bool(hit[0])
