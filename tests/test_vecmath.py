import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.utils import vecmath as vm


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_dot_cross_norm(rng):
    a = rng.normal(size=(17, 3)).astype(np.float32)
    b = rng.normal(size=(17, 3)).astype(np.float32)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vm.norm(a), np.linalg.norm(a, axis=-1), rtol=1e-5)


def test_normalize_unit_and_zero(rng):
    a = rng.normal(size=(9, 3)).astype(np.float32)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.norm(n), np.ones(9), rtol=1e-5)
    z = vm.normalize(jnp.zeros((2, 3)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_reflect_mirror_identities(rng):
    d = np.asarray(vm.normalize(rng.normal(size=(11, 3)).astype(np.float32)))
    n = np.asarray(vm.normalize(rng.normal(size=(11, 3)).astype(np.float32)))
    r = np.asarray(vm.reflect(d, n))
    # reflection preserves length and flips the normal component
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.sum(r * n, -1), -np.sum(d * n, -1), rtol=1e-4, atol=1e-5
    )
    # mirror(l, n) + l is parallel to n
    m = np.asarray(vm.mirror(d, n))
    s = m + d
    c = np.cross(s, n)
    np.testing.assert_allclose(c, 0.0, atol=1e-5)


def test_det3_vs_numpy(rng):
    c1 = rng.normal(size=(7, 3)).astype(np.float32)
    c2 = rng.normal(size=(7, 3)).astype(np.float32)
    c3 = rng.normal(size=(7, 3)).astype(np.float32)
    expect = np.linalg.det(np.stack([c1, c2, c3], axis=-1))
    np.testing.assert_allclose(vm.det3(c1, c2, c3), expect, rtol=1e-4, atol=1e-5)
