"""Pallas traversal design study agrees with the XLA threaded-BVH walk.

The kernel under test lives in tools/studies/ (interpret-mode only — it
does not compile via Mosaic on real TPUs; see its module docstring). The
test runs in interpret mode on the CPU backend and exists to keep the
recorded negative result honest.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "studies"))

from myraytracer_tpu.ops import traverse
from pallas_traverse import (
    PALLAS_OK, traverse_bvh_pallas, scene_fits_vmem,
)
from test_bvh import random_tris, _scene_with_tris

needs_pallas = pytest.mark.skipif(not PALLAS_OK, reason="no pallas")


@needs_pallas
def test_matches_xla_traversal():
    rng = np.random.default_rng(11)
    tri = random_tris(300, rng)
    scene = _scene_with_tris(tri)
    assert scene_fits_vmem(scene)

    R = 700  # not a multiple of the ray tile: exercises padding
    o = rng.uniform(-20, 20, size=(R, 3)).astype(np.float32)
    target = rng.uniform(-10, 10, size=(R, 3)).astype(np.float32)
    d = target - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    want = traverse.traverse_bvh(scene, jnp.asarray(o), jnp.asarray(d))
    got = traverse_bvh_pallas(scene, jnp.asarray(o), jnp.asarray(d),
                              interpret=True)

    np.testing.assert_array_equal(np.asarray(got.idx) >= 0,
                                  np.asarray(want.idx) >= 0)
    both = np.asarray(want.idx) >= 0
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(want.t)[both], rtol=1e-5)


@needs_pallas
def test_any_hit_and_active_mask():
    rng = np.random.default_rng(12)
    tri = random_tris(64, rng)
    scene = _scene_with_tris(tri)
    R = 128
    o = rng.uniform(-20, 20, size=(R, 3)).astype(np.float32)
    d = -o / np.linalg.norm(o, axis=1, keepdims=True)
    d = d.astype(np.float32)

    closest = traverse.traverse_bvh(scene, jnp.asarray(o), jnp.asarray(d))
    hit_mask = np.asarray(closest.idx) >= 0
    t_ref = np.asarray(closest.t)

    below = traverse_bvh_pallas(
        scene, jnp.asarray(o), jnp.asarray(d),
        t_max=jnp.asarray(np.where(hit_mask, t_ref * 0.999, 1e30)),
        any_hit=True, interpret=True,
    )
    assert (np.asarray(below.idx)[hit_mask] == -1).all()

    active = jnp.zeros((R,), bool)
    none = traverse_bvh_pallas(scene, jnp.asarray(o), jnp.asarray(d),
                               active=active, interpret=True)
    assert (np.asarray(none.idx) == -1).all()
