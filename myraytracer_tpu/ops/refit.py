"""Device-side acceleration-structure refit for optimized geometry.

The reference builds its BVH bounds exactly once, at init, because its
geometry never moves (mybvh.cpp:44 ``BVH::init``, :375 ``initSoA`` — both
called only from scene setup). This framework made ``vertex_pos`` a
differentiable, *optimizable* scene leaf (inverse rendering), so bounds
built from the initial vertices stop being conservative the moment an
optimizer moves geometry — culling would silently drop true hits.

:func:`refit_accel` recomputes every BVH node box and every cluster AABB
from the CURRENT ``vertex_pos`` as one dense, jit-friendly pass:

  1. per-triangle AABBs from the (leaf-ordered) corner gathers;
  2. a sparse table (power-of-two window mins/maxes, ``log2 T`` shifted
     elementwise passes — no scatters, no segment ops, nothing serial);
  3. any node's range ``[lo, hi)`` then reduces to TWO overlapping
     window lookups ``min(tab[j][lo], tab[j][hi - 2^j])`` with
     ``j = floor(log2(hi-lo))`` — one 2-key gather per node/cluster.

Every output is wrapped in ``stop_gradient`` (bounds are traversal
topology; traversal is non-differentiable by design). For unchanged
vertices the refit bounds equal the build-time bounds bit-for-bit:
min/max are exact in fp, so association order does not matter
(tests/test_refit.py pins this).

Tree *structure* (threaded links, cluster cut, leaf order) is NOT
rebuilt: it stays a valid — merely less optimal — hierarchy for any
vertex positions, and the front-to-back visit keys are re-derived from
the refit bounds at trace time, so correctness never depends on it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _range_tables(tmin: jnp.ndarray, tmax: jnp.ndarray):
    """Sparse min/max tables over windows of length 2^j.

    Returns ([J*T, 3] min table, [J*T, 3] max table, J): row j*T + i
    holds the reduction of rows [i, i + 2^j) (clamped at T).
    """
    T = tmin.shape[0]
    J = max(1, T.bit_length())  # floor(log2(T)) + 1 levels
    mins = [tmin]
    maxs = [tmax]
    for j in range(1, J):
        h = 1 << (j - 1)
        pm, px = mins[-1], maxs[-1]
        if h < T:
            inf = jnp.full((h, 3), jnp.inf, pm.dtype)
            mins.append(jnp.minimum(pm, jnp.concatenate([pm[h:], inf])))
            maxs.append(jnp.maximum(px, jnp.concatenate([px[h:], -inf])))
        else:
            mins.append(pm)
            maxs.append(px)
    return (jnp.concatenate(mins, axis=0), jnp.concatenate(maxs, axis=0), J)


def _range_bounds(tab_min, tab_max, T: int, lo, hi):
    """AABBs of contiguous triangle ranges [lo, hi) via the sparse table."""
    length = jnp.maximum(hi - lo, 1)
    j = 31 - jax.lax.clz(length)                 # floor(log2(length))
    win = jnp.left_shift(jnp.int32(1), j)
    ia = j * T + lo
    ib = j * T + jnp.maximum(hi - win, 0)
    bmin = jnp.minimum(tab_min[ia], tab_min[ib])
    bmax = jnp.maximum(tab_max[ia], tab_max[ib])
    return bmin, bmax


def refit_accel(scene):
    """Recompute BVH node boxes + cluster AABBs from current vertex_pos.

    Jittable; returns a SceneData with ``bvh_bbmin/bbmax``, the packed
    node mirror, and ``cl_bbmin/bbmax`` refit. No-op for scenes without
    triangles. Call after replacing ``vertex_pos`` (InverseRenderer and
    the sharded train step do this automatically every step).
    """
    if scene.n_tris == 0:
        return scene
    vp = jax.lax.stop_gradient(scene.vertex_pos)
    tv = scene.tri_vidx
    p0, p1, p2 = vp[tv[:, 0]], vp[tv[:, 1]], vp[tv[:, 2]]
    tmin = jnp.minimum(jnp.minimum(p0, p1), p2)
    tmax = jnp.maximum(jnp.maximum(p0, p1), p2)

    T = scene.n_tris
    tab_min, tab_max, _ = _range_tables(tmin, tmax)

    nbmin, nbmax = _range_bounds(tab_min, tab_max, T, scene.bvh_lo,
                                 scene.bvh_hi)
    cbmin, cbmax = _range_bounds(tab_min, tab_max, T, scene.cl_first,
                                 scene.cl_first + scene.cl_count)

    nodes_packed = jnp.concatenate(
        [nbmin, nbmax, scene.bvh_nodes_packed[:, 6:8]], axis=1)
    sg = jax.lax.stop_gradient
    return dataclasses.replace(
        scene,
        bvh_bbmin=sg(nbmin), bvh_bbmax=sg(nbmax),
        bvh_nodes_packed=sg(nodes_packed),
        cl_bbmin=sg(cbmin), cl_bbmax=sg(cbmax),
    )
