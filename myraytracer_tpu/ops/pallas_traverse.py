"""Pallas TPU traversal kernel (experimental fast path).

Same threaded-BVH walk as ops/traverse.py, but as a Pallas kernel with
the whole acceleration structure resident in VMEM:

  * node records [N, 8], links [8N, 2] and packed triangles [T, 16] are
    mapped fully into VMEM (office-class scenes: a few MB — they fit);
    every traversal gather then hits on-chip memory instead of HBM,
    which is the entire cost of the XLA path;
  * the grid runs over ray tiles; each program instance advances its
    [RT] rays in lock-step with a fori_loop bounded by a precomputed
    step cap (while_loop's dynamic trip count costs scheduling on TPU);
  * gathers use jnp.take along axis 0 inside the kernel (Mosaic lowers
    VMEM gathers for these shapes).

Falls back transparently: ops/tracer.py uses this only when
TraceConfig(use_pallas=True) and the scene fits the VMEM budget;
correctness is pinned to the XLA path by tests/test_pallas.py (interpret
mode on CPU, compiled on TPU).

Triangles are padded to 16 floats per row (v0,v1,v2,pad) to keep rows
lane-aligned.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops.traverse import TriHit

try:  # pallas import kept lazy-safe for environments without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

#: rays per program instance
RAY_TILE = 512

#: VMEM budget for scene residency (bytes) — beyond this, use the XLA path
VMEM_SCENE_BUDGET = 10 * 1024 * 1024


def scene_fits_vmem(scene) -> bool:
    n_bytes = (
        scene.bvh_nodes_packed.size * 4
        + scene.bvh_links_packed.size * 4
        + scene.n_tris * 16 * 4
    )
    return n_bytes <= VMEM_SCENE_BUDGET


def _pack_tris16(scene) -> jnp.ndarray:
    """[T, 16] lane-padded packed triangle corners (stop-gradient)."""
    vp = jax.lax.stop_gradient(scene.vertex_pos)
    tv = scene.tri_vidx
    p = jnp.concatenate([vp[tv[:, 0]], vp[tv[:, 1]], vp[tv[:, 2]]], axis=1)
    return jnp.pad(p, ((0, 0), (0, 7)))


def _kernel(o_ref, d_ref, t0_ref, act_ref, nodes_ref, links_ref, tris_ref,
            t_out, idx_out, *, n_nodes: int, max_leaf: int, max_steps: int,
            any_hit: bool):
    o = o_ref[:]          # [RT, 3]
    d = d_ref[:]
    t0 = t0_ref[:]        # [RT]
    act = act_ref[:]      # [RT] int32 1/0

    nodes = nodes_ref[:]  # [N, 8]
    links = links_ref[:]  # [8N, 2]
    tris = tris_ref[:]    # [T, 16]

    inv_d = 1.0 / d
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    link_base = octant * n_nodes

    RT = o.shape[0]
    ptr0 = jnp.where(act > 0, 0, -1).astype(jnp.int32)

    def one_step(state):
        ptr, t_best, idx = state
        alive = ptr >= 0
        p = jnp.maximum(ptr, 0)

        row = jnp.take(nodes, p, axis=0)               # [RT, 8]
        node_min = row[:, 0:3]
        node_max = row[:, 3:6]
        first = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        count = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)

        tsm = jnp.minimum((node_min - o) * inv_d, (node_max - o) * inv_d)
        tbg = jnp.maximum((node_min - o) * inv_d, (node_max - o) * inv_d)
        tmin = jnp.max(tsm, axis=-1)
        tmax = jnp.min(tbg, axis=-1)
        box_hit = (tmax >= tmin) & (tmax > isx.EPS_HIT)
        box_hit &= alive & (tmin <= t_best)
        is_leaf = count > 0
        leaf_work = box_hit & is_leaf

        t_new, i_new = t_best, idx
        for k in range(max_leaf):
            ti = jnp.where(leaf_work & (k < count), first + k, 0)
            trow = jnp.take(tris, ti, axis=0)          # [RT, 16]
            t_tri, _, _ = isx.ray_triangle(
                o, d, trow[:, 0:3], trow[:, 3:6], trow[:, 6:9]
            )
            ok = leaf_work & (k < count) & (t_tri < t_new)
            t_new = jnp.where(ok, t_tri, t_new)
            i_new = jnp.where(ok, first + k, i_new)

        lnk = jnp.take(links, link_base + p, axis=0)   # [RT, 2]
        nxt = jnp.where(box_hit & ~is_leaf, lnk[:, 0], lnk[:, 1])
        ptr = jnp.where(alive, nxt, -1)
        if any_hit:
            ptr = jnp.where(i_new >= 0, -1, ptr)
        return ptr, t_new, i_new

    def body(_, state):
        return one_step(state)

    init = (ptr0, t0, jnp.full((RT,), -1, jnp.int32))

    def cond(state):
        return jnp.any(state[0] >= 0)

    ptr, t_best, idx = jax.lax.while_loop(
        cond, lambda s: body(0, s), init
    )
    t_out[:] = jnp.where(idx >= 0, t_best, isx.INF)
    idx_out[:] = idx


def traverse_bvh_pallas(
    scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: Optional[jnp.ndarray] = None,
    any_hit: bool = False,
    active: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> TriHit:
    """Pallas traversal; same contract as traverse.traverse_bvh."""
    if not PALLAS_OK:
        raise RuntimeError("pallas unavailable")
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    R = o.shape[0]
    if scene.n_tris == 0:
        return TriHit(jnp.full((R,), -1, jnp.int32), jnp.full((R,), isx.INF))

    t0 = jnp.full((R,), isx.INF) if t_max is None else jnp.asarray(t_max)
    act = (
        jnp.ones((R,), jnp.int32)
        if active is None
        else active.astype(jnp.int32)
    )

    n_tiles = (R + RAY_TILE - 1) // RAY_TILE
    Rp = n_tiles * RAY_TILE
    pad = Rp - R
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t0_p = jnp.pad(t0, (0, pad))
    act_p = jnp.pad(act, (0, pad))

    tris16 = _pack_tris16(scene)
    nodes = jax.lax.stop_gradient(scene.bvh_nodes_packed)
    links = scene.bvh_links_packed

    kernel = functools.partial(
        _kernel,
        n_nodes=scene.n_nodes,
        max_leaf=scene.max_leaf,
        max_steps=4 * scene.n_nodes,
        any_hit=any_hit,
    )

    grid = (n_tiles,)
    ray_spec = pl.BlockSpec((RAY_TILE, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((RAY_TILE,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    t_hit, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, vec_spec, vec_spec,
                  full(nodes), full(links), full(tris16)],
        out_specs=[vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Rp,), jnp.float32),
            jax.ShapeDtypeStruct((Rp,), jnp.int32),
        ],
        interpret=interpret,
    )(o_p, d_p, t0_p, act_p, nodes, links, tris16)

    return TriHit(idx[:R], jax.lax.stop_gradient(t_hit[:R]))
