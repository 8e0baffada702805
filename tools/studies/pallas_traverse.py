"""Pallas threaded-BVH traversal — EXPERIMENTAL, interpret-mode only.

Design study kept for the record: the threaded-BVH walk with all tables
VMEM-resident and every fetch expressed as Mosaic's in-register
``tpu.dynamic_gather`` (``take_along_axis`` with idx.shape == x.shape).
**This does NOT compile on current TPUs**: Mosaic's dynamic_gather only
spans a single vreg along the gather dimension ("Multiple source vregs
along gather dimension"), i.e. 128 lanes — far smaller than any real
node table. The finding is what motivated the cluster-scan design
(ops/cluster.py) and its working Pallas form (ops/pallas_cluster.py),
which need no gathers at all.

Correct under interpret=True (tests/test_pallas.py); not reachable from
the production tracer.
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

#: minimum tile/table width (lanes)
MIN_W = 1024

#: VMEM budget for the resident tables (bytes)
VMEM_SCENE_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def table_width(scene) -> int:
    return max(_round_up(scene.n_nodes, 512), _round_up(scene.n_tris, 512), MIN_W)


def scene_fits_vmem(scene) -> bool:
    w = table_width(scene)
    n_bytes = 4 * w * (8 + 16 + 16 + 9)  # nodes + entry/skip + tris
    return n_bytes <= VMEM_SCENE_BUDGET


def build_tables(scene):
    """Transposed, width-padded VMEM tables (host/XLA-side, cheap)."""
    w = table_width(scene)
    n, t = scene.n_nodes, scene.n_tris

    nodes = jax.lax.stop_gradient(scene.bvh_nodes_packed)      # [N, 8]
    nodes_t = jnp.zeros((8, w), jnp.float32).at[:, :n].set(nodes.T)

    entry = scene.bvh_entry.astype(jnp.int32)                  # [8, N]
    skip = scene.bvh_skip.astype(jnp.int32)
    entry_t = jnp.full((8, w), -1, jnp.int32).at[:, :n].set(entry)
    skip_t = jnp.full((8, w), -1, jnp.int32).at[:, :n].set(skip)

    vp = jax.lax.stop_gradient(scene.vertex_pos)
    tv = scene.tri_vidx
    tri9 = jnp.concatenate([vp[tv[:, 0]], vp[tv[:, 1]], vp[tv[:, 2]]], axis=1)
    tris_t = jnp.zeros((9, w), jnp.float32).at[:, :t].set(tri9.T)

    return nodes_t, entry_t, skip_t, tris_t, w


def _kernel(o_ref, d_ref, t0_ref, ptr0_ref, nodes_ref, entry_ref, skip_ref,
            tris_ref, t_out, idx_out, *, max_leaf: int, any_hit: bool):
    o = o_ref[:]            # [3, W]
    d = d_ref[:]            # [3, W]
    t0 = t0_ref[:]          # [1, W]
    ptr0 = ptr0_ref[:]      # [1, W] int32 (-1 = inactive)

    nodes = nodes_ref[:]    # [8, W]
    entry = entry_ref[:]    # [8, W]
    skip = skip_ref[:]      # [8, W]
    tris = tris_ref[:]      # [9, W]

    W = o.shape[1]
    inv_d = 1.0 / d
    octant = (
        (d[0:1] < 0).astype(jnp.int32)
        + 2 * (d[1:2] < 0).astype(jnp.int32)
        + 4 * (d[2:3] < 0).astype(jnp.int32)
    )                       # [1, W]
    octant8 = jnp.broadcast_to(octant, (8, W))

    def one_step(state):
        ptr, t_best, idx = state
        alive = ptr >= 0                      # [1, W]
        p = jnp.maximum(ptr, 0)
        p8 = jnp.broadcast_to(p, (8, W))

        row = jnp.take_along_axis(nodes, p8, axis=1,
                                  mode="promise_in_bounds")     # [8, W]
        node_min = row[0:3]
        node_max = row[3:6]
        first = jax.lax.bitcast_convert_type(row[6:7], jnp.int32)
        count = jax.lax.bitcast_convert_type(row[7:8], jnp.int32)

        tsm = jnp.minimum((node_min - o) * inv_d, (node_max - o) * inv_d)
        tbg = jnp.maximum((node_min - o) * inv_d, (node_max - o) * inv_d)
        tmin = jnp.max(tsm, axis=0, keepdims=True)              # [1, W]
        tmax = jnp.min(tbg, axis=0, keepdims=True)
        box_hit = (tmax >= tmin) & (tmax > isx.EPS_HIT)
        box_hit &= alive & (tmin <= t_best)
        is_leaf = count > 0
        leaf_work = box_hit & is_leaf

        base = jnp.where(leaf_work, first, 0)
        t_new, i_new = t_best, idx
        for k in range(max_leaf):
            ti8 = jnp.broadcast_to(base + k, (9, W))
            trow = jnp.take_along_axis(tris, ti8, axis=1,
                                       mode="promise_in_bounds")  # [9, W]
            p0, p1, p2 = trow[0:3], trow[3:6], trow[6:9]
            # Cramer's-rule solve on component rows
            c1 = p0 - p2
            c2 = p1 - p2
            c3 = -d
            c4 = o - p2

            def det3(a, b, c):
                return (
                    a[0:1] * (b[1:2] * c[2:3] - b[2:3] * c[1:2])
                    - b[0:1] * (a[1:2] * c[2:3] - a[2:3] * c[1:2])
                    + c[0:1] * (a[1:2] * b[2:3] - a[2:3] * b[1:2])
                )

            s = det3(c1, c2, c3)
            s_ok = jnp.abs(s) > isx.EPS_DET
            inv_s = jnp.where(s_ok, 1.0 / jnp.where(s_ok, s, 1.0), 0.0)
            t_tri = det3(c1, c2, c4) * inv_s
            alpha = det3(c4, c2, c3) * inv_s
            beta = det3(c1, c4, c3) * inv_s
            gamma = 1.0 - alpha - beta
            inside = (
                (alpha >= 0) & (alpha <= 1)
                & (beta >= 0) & (beta <= 1)
                & (gamma >= 0) & (gamma <= 1)
            )
            ok = (
                s_ok & (t_tri > isx.EPS_HIT) & inside
                & leaf_work & (k < count) & (t_tri < t_new)
            )
            t_new = jnp.where(ok, t_tri, t_new)
            i_new = jnp.where(ok, base + k, i_new)

        ent = jnp.take_along_axis(entry, p8, axis=1,
                                  mode="promise_in_bounds")      # [8, W]
        skp = jnp.take_along_axis(skip, p8, axis=1,
                                  mode="promise_in_bounds")
        ent_o = jnp.take_along_axis(ent, octant8, axis=0,
                                    mode="promise_in_bounds")[0:1]
        skp_o = jnp.take_along_axis(skp, octant8, axis=0,
                                    mode="promise_in_bounds")[0:1]

        nxt = jnp.where(box_hit & ~is_leaf, ent_o, skp_o)
        ptr = jnp.where(alive, nxt, -1)
        if any_hit:
            ptr = jnp.where(i_new >= 0, -1, ptr)
        return ptr, t_new, i_new

    def cond(state):
        return jnp.any(state[0] >= 0)

    init = (ptr0, t0, jnp.full((1, W), -1, jnp.int32))
    ptr, t_best, idx = jax.lax.while_loop(cond, lambda s: one_step(s), init)
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

    nodes_t, entry_t, skip_t, tris_t, W = build_tables(scene)

    t0 = jnp.full((R,), isx.INF) if t_max is None else jnp.asarray(t_max)
    ptr0 = jnp.zeros((R,), jnp.int32)
    if active is not None:
        ptr0 = jnp.where(active, ptr0, -1)

    n_tiles = (R + W - 1) // W
    Rp = n_tiles * W
    pad = Rp - R
    o_t = jnp.pad(o, ((0, pad), (0, 0))).T                     # [3, Rp]
    d_t = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0).T
    t0_t = jnp.pad(t0, (0, pad)).reshape(1, Rp)
    ptr0_t = jnp.pad(ptr0, (0, pad), constant_values=-1).reshape(1, Rp)

    kernel = functools.partial(_kernel, max_leaf=scene.max_leaf,
                               any_hit=any_hit)

    ray3 = pl.BlockSpec((3, W), lambda i: (0, i), memory_space=pltpu.VMEM)
    ray1f = pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
    ray1i = pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
    tbl = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    t_hit, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray3, ray3, ray1f, ray1i,
                  tbl(nodes_t), tbl(entry_t), tbl(skip_t), tbl(tris_t)],
        out_specs=[ray1f, ray1i],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, t0_t, ptr0_t, nodes_t, entry_t, skip_t, tris_t)

    return TriHit(idx[0, :R], jax.lax.stop_gradient(t_hit[0, :R]))
