"""Pallas TPU kernel for the compacted cluster scan (default on TPU).

Same algorithm as ops/cluster.py phase 2, fused into one kernel per ray
tile: the compacted touched-cluster order and count are scalar-prefetch
operands, cluster triangle blocks are DMA'd from HBM into a double
buffer (next cluster's copy overlaps the current dense test), and the
per-ray best (t, idx) state lives in VMEM scratch across the in-kernel
while loop — no XLA while-iteration overhead, no per-cluster HLO.

Everything the kernel does is Mosaic-friendly by construction: scalar
dynamic slices for indexing, elementwise VPU math, axis reductions.
(The earlier attempt to keep whole-BVH *gathers* in VMEM is impossible —
tpu.dynamic_gather spans one vreg; see PERF.md.)

Layout:
  rays       [RT, 4] f32 per tile (o.xyz, pad), [RT, 4] dirs
  clusters   cl_const HBM [K, 16, M]: per-triangle solve constants on
             component rows, triangle id on lanes (aligned DMA blocks):
             rows 0-2 N, 3 N.p2, 4-6 c1, 7-9 c2, 10-12 K1=c1 x p2,
             13-15 K2=p2 x c2 (same constants as the validated MXU form,
             ops/cluster.pack_cluster_matrices)
  bbox       cl_bb [K, 6] f32 in VMEM (bbmin, bbmax)
  order/meta [K+2] i32 + first/count [K] i32 as scalar prefetch

Default production path on TPU (TraceConfig.use_pallas_cluster=None
resolves to on for the TPU backend): measured office 1080p fwd 0.534 s
vs 0.597 s for the XLA scan, fwd+bwd 1.31 s vs 1.64 s. Correctness is
pinned by tests/test_pallas_cluster.py in interpret mode and on real
TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops.traverse import TriHit

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

#: rays per kernel instance (block size; must stay aligned with XLA's
#: 1-D T(1024) layout tiling for the f32 per-ray operands). Each grid
#: program carries fixed pipeline overhead (measured ~20 us at 1024),
#: so bigger tiles amortize it across more subgroups; env-tunable.
import os as _os

from myraytracer_tpu.utils import knobs

#: Mosaic needs 1024-aligned 1-D blocks (512 measured as a compile
#: error, PERF.md round-3 sweep)
RAY_TILE = knobs.env_int("MRT_RAY_TILE", 1024, lo=1024, multiple_of=1024)

#: compaction subgroup: each SUB-ray subgroup of a block gets its OWN
#: touched-cluster list, so the union amplification of a whole 64x64
#: screen block (~35 clusters touched vs ~5 needed per ray) shrinks to
#: the subgroup's much tighter union. The kernel's per-cluster cost is a
#: DMA + dense VPU batch (no 25us XLA while-iteration overhead), which
#: is what makes small subgroups affordable here when they are not in
#: the XLA scan path. Swept 256/512/1024 -> 0.500/0.490/0.523 s (office
#: fwd, round 2); env-tunable for re-sweeps as other costs move.
SUB = knobs.env_int("MRT_SUB", 512, lo=1, hi=RAY_TILE)
if RAY_TILE % SUB != 0:
    raise ValueError(
        f"MRT_SUB={SUB} must divide RAY_TILE={RAY_TILE}: out-of-range values"
        " would silently run zero subgroups (every ray a miss)")

#: rays per dense-solve chunk inside the kernel. Sweep measured
#: 512 == 256 > 128 > 64 (0.522 / 0.522 / 0.536 / 0.563 s office fwd):
#: Mosaic's own scheduling of the [512, 128] solve doesn't spill-thrash,
#: so the whole subgroup runs as one chunk.
RCHUNK = 512


def _kernel(order_ref, meta_ref, first_ref, count_ref, lb_ref, o_ref,
            d_ref, t0_ref, act_ref, bb_ref, tris_hbm, t_out, idx_out,
            buf, sems, *, M: int, any_hit: bool, subs: int,
            early_exit: bool, group: int):
    """One ray block; each of its ``subs`` subgroups runs its own
    compacted cluster list sequentially (double-buffered DMA within).

    The per-cluster loop is a ``while_loop`` that exits as soon as the
    whole subgroup is finished: for any-hit queries once every active ray
    has found an occluder; for closest-hit once no active ray's best t
    can be improved by the NEXT cluster — clusters arrive sorted by their
    subgroup-min slab entry (``lb_ref``), so any later hit satisfies
    t >= lb_next and ``all(t_best <= lb_next)`` is an exact termination
    proof (the TPU analogue of the reference's near-child-first descent,
    mytracer_gpu.cu:394-420)."""
    i = pl.program_id(0)
    RT = o_ref.shape[0]
    sub_n = RT // subs

    t_out[:] = t0_ref[:]
    idx_out[:] = jnp.full((RT,), -1, jnp.int32)

    def run_sub(sub: int):
        sid = i * subs + sub
        n_touched = meta_ref[sid]
        sl = slice(sub * sub_n, (sub + 1) * sub_n)   # static row range

        def dma(slot, g):
            kk = order_ref[sid, g]
            return pltpu.make_async_copy(
                tris_hbm.at[kk], buf.at[slot], sems.at[slot]
            )

        nbuf = 2 * group
        for j in range(group):
            @pl.when(j < n_touched)
            def _(j=j):
                dma(j, j).start()

        def process_cluster(g):
            slot = jax.lax.rem(g, nbuf)
            dma(slot, g).wait()

            kk = order_ref[sid, g]
            row = bb_ref[kk]                       # [6]
            count = count_ref[kk]
            first = first_ref[kk]
            bbmin = row[0:3]
            bbmax = row[3:6]

            tc = buf[slot]                         # [16, M] solve constants
            tb = t_out[sl]
            ib = idx_out[sl]
            slot_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (1, M), 1) < count
            )                                      # [1, M]

            def dotc(rows, a0, a1, a2):
                # (constant rows [3, M]) . ray components [RC, 1] -> [RC, M]
                return a0 * rows[0:1] + a1 * rows[1:2] + a2 * rows[2:3]

            oc = o_ref[sl, 0:3]                # [RC, 3]
            dc = d_ref[sl, 0:3]
            ivc = 1.0 / dc
            ac = act_ref[sl]

            ts0 = (bbmin[None, :] - oc) * ivc
            ts1 = (bbmax[None, :] - oc) * ivc
            tmin = jnp.max(jnp.minimum(ts0, ts1), axis=1)
            tmax = jnp.min(jnp.maximum(ts0, ts1), axis=1)
            touch = (tmax >= tmin) & (tmax > isx.EPS_HIT)
            touch &= (ac > 0) & (tmin <= tb)
            if any_hit:
                touch &= ib < 0

            def solve_chunk(cl, oc, dc, touch, tb, ib):
                # Cramer solve from per-tri constants (module docstring):
                #   S = -(N.d); t_num = N.o - N.p2
                #   a_num = c2.w + K2.d; b_num = -c1.w + K1.d;  w = o x d
                # (component-wise: Mosaic cannot concat rows with mixed
                # sublane offsets, so no jnp.cross in-kernel)
                o0, o1, o2 = oc[:, 0:1], oc[:, 1:2], oc[:, 2:3]
                d0, d1, d2 = dc[:, 0:1], dc[:, 1:2], dc[:, 2:3]
                w0 = o1 * d2 - o2 * d1
                w1 = o2 * d0 - o0 * d2
                w2 = o0 * d1 - o1 * d0
                s = -dotc(tc[0:3], d0, d1, d2)
                t_num = dotc(tc[0:3], o0, o1, o2) - tc[3:4]
                a_num = (dotc(tc[7:10], w0, w1, w2)
                         + dotc(tc[13:16], d0, d1, d2))
                b_num = (-dotc(tc[4:7], w0, w1, w2)
                         + dotc(tc[10:13], d0, d1, d2))
                s_ok = jnp.abs(s) > isx.EPS_DET
                inv_s = jnp.where(s_ok, 1.0 / jnp.where(s_ok, s, 1.0), 0.0)
                t_tri = t_num * inv_s
                alpha = a_num * inv_s
                beta = b_num * inv_s
                # inside test reduced to 3 compares: alpha>=0, beta>=0,
                # alpha+beta<=1 imply the reference's full six
                # (0<=a,b,g<=1 with g=1-a-b, mymesh.cpp:211)
                inside = (alpha >= 0) & (beta >= 0) & (alpha + beta <= 1)
                ok = s_ok & (t_tri > isx.EPS_HIT) & inside
                t_tri = jnp.where(ok & touch[:, None] & slot_ok, t_tri,
                                  isx.INF)
                if any_hit:
                    # occlusion only: ANY triangle with t < current bound
                    # (= light distance) suffices; skip min/argmin
                    hit = jnp.any(t_tri < tb[:, None], axis=1)
                    idx_out[cl] = jnp.where(hit, first, ib)
                else:
                    j = jnp.argmin(t_tri, axis=1).astype(jnp.int32)
                    t_min = jnp.min(t_tri, axis=1)
                    better = t_min < tb
                    t_out[cl] = jnp.where(better, t_min, tb)
                    idx_out[cl] = jnp.where(better, first + j, ib)

            # front-to-back early-out: clusters arrive sorted by entry
            # distance, so once every ray's best t is in front of this
            # cluster's slab entry (or the ray never touches it), the
            # whole dense solve is skipped — only the cheap slab test
            # and the already-inflight DMA are paid. (The vector-any
            # guard costs a ~3 us vector->scalar sync per cluster, but
            # removing it measured SLOWER — the skipped solves outweigh
            # the sync. A group-fused [RC, group*M] joint solve was also
            # tried and measured a WASH: group=2 matched group=1 + the
            # phase-3 co-sort, group=1-fused regressed — the joint form
            # pays in always-run slab tests and vreg pressure.)
            @pl.when(jnp.any(touch))
            def _():
                # the solve runs in RCHUNK-ray chunks: a full-subgroup
                # [sub_n, M] solve holds ~30 live [512, 128] temporaries
                # (thousands of vregs) and spills; small chunks keep the
                # working set register-resident
                rchunk = min(RCHUNK, sub_n)
                for c in range(sub_n // rchunk):
                    cl = slice(sub * sub_n + c * rchunk,
                               sub * sub_n + (c + 1) * rchunk)
                    csl = slice(c * rchunk, (c + 1) * rchunk)
                    solve_chunk(cl, oc[csl], dc[csl], touch[csl],
                                tb[csl], ib[csl])

        def loop_body(carry):
            # ``group`` clusters per iteration: the next group's DMAs
            # start before this group solves, and the early-exit
            # reduction + loop branch are paid once per group instead of
            # once per cluster
            g, _ = carry
            for j in range(group):
                gj = g + group + j

                @pl.when(gj < n_touched)
                def _(gj=gj):
                    dma(jax.lax.rem(gj, nbuf), gj).start()

            for j in range(group):
                gj = g + j

                @pl.when(gj < n_touched)
                def _(gj=gj):
                    process_cluster(gj)

            if not early_exit:
                return (g + group, False)
            # subgroup-finished test against POST-solve state
            ac_live = act_ref[sl] > 0
            if any_hit:
                done = jnp.logical_not(
                    jnp.any(ac_live & (idx_out[sl] < 0)))
            else:
                lb_next = lb_ref[sid, g + group]
                done = jnp.logical_not(
                    jnp.any(ac_live & (lb_next < t_out[sl])))
            return (g + group, done)

        if early_exit:
            def loop_cond(carry):
                g, done = carry
                return (g < n_touched) & jnp.logical_not(done)

            g_f, stopped = jax.lax.while_loop(
                loop_cond, loop_body, (jnp.int32(0), False))

            # drain: an early exit leaves the next group's prefetches in
            # flight
            for j in range(group):
                @pl.when(stopped & (g_f + j < n_touched))
                def _(j=j):
                    dma(jax.lax.rem(g_f + j, nbuf), g_f + j).wait()
        else:
            trips = jax.lax.div(n_touched + group - 1, group)

            def fori_body(i, c):
                loop_body((i * group, False))
                return c

            jax.lax.fori_loop(0, trips, fori_body, 0, unroll=False)

    for sub in range(subs):
        run_sub(sub)


def _phase1_exact_kernel(o_ref, d_ref, t0_ref, act_ref, bbT_ref, key_out,
                         *, subs: int):
    """Per-ray exact slab compaction, fused in VMEM.

    Same math as the XLA phase-1 (isx.ray_aabb over [S, SUB, K] + the
    per-subgroup min/any reductions) but the [SUB, K]-shaped
    intermediates never leave VMEM. The XLA form materializes several
    [R, K(,3)]-sized tensors in HBM (~GBs of traffic for the office
    1080p tile stream) and measured 39 ms of the 49 ms phase-1; this
    kernel is compute-bound instead (~13 GFLOP total).

    bbT is [6, Kp]: rows 0-2 bbmin xyz, rows 3-5 bbmax xyz, columns
    padded to a lane multiple with degenerate boxes (+big/-big) that can
    never be touched. Output key [subs, Kp] per tile: subgroup-min slab
    entry (clamped >= 0) per cluster, INF = untouched.
    """
    RT = o_ref.shape[0]
    sub_n = RT // subs
    Kp = bbT_ref.shape[1]

    # fori_loop (not a Python unroll) so the [sub_n, Kp] temporaries are
    # REUSED across subgroups — an unrolled loop at subs=16 keeps every
    # iteration's tmin/tmax live and overflows scoped VMEM (measured:
    # 18.6M > 16M limit at Kp=384)
    def body(s, carry):
        sl = pl.ds(s * sub_n, sub_n)
        t0r = t0_ref[sl, :]                            # [sub_n, 1] (2D in:
        act = act_ref[sl, :] > 0                       # Mosaic can't insert
        tmin = jnp.full((sub_n, Kp), -isx.INF)         # a minor dim on bools)
        tmax = jnp.full((sub_n, Kp), isx.INF)
        for a in range(3):
            oa = o_ref[sl, a:a + 1]                    # [sub_n, 1]
            iva = 1.0 / d_ref[sl, a:a + 1]
            lo = (bbT_ref[a:a + 1, :] - oa) * iva      # [sub_n, Kp]
            hi = (bbT_ref[3 + a:4 + a, :] - oa) * iva
            tmin = jnp.maximum(tmin, jnp.minimum(lo, hi))
            tmax = jnp.minimum(tmax, jnp.maximum(lo, hi))
        touch = (tmax >= tmin) & (tmax > isx.EPS_HIT)
        touch &= act & (tmin <= t0r)
        lb = jnp.min(jnp.where(touch, jnp.maximum(tmin, 0.0), isx.INF),
                     axis=0, keepdims=True)            # [1, Kp]
        key_out[0, pl.ds(s, 1), :] = lb
        return carry

    jax.lax.fori_loop(0, subs, body, 0, unroll=False)


#: rays per phase-1 kernel program. Swept honestly in round 5 (compile
#: cache cleared between configs — a first attempt silently re-used one
#: compile and read as a four-way tie): 1024 -> 171.8 ms office fwd,
#: 4096 -> 181.6, 8192 -> 181.2, outputs bit-identical. Bigger blocks
#: LOSE: Pallas grid steps already pipeline across programs, while the
#: in-program fori_loop over subgroups serializes them. 1024 stays.
P1_TILE = knobs.env_int("MRT_P1_TILE", 1024, lo=1024, multiple_of=1024)


def _phase1_exact_pallas(o4, d4, t0p, actp, cl_bbmin, cl_bbmax,
                         n_tiles: int, subs: int):
    """Run the fused exact phase-1; returns key [n_sub_total, K]."""
    K = cl_bbmin.shape[0]
    Kp = ((K + 127) // 128) * 128
    big = jnp.float32(3e38)
    bbT = jnp.concatenate([cl_bbmin.T, cl_bbmax.T], axis=0)   # [6, K]
    if Kp != K:
        pad = jnp.concatenate([jnp.full((3, Kp - K), big),
                               jnp.full((3, Kp - K), -big)], axis=0)
        bbT = jnp.concatenate([bbT, pad], axis=1)
    Rp = n_tiles * RAY_TILE
    p1 = min(P1_TILE, Rp)
    n_prog = (Rp + p1 - 1) // p1
    pad_r = n_prog * p1 - Rp
    if pad_r:
        # padded rays: inactive, so their subgroups' keys are all-INF
        # rows at the tail of the key array, sliced off by the caller
        o4 = jnp.pad(o4, ((0, pad_r), (0, 0)))
        d4 = jnp.pad(d4, ((0, pad_r), (0, 0)), constant_values=1.0)
        t0p = jnp.pad(t0p, (0, pad_r))
        actp = jnp.pad(actp, (0, pad_r))
    subs_pp = p1 // SUB
    grid_spec = pl.GridSpec(
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((p1, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p1, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, subs_pp, Kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    key = pl.pallas_call(
        functools.partial(_phase1_exact_kernel, subs=subs_pp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_prog, subs_pp, Kp), jnp.float32),
    )(o4, d4, t0p[:, None], actp[:, None], bbT)
    return key.reshape(n_prog * subs_pp, Kp)[:Rp // SUB, :K]


def _phase1_frustum(o_s, d_s, t0_s, act_s, cl_bbmin, cl_bbmax):
    """Conservative per-subgroup cluster touch test + front-to-back key.

    Interval-arithmetic slab test of each SUB-ray bundle (origin AABB x
    per-axis direction range) against every cluster AABB — O(S*K) instead
    of the exact per-ray O(R*K). The result is a SUPERSET of the exact
    per-ray union (the in-kernel per-ray ``touch`` keeps results exact;
    phase 1 only builds the visit order), computed ~SUB times cheaper.

    Returns key [S, K]: a lower bound on any hit t in cluster k by any
    active ray of subgroup s (clamped to >= 0), or +INF when the bundle
    provably cannot improve inside k. Sorting by it preserves the exact
    front-to-back termination proof of the kernel (lb <= per-ray tmin).
    """
    any_act = jnp.any(act_s, axis=1)                      # [S]
    big = jnp.float32(3e37)

    def lohi(x, a):
        lo = jnp.min(jnp.where(a, x, big), axis=1)
        hi = jnp.max(jnp.where(a, x, -big), axis=1)
        return lo, hi                                     # [S, 3]

    a3 = act_s[:, :, None]
    olo, ohi = lohi(o_s, a3)
    dlo, dhi = lohi(d_s, a3)
    # per-axis 1/d range where the bundle's sign is constant; mixed-sign
    # (or empty) axes impose no constraint
    con = (dlo > 0.0) | (dhi < 0.0)                       # [S, 3]
    safe_lo = jnp.where(con, dlo, 1.0)
    safe_hi = jnp.where(con, dhi, 1.0)
    ivlo = 1.0 / safe_hi
    ivhi = 1.0 / safe_lo

    # interval products for t0 = (bbmin - o) * iv, t1 = (bbmax - o) * iv
    def prod_interval(alo, ahi):                          # [S, K, 3] each
        c1 = alo * ivlo[:, None]
        c2 = alo * ivhi[:, None]
        c3 = ahi * ivlo[:, None]
        c4 = ahi * ivhi[:, None]
        return (jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4)),
                jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4)))

    t0lo, t0hi = prod_interval(cl_bbmin[None] - ohi[:, None],
                               cl_bbmin[None] - olo[:, None])
    t1lo, t1hi = prod_interval(cl_bbmax[None] - ohi[:, None],
                               cl_bbmax[None] - olo[:, None])
    entry_lo = jnp.minimum(t0lo, t1lo)                    # [S, K, 3]
    exit_hi = jnp.maximum(t0hi, t1hi)
    entry_lo = jnp.where(con[:, None], entry_lo, -big)
    exit_hi = jnp.where(con[:, None], exit_hi, big)
    lb_tmin = jnp.max(entry_lo, axis=2)                   # [S, K]
    ub_tmax = jnp.min(exit_hi, axis=2)

    t0_max = jnp.max(jnp.where(act_s, t0_s, 0.0), axis=1)  # [S]
    touch = ((ub_tmax >= lb_tmin) & (ub_tmax > isx.EPS_HIT)
             & (lb_tmin <= t0_max[:, None]) & any_act[:, None])
    return jnp.where(touch, jnp.maximum(lb_tmin, 0.0), isx.INF)


def _phase1_anyhit_hull(o_s, d_s, t0_s, act_s, cl_bbmin, cl_bbmax):
    """Conservative per-subgroup touch test + visit key for FINITE
    any-hit queries (shadow rays): O(S*K) instead of the exact per-ray
    O(R*K).

    An any-hit ray only tests points on the segment o -> o + t0*d (the
    occlusion bound clips it at the light), so the subgroup's swept
    volume is contained in AABB(origins ∪ endpoints) — for shadow rays
    the endpoint box collapses to the light position, making this hull
    far tighter than the direction-interval frustum for the same bundle.
    Intersected with the interval slab test (:func:`_phase1_frustum`) for
    extra pruning; both tests are supersets of the exact per-ray union,
    so their conjunction still is. The in-kernel per-ray test keeps the
    final result exact. Key = max of the two t lower bounds (each valid).

    Returns key [S, K]: lower bound on any hit t (>= 0), INF = skip.
    """
    eps = jnp.float32(1e-4)
    big = jnp.float32(3e37)
    a3 = act_s[:, :, None]
    any_act = jnp.any(act_s, axis=1)                      # [S]

    # an infinite occlusion bound (unbounded any-hit ray) would make
    # e = o + inf*d produce inf*0 = NaN on zero direction components,
    # silently dropping occluders through the hull min/max; clamping t0
    # to a huge finite value keeps the hull a conservative superset
    # (overflow to +/-inf in the product only widens it further)
    t0_c = jnp.minimum(t0_s[:, :, None], big)
    e_s = o_s + t0_c * d_s                                # endpoints
    olo = jnp.min(jnp.where(a3, o_s, big), axis=1)        # [S, 3]
    ohi = jnp.max(jnp.where(a3, o_s, -big), axis=1)
    elo = jnp.min(jnp.where(a3, e_s, big), axis=1)
    ehi = jnp.max(jnp.where(a3, e_s, -big), axis=1)
    ulo = jnp.minimum(olo, elo)
    uhi = jnp.maximum(ohi, ehi)
    # absolute + relative inflation: phase-1 must be a SUPERSET of the
    # exact union, so fp32 rounding of the endpoint sum must never shrink
    # the box past a true hit point
    slack = eps * (1.0 + jnp.maximum(jnp.abs(ulo), jnp.abs(uhi)))
    ulo = ulo - slack
    uhi = uhi + slack

    overlap = jnp.all(
        (cl_bbmin[None] <= uhi[:, None]) & (cl_bbmax[None] >= ulo[:, None]),
        axis=2,
    )                                                     # [S, K]

    # t lower bound from origin-box -> cluster-box distance (t = |x-o|/|d|)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(cl_bbmin[None] - ohi[:, None],
                    olo[:, None] - cl_bbmax[None]),
    )                                                     # [S, K, 3]
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=2))           # [S, K]
    dnorm = jnp.sqrt(jnp.sum(d_s * d_s, axis=2))          # [S, R']
    dmax = jnp.max(jnp.where(act_s, dnorm, 0.0), axis=1)  # [S]
    safe_dmax = jnp.maximum(dmax, jnp.float32(1e-30))
    lb_box = dist / safe_dmax[:, None] * (1.0 - eps)      # [S, K]

    t0_max = jnp.max(jnp.where(act_s, t0_s, 0.0), axis=1)  # [S]
    touch = (overlap & any_act[:, None]
             & (lb_box <= t0_max[:, None] * (1.0 + eps)))

    key_f = _phase1_frustum(o_s, d_s, t0_s, act_s, cl_bbmin, cl_bbmax)
    key = jnp.maximum(key_f, jnp.maximum(lb_box, 0.0))
    return jnp.where(touch & (key_f < isx.INF), key, isx.INF)


def intersect_clusters_pallas(
    scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: Optional[jnp.ndarray] = None,
    any_hit: bool = False,
    active: Optional[jnp.ndarray] = None,
    cl_const: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    phase1: Optional[str] = None,
) -> TriHit:
    """Pallas cluster scan; contract of traverse.traverse_bvh.

    Phase-1 compaction runs in XLA (cheap, dense); the per-cluster loop
    runs in the kernel.
    """
    if not PALLAS_OK:
        raise RuntimeError("pallas unavailable")
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    R = o.shape[0]
    if scene.n_tris == 0:
        return TriHit(jnp.full((R,), -1, jnp.int32), jnp.full((R,), isx.INF))

    if cl_const is None:
        cl_const = pack_cluster_constants(scene)

    M = scene.cl_M
    inv_d = 1.0 / d[:, :3]
    t0 = jnp.full((R,), isx.INF) if t_max is None else jnp.asarray(t_max)
    act = jnp.ones((R,), jnp.int32) if active is None else active.astype(jnp.int32)

    cl_bbmin = jax.lax.stop_gradient(scene.cl_bbmin)
    cl_bbmax = jax.lax.stop_gradient(scene.cl_bbmax)

    # group < 1 would never DMA a cluster (kernel hang); validated
    group = knobs.env_int("MRT_GROUP", 1, lo=1, hi=16)
    # lb is read unguarded at column g+group inside the kernel, so pad
    # at least group+1 columns (2 keeps the group=1 layout unchanged)
    padk = max(2, group + 1)

    # ---- SMEM guard: the order/lb scalar-prefetch tables are
    # [S, K+padk] (i32 + f32) and must fit the ~1 MB SMEM budget
    # together. Large cluster counts x large ray batches overflow it
    # (measured: K=601 with a 131072-ray batch asks for 2 x 640 KB and
    # fails to compile), so the batch is split into chunks whose tables
    # fit; results concatenate exactly (each ray is independent).
    # lo=1: tiny budgets are legitimate (tests force the chunked path
    # with them); small values only split the batch further
    smem_budget = knobs.env_int("MRT_SMEM_TABLE_BUDGET", 600000, lo=1)
    Kc = cl_bbmin.shape[0]
    max_sub = max(RAY_TILE // SUB, smem_budget // (8 * (Kc + padk)))
    r_chunk = max(RAY_TILE, (max_sub * SUB // RAY_TILE) * RAY_TILE)
    if R > r_chunk:
        outs = []
        for i in range(0, R, r_chunk):
            sl = slice(i, min(i + r_chunk, R))
            outs.append(intersect_clusters_pallas(
                scene, o[sl], d[sl],
                t_max=None if t_max is None else t0[sl],
                any_hit=any_hit,
                active=None if active is None else act[sl],
                cl_const=cl_const, interpret=interpret, phase1=phase1))
        return TriHit(jnp.concatenate([h.idx for h in outs]),
                      jnp.concatenate([h.t for h in outs]))

    n_tiles = (R + RAY_TILE - 1) // RAY_TILE
    Rp = n_tiles * RAY_TILE
    pad = Rp - R
    # callers may hand in 4-wide pre-padded rays (ops/pallas_shade emits
    # them directly); only pad the component axis when it is 3-wide
    wpad = 4 - o.shape[1]
    o4 = jnp.pad(o, ((0, pad), (0, wpad)))
    d4 = jnp.pad(d, ((0, pad), (0, wpad)), constant_values=1.0)
    t0p = jnp.pad(t0, (0, pad))
    actp = jnp.pad(act, (0, pad))

    # ---- phase 1 (XLA): PER-SUBGROUP compacted front-to-back orders.
    # Each SUB-ray subgroup of spatially-adjacent rays gets its own
    # touched list; unions are far tighter than the whole screen block's.
    subs = RAY_TILE // SUB
    n_sub = Rp // SUB
    K = cl_bbmin.shape[0]
    # default ("auto"): finite any-hit queries (shadow rays) take the
    # O(S*K) HULL compaction, closest-hit takes the exact per-ray Pallas
    # phase-1. Round 4 measured exact-everywhere ahead (0.2838 vs
    # 0.2876 s) on that round's office; round 5's rebuilt office grew
    # the shadow load (the long desk + near chairs occlude both lights)
    # and the hull re-took it: fwd 0.1513 vs 0.1533 s pipelined,
    # fwd+bwd 0.2434 vs 0.2455 — the looser lists cost less than the
    # [R, K]-scale exact pass saves. Output stays exact either way (the
    # in-kernel per-ray test is exact; phase 1 only picks the visit
    # list/order). "hull"/"exact"/"frustum" force a variant ("frustum"
    # measured SLOWER for closest-hit: 0.515 vs 0.466 s).
    # per-call override (TraceConfig.phase1) beats the env knob: the AA
    # refine forces "exact" — its SCATTERED subray bundles make the
    # any-hit hulls catastrophically loose (office AA 0.323 with hull vs
    # 0.285 with exact), while coherent primary/shadow tiles keep the
    # hull default
    mode = phase1 or knobs.env_choice("MRT_PHASE1", "auto",
                                      ("auto", "hull", "exact", "frustum"))
    kernel_ok = (not interpret
                 and knobs.env_bool01("MRT_PHASE1_KERNEL", True))
    use_hull = (any_hit and t_max is not None
                and mode in ("hull", "auto"))
    if mode == "frustum" or use_hull:
        o_s = o4[:, :3].reshape(n_sub, SUB, 3)
        d_s = d4[:, :3].reshape(n_sub, SUB, 3)
        t0_s = t0p.reshape(n_sub, SUB)
        act_s = actp.reshape(n_sub, SUB) > 0
        if use_hull:
            key = _phase1_anyhit_hull(o_s, d_s, t0_s, act_s,
                                      cl_bbmin, cl_bbmax)    # [S, K]
        else:
            key = _phase1_frustum(o_s, d_s, t0_s, act_s,
                                  cl_bbmin, cl_bbmax)        # [S, K]
        touched = key < isx.INF
    elif kernel_ok:
        # fused Pallas phase-1 (default on real TPUs): identical exact
        # per-ray compaction, ~4x faster than the XLA form whose [R, K]
        # intermediates round-trip HBM (measured 49 -> 13 ms on the
        # office 1080p forward's tile stream)
        key = _phase1_exact_pallas(o4, d4, t0p, actp, cl_bbmin, cl_bbmax,
                                   n_tiles, subs)        # [S, K]
        touched = key < isx.INF
    else:
        o_s = o4[:, :3].reshape(n_sub, SUB, 3)
        iv_s = jnp.pad(inv_d, ((0, pad), (0, 0)),
                       constant_values=1.0).reshape(n_sub, SUB, 3)
        box_hit, tmin_k = isx.ray_aabb(
            o_s[:, :, None, :], iv_s[:, :, None, :],
            cl_bbmin[None, None], cl_bbmax[None, None]
        )                                                # [S, SUB, K]
        ray_touch = (box_hit & (actp.reshape(n_sub, SUB, 1) > 0)
                     & (tmin_k <= t0p.reshape(n_sub, SUB, 1)))
        touched = jnp.any(ray_touch, axis=1)             # [S, K]
        # sort key = subgroup-min slab entry: a true lower bound on any
        # hit t inside the cluster, which makes front-to-back termination
        # exact (see _kernel docstring)
        lb = jnp.min(
            jnp.where(ray_touch, jnp.maximum(tmin_k, 0.0), isx.INF),
            axis=1)
        key = jnp.where(touched, lb, isx.INF)            # [S, K]
    # ONE stable co-sort of (key, cluster-id) yields both the visit order
    # and the sorted lower bounds. (argsort + take_along_axis looks the
    # same but XLA lowers the take_along gather to a serial row gather —
    # measured 212 us per 16384-ray tile = 27 ms per office forward,
    # 25x the cost of the sort itself.)
    ids = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :], key.shape)
    lb_sorted, order = jax.lax.sort((key, ids), dimension=1,
                                    is_stable=True, num_keys=1)
    n_touched = jnp.sum(touched.astype(jnp.int32), axis=1)   # [S]
    order_pad = jnp.concatenate(
        [order.astype(jnp.int32), jnp.zeros((n_sub, padk), jnp.int32)],
        axis=1)
    lb_pad = jnp.concatenate(
        [lb_sorted, jnp.full((n_sub, padk), isx.INF)], axis=1)

    # packed bbox rows [K, 6]; first/count ride as scalar prefetch
    bb = jnp.concatenate([cl_bbmin, cl_bbmax], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 4), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 4), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bb.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # cl_const stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE,), lambda i, *_: (i,),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * group, 16, M), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * group,)),
        ],
    )

    kernel = functools.partial(
        _kernel, M=M, any_hit=any_hit, subs=subs,
        early_exit=knobs.env_bool01("MRT_PALLAS_EARLY_EXIT", True),
        group=group)
    t_hit, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Rp,), jnp.float32),
            jax.ShapeDtypeStruct((Rp,), jnp.int32),
        ],
        interpret=interpret,
    )(order_pad, n_touched, scene.cl_first, scene.cl_count, lb_pad,
      o4, d4, t0p, actp, bb, cl_const)

    idx = idx[:R]
    t_hit = jnp.where(idx >= 0, t_hit[:R], isx.INF)
    return TriHit(idx, jax.lax.stop_gradient(t_hit))


def pack_cluster_constants(scene, tri_flat16: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[K, 16, M] per-cluster solve constants, triangle id on lanes.

    Rows: 0-2 N = c1 x c2, 3 N.p2, 4-6 c1, 7-9 c2, 10-12 K1 = c1 x p2,
    13-15 K2 = p2 x c2 — the same decomposition as the validated MXU
    form (ops/cluster.pack_cluster_matrices).
    """
    from myraytracer_tpu.ops.cluster import pack_cluster_tris
    from myraytracer_tpu.ops.traverse import pack_tri_vertices

    if tri_flat16 is None:
        tri_flat16 = pack_tri_vertices(scene)
    tris = pack_cluster_tris(scene, tri_flat16)          # [K, M, 9]
    p0, p1, p2 = tris[..., 0:3], tris[..., 3:6], tris[..., 6:9]
    c1 = p0 - p2
    c2 = p1 - p2
    n = jnp.cross(c1, c2)
    k1 = jnp.cross(c1, p2)
    k2 = jnp.cross(p2, c2)
    ndp2 = jnp.sum(n * p2, axis=-1, keepdims=True)       # [K, M, 1]
    packed = jnp.concatenate([n, ndp2, c1, c2, k1, k2], axis=-1)  # [K, M, 16]
    return jnp.swapaxes(packed, 1, 2)                    # [K, 16, M]
