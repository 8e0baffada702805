"""Differentiable fused shade-segment with a hand-written VJP.

The two-phase backward's cost structure (PERF.md round-4 trace) is
dominated by the XLA shading replay: the checkpointed forward recompute
(~36 ms/frame) and the AD backward (~43 ms/frame) each run as dozens of
[R,*] fusions with HBM round trips between them. This module collapses
one Whitted *shading segment* — the differentiable replay of a recorded
topology slice: Cramer re-solve, normal interpolation, plane
re-projection, Phong with a fixed shadow mask, Whitted blend, mirror
bounce (ops/shade.resolve_hit + ops/tracer.lighting_from_mask +
tracer.trace_shade's segment body) — into a `jax.custom_vjp` whose
forward AND backward are single fused passes.

Scope: triangle-only, texture-free scenes (the benchmark office and most
goldens). `tracer.trace_shade` dispatches here when the scene qualifies;
everything else keeps the plain-JAX path. Both the forward and the
hand-derived backward are written once over component columns
(`_fwd_core` / `_bwd_core`) and are exact to the plain-JAX math by
construction — tests/test_shade_grad.py pins outputs AND all cotangents
against `jax.vjp` of the reference implementation.

The cores run under two executors:
  * pure JAX (CPU/tests, and the custom_vjp's interpret path);
  * Pallas kernels (TPU): per-ray 1-D columns, the same layout
    discipline as ops/pallas_shade (see its module docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops.shade import EPS_OFFSET
from myraytracer_tpu.utils.vecmath import EPS_NORMALIZE

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

#: rays per kernel block (same budget reasoning as pallas_shade.CHUNK)
CHUNK = 8192

#: tri_pack columns consumed (ShadeGeom layout): p0 p1 p2 | n0 n1 n2 |
#: phong flag | kd ka ks shin mirror
_COLS = tuple(range(0, 9)) + tuple(range(16, 25)) + (25,) + tuple(
    range(32, 43))

#: destination column for each cotangent produced by the backward, in
#: the order (_COLS minus the non-differentiable phong flag 25)
_GRAD_COLS = tuple(range(0, 9)) + tuple(range(16, 25)) + tuple(
    range(32, 43))


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _inv_norm(n2):
    """vm.normalize's exact guard and op order (reciprocal(sqrt(.)))."""
    ok = n2 > EPS_NORMALIZE
    return ok, jnp.where(
        ok, jnp.reciprocal(jnp.sqrt(jnp.maximum(n2, EPS_NORMALIZE))), 0.0)


def _fwd_core(o, d, w, cols, lp, lc, amb, bg, is_t, h, miss, lit, L):
    """Forward shade segment over component columns.

    o, d: 3-tuples of [R]; w: [R]; cols: dict col->[R] (tri_pack values);
    lp, lc: [L][3] python lists of scalars-or-[R]-broadcastables;
    amb, bg: [3]; is_t/h/miss: [R] bool; lit: [L] of [R] float.
    Returns (add(3), o2(3), d2(3), w2) plus the intermediate dict for
    the backward.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    p0 = (cols[0], cols[1], cols[2])
    p1 = (cols[3], cols[4], cols[5])
    p2 = (cols[6], cols[7], cols[8])

    # --- Cramer solve (isx.ray_triangle) -------------------------------
    c1 = (p0[0] - p2[0], p0[1] - p2[1], p0[2] - p2[2])
    c2 = (p1[0] - p2[0], p1[1] - p2[1], p1[2] - p2[2])
    c3 = (-dx, -dy, -dz)
    c4 = (ox - p2[0], oy - p2[1], oz - p2[2])

    def det3(a, b, c):
        cx, cy, cz = _cross(*b, *c)
        return a[0] * cx + a[1] * cy + a[2] * cz

    s = det3(c1, c2, c3)
    Dt = det3(c1, c2, c4)
    Da = det3(c4, c2, c3)
    Db = det3(c1, c4, c3)
    ok_s = jnp.abs(s) > isx.EPS_DET
    inv_s = jnp.where(ok_s, 1.0 / jnp.where(ok_s, s, 1.0), 0.0)
    t_raw = Dt * inv_s
    alpha = Da * inv_s
    beta = Db * inv_s
    gamma = 1.0 - alpha - beta
    inside = ((alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0)
              & (beta <= 1.0) & (gamma >= 0.0) & (gamma <= 1.0))
    valid = ok_s & (t_raw > isx.EPS_HIT) & inside
    t_inf = jnp.where(valid, t_raw, isx.INF)
    t_use = jnp.where(is_t, t_inf, 0.0)

    # --- normals -------------------------------------------------------
    e1 = (p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2])
    e2 = (p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2])
    cr = _cross(*e1, *e2)
    n2f = _dot(*cr, *cr)
    okf, invf = _inv_norm(n2f)
    nf = (cr[0] * invf, cr[1] * invf, cr[2] * invf)

    n0 = (cols[16], cols[17], cols[18])
    n1 = (cols[19], cols[20], cols[21])
    n2v = (cols[22], cols[23], cols[24])
    phong = cols[25] > 0.5
    nph = tuple(alpha * n0[i] + beta * n1[i] + gamma * n2v[i]
                for i in range(3))
    nsel = tuple(jnp.where(phong, nph[i], nf[i]) for i in range(3))
    nrm = tuple(jnp.where(is_t, nsel[i], 0.0) for i in range(3))

    # --- hit point + plane re-projection (resolve_hit) -----------------
    P = (ox + t_use * dx, oy + t_use * dy, oz + t_use * dz)
    q = (P[0] - p2[0], P[1] - p2[1], P[2] - p2[2])
    dd = _dot(*nf, *q)
    point = tuple(jnp.where(is_t, P[i] - dd * nf[i], P[i])
                  for i in range(3))

    # --- materials (tri-only: packed per-tri mat16 row) ----------------
    kd = (cols[32], cols[33], cols[34])
    ka = (cols[35], cols[36], cols[37])
    ks = (cols[38], cols[39], cols[40])
    shin = cols[41]
    mirror = jnp.where(is_t, cols[42], 0.0)

    # --- Phong with fixed shadow mask (lighting_from_mask) -------------
    col = [amb[0] * ka[0], amb[1] * ka[1], amb[2] * ka[2]]
    per_light = []
    for li in range(L):
        lv = (lp[li][0] - point[0], lp[li][1] - point[1],
              lp[li][2] - point[2])
        n2l = _dot(*lv, *lv)
        okl, invl = _inv_norm(n2l)
        ld = (lv[0] * invl, lv[1] * invl, lv[2] * invl)
        diff = jnp.maximum(0.0, _dot(*nrm, *ld))
        ln = _dot(*ld, *nrm)
        m = (2.0 * ln * nrm[0] - ld[0], 2.0 * ln * nrm[1] - ld[1],
             2.0 * ln * nrm[2] - ld[2])
        n2m = _dot(*m, *m)
        okm, invm = _inv_norm(n2m)
        r = (m[0] * invm, m[1] * invm, m[2] * invm)
        rv = _dot(*r, -dx, -dy, -dz)
        cos_rv = jnp.maximum(0.0, rv)
        gate = (diff > 0.0) & (cos_rv > 0.0)
        base = jnp.where(gate, cos_rv, 1.0)
        spec = jnp.where(gate, jnp.power(base, shin), 0.0)
        for ci in range(3):
            col[ci] = col[ci] + lc[li][ci] * lit[li] * (
                kd[ci] * diff + ks[ci] * spec)
        per_light.append(dict(lv=lv, okl=okl, invl=invl, ld=ld, diff=diff,
                              ln=ln, m=m, okm=okm, invm=invm, r=r, rv=rv,
                              cos_rv=cos_rv, gate=gate, base=base,
                              spec=spec))

    hf = h
    mf = miss
    wf = w * (1.0 - mirror)
    add = tuple(
        jnp.where(hf, wf * col[i], 0.0) + jnp.where(mf, w * bg[i], 0.0)
        for i in range(3))

    # --- mirror bounce (trace_shade segment tail) ----------------------
    dn = _dot(dx, dy, dz, *nrm)
    refl = (dx - 2.0 * dn * nrm[0], dy - 2.0 * dn * nrm[1],
            dz - 2.0 * dn * nrm[2])
    o2 = tuple(jnp.where(hf, point[i] + EPS_OFFSET * refl[i], o[i])
               for i in range(3))
    d2 = tuple(jnp.where(hf, refl[i], d[i]) for i in range(3))
    w2 = jnp.where(hf, w * mirror, 0.0)

    inter = dict(c1=c1, c2=c2, c3=c3, c4=c4, s=s, Dt=Dt, Da=Da, Db=Db,
                 ok_s=ok_s, inv_s=inv_s, t_raw=t_raw, alpha=alpha,
                 beta=beta, gamma=gamma, valid=valid, t_use=t_use,
                 e1=e1, e2=e2, cr=cr, okf=okf, invf=invf, nf=nf,
                 n0=n0, n1=n1, n2v=n2v, phong=phong, nsel=nsel, nrm=nrm,
                 P=P, q=q, dd=dd, point=point, kd=kd, ka=ka, ks=ks,
                 shin=shin, mirror=mirror, col=col, per_light=per_light,
                 dn=dn, refl=refl, wf=wf)
    return (add, o2, d2, w2), inter


def _bwd_core(o, d, w, cols, lp, lc, amb, bg, is_t, h, miss, lit, L,
              g_add, g_o2, g_d2, g_w2):
    """Hand-derived reverse of :func:`_fwd_core`.

    Returns (g_o(3), g_d(3), g_w, g_cols dict, g_lp [L][3] per-ray,
    g_lc [L][3] per-ray, g_amb(3) per-ray, g_bg(3) per-ray). The lp / lc
    / amb / bg cotangents are PER-RAY contributions — callers sum them.
    """
    _, iv = _fwd_core(o, d, w, cols, lp, lc, amb, bg, is_t, h, miss,
                      lit, L)
    ox, oy, oz = o
    dx, dy, dz = d
    z = jnp.zeros_like(w)
    g_o = [z, z, z]
    g_d = [z, z, z]
    g_w = z
    gc = {c: z for c in _GRAD_COLS}
    g_point = [z, z, z]
    g_nrm = [z, z, z]
    g_t = z
    g_alpha = z
    g_beta = z
    g_nf = [z, z, z]
    g_mirror = z
    hf, mf = h, miss
    nrm = iv["nrm"]
    point = iv["point"]
    mirror = iv["mirror"]
    col = iv["col"]
    kd, ka, ks, shin = iv["kd"], iv["ka"], iv["ks"], iv["shin"]

    # --- bounce reverse ------------------------------------------------
    g_refl = [jnp.where(hf, EPS_OFFSET * g_o2[i] + g_d2[i], 0.0)
              for i in range(3)]
    for i in range(3):
        g_point[i] += jnp.where(hf, g_o2[i], 0.0)
        g_o[i] += jnp.where(hf, 0.0, g_o2[i])
        g_d[i] += jnp.where(hf, 0.0, g_d2[i])
    g_w += jnp.where(hf, mirror * g_w2, 0.0)
    g_mirror += jnp.where(hf, w * g_w2, 0.0)
    # refl = d - 2 (d.n) n
    ngr = _dot(*nrm, *g_refl)
    dn = iv["dn"]
    g_d[0] += g_refl[0] - 2.0 * nrm[0] * ngr
    g_d[1] += g_refl[1] - 2.0 * nrm[1] * ngr
    g_d[2] += g_refl[2] - 2.0 * nrm[2] * ngr
    for i, di in enumerate((dx, dy, dz)):
        g_nrm[i] += -2.0 * (di * ngr + dn * g_refl[i])

    # --- blend reverse -------------------------------------------------
    wf = iv["wf"]
    g_col = [jnp.where(hf, wf * g_add[i], 0.0) for i in range(3)]
    gdotc = g_add[0] * col[0] + g_add[1] * col[1] + g_add[2] * col[2]
    g_w += jnp.where(hf, (1.0 - mirror) * gdotc, 0.0)
    g_mirror += jnp.where(hf, -w * gdotc, 0.0)
    g_bg = [jnp.where(mf, w * g_add[i], 0.0) for i in range(3)]
    g_w += jnp.where(
        mf, g_add[0] * bg[0] + g_add[1] * bg[1] + g_add[2] * bg[2], 0.0)

    # --- lighting reverse ----------------------------------------------
    g_amb = [g_col[i] * ka[i] for i in range(3)]
    for i in range(3):
        gc[35 + i] += g_col[i] * amb[i]
    g_lp = []
    g_lc = []
    for li in range(L):
        pl_ = iv["per_light"][li]
        ld, diff, spec = pl_["ld"], pl_["diff"], pl_["spec"]
        g_lc.append([g_col[i] * lit[li] * (kd[i] * diff + ks[i] * spec)
                     for i in range(3)])
        g_diff = z
        g_spec = z
        for i in range(3):
            gc[32 + i] += g_col[i] * lc[li][i] * lit[li] * diff
            gc[38 + i] += g_col[i] * lc[li][i] * lit[li] * spec
            g_diff = g_diff + g_col[i] * lc[li][i] * lit[li] * kd[i]
            g_spec = g_spec + g_col[i] * lc[li][i] * lit[li] * ks[i]
        gate, base, cos_rv = pl_["gate"], pl_["base"], pl_["cos_rv"]
        g_base = jnp.where(gate, shin * jnp.power(base, shin - 1.0)
                           * g_spec, 0.0)
        gc[41] += jnp.where(gate, spec * jnp.log(base) * g_spec, 0.0)
        g_cos = g_base  # base = where(gate, cos_rv, 1)
        pos = cos_rv > 0.0
        r = pl_["r"]
        # rv = r . (-d)
        g_r = [jnp.where(pos & gate, g_cos, 0.0) * (-di)
               for di in (dx, dy, dz)]
        rvg = jnp.where(pos & gate, g_cos, 0.0)
        for i, ri in enumerate(r):
            g_d[i] += -rvg * ri
        # r = normalize(m)
        m, invm, okm = pl_["m"], pl_["invm"], pl_["okm"]
        gdotm = g_r[0] * m[0] + g_r[1] * m[1] + g_r[2] * m[2]
        g_invm = gdotm
        g_n2m = jnp.where(okm, -0.5 * invm * invm * invm * g_invm, 0.0)
        g_m = [g_r[i] * invm + 2.0 * m[i] * g_n2m for i in range(3)]
        # m = 2 (ld.n) n - ld
        ln = pl_["ln"]
        ngm = _dot(*nrm, *g_m)
        g_ld = [2.0 * ngm * nrm[i] - g_m[i] for i in range(3)]
        for i in range(3):
            g_nrm[i] += 2.0 * (ngm * ld[i] + ln * g_m[i])
        # diff = max(0, n.ld)
        dpos = diff > 0.0
        gd_ = jnp.where(dpos, g_diff, 0.0)
        for i in range(3):
            g_nrm[i] += gd_ * ld[i]
            g_ld[i] += gd_ * nrm[i]
        # ld = normalize(lv)
        lv, invl, okl = pl_["lv"], pl_["invl"], pl_["okl"]
        gdotl = g_ld[0] * lv[0] + g_ld[1] * lv[1] + g_ld[2] * lv[2]
        g_invl = gdotl
        g_n2l = jnp.where(okl, -0.5 * invl * invl * invl * g_invl, 0.0)
        g_lv = [g_ld[i] * invl + 2.0 * lv[i] * g_n2l for i in range(3)]
        g_lp.append(list(g_lv))
        for i in range(3):
            g_point[i] += -g_lv[i]

    # --- mirror leaf ----------------------------------------------------
    gc[42] += jnp.where(is_t, g_mirror, 0.0)

    # --- point / re-projection reverse ---------------------------------
    nf, q, dd = iv["nf"], iv["q"], iv["dd"]
    g_pr = [jnp.where(is_t, g_point[i], 0.0) for i in range(3)]
    g_P = [jnp.where(is_t, 0.0, g_point[i]) for i in range(3)]
    nfg = _dot(*nf, *g_pr)
    for i in range(3):
        g_P[i] += g_pr[i] - nf[i] * nfg
        gc[6 + i] += nf[i] * nfg                       # p2 via q
        g_nf[i] += -(q[i] * nfg + dd * g_pr[i])
    # P = o + t d
    t_use = iv["t_use"]
    for i, di in enumerate((dx, dy, dz)):
        g_o[i] += g_P[i]
        g_d[i] += t_use * g_P[i]
        g_t += di * g_P[i]

    # --- normal select reverse ------------------------------------------
    phong, alpha, beta, gamma = (iv["phong"], iv["alpha"], iv["beta"],
                                 iv["gamma"])
    n0, n1, n2v = iv["n0"], iv["n1"], iv["n2v"]
    g_nsel = [jnp.where(is_t, g_nrm[i], 0.0) for i in range(3)]
    g_nph = [jnp.where(phong, g_nsel[i], 0.0) for i in range(3)]
    g_nf2 = [jnp.where(phong, 0.0, g_nsel[i]) for i in range(3)]
    for i in range(3):
        g_nf[i] += g_nf2[i]
        gc[16 + i] += alpha * g_nph[i]
        gc[19 + i] += beta * g_nph[i]
        gc[22 + i] += gamma * g_nph[i]
        g_alpha += g_nph[i] * (n0[i] - n2v[i])
        g_beta += g_nph[i] * (n1[i] - n2v[i])

    # --- flat normal reverse --------------------------------------------
    cr, invf, okf = iv["cr"], iv["invf"], iv["okf"]
    e1, e2 = iv["e1"], iv["e2"]
    gdotf = g_nf[0] * cr[0] + g_nf[1] * cr[1] + g_nf[2] * cr[2]
    g_invf = gdotf
    g_n2f = jnp.where(okf, -0.5 * invf * invf * invf * g_invf, 0.0)
    g_cr = [g_nf[i] * invf + 2.0 * cr[i] * g_n2f for i in range(3)]
    g_e1 = _cross(*e2, *g_cr)
    g_e2 = _cross(*g_cr, *e1)
    for i in range(3):
        gc[3 + i] += g_e1[i]                            # p1
        gc[6 + i] += g_e2[i]                            # p2
        gc[0 + i] += -g_e1[i] - g_e2[i]                 # p0

    # --- Cramer reverse --------------------------------------------------
    s, Dt, Da, Db = iv["s"], iv["Dt"], iv["Da"], iv["Db"]
    ok_s, inv_s, valid = iv["ok_s"], iv["inv_s"], iv["valid"]
    c1, c2, c3, c4 = iv["c1"], iv["c2"], iv["c3"], iv["c4"]
    g_t_raw = jnp.where(is_t & valid, g_t, 0.0)
    g_Dt = g_t_raw * inv_s
    g_Da = g_alpha * inv_s
    g_Db = g_beta * inv_s
    g_inv_s = g_t_raw * Dt + g_alpha * Da + g_beta * Db
    g_s = jnp.where(ok_s, -inv_s * inv_s * g_inv_s, 0.0)
    g_c1 = [z, z, z]
    g_c2 = [z, z, z]
    g_c3 = [z, z, z]
    g_c4 = [z, z, z]

    def acc_det(gv, ga, gb, gcc, a, b, c):
        bxc = _cross(*b, *c)
        cxa = _cross(*c, *a)
        axb = _cross(*a, *b)
        for i in range(3):
            ga[i] += gv * bxc[i]
            gb[i] += gv * cxa[i]
            gcc[i] += gv * axb[i]

    acc_det(g_s, g_c1, g_c2, g_c3, c1, c2, c3)
    acc_det(g_Dt, g_c1, g_c2, g_c4, c1, c2, c4)
    acc_det(g_Da, g_c4, g_c2, g_c3, c4, c2, c3)
    acc_det(g_Db, g_c1, g_c4, g_c3, c1, c4, c3)
    for i in range(3):
        gc[0 + i] += g_c1[i]
        gc[3 + i] += g_c2[i]
        gc[6 + i] += -g_c1[i] - g_c2[i] - g_c4[i]
        g_o[i] += g_c4[i]
        g_d[i] += -g_c3[i]

    return (tuple(g_o), tuple(g_d), g_w, gc,
            [tuple(x) for x in g_lp], [tuple(x) for x in g_lc],
            tuple(g_amb), tuple(g_bg))


# --------------------------------------------------------------------------
# array-shaped reference executors (CPU / tests / interpret path)
# --------------------------------------------------------------------------

def _args_of(o, d, w, rows48, light_pos, light_color, ambience,
             background, is_t, h, miss, lit):
    L = light_pos.shape[0]
    cols = {c: rows48[:, c] for c in _COLS}
    lp = [[light_pos[li, i] for i in range(3)] for li in range(L)]
    lc = [[light_color[li, i] for i in range(3)] for li in range(L)]
    amb = [ambience[i] for i in range(3)]
    bg = [background[i] for i in range(3)]
    litl = [lit[li] for li in range(L)]
    return ((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), w,
            cols, lp, lc, amb, bg, is_t, h, miss, litl, L)


def segment_ref(o, d, w, rows48, light_pos, light_color, ambience,
                background, is_t, h, miss, lit):
    """Plain-JAX shade segment (value == tracer.trace_shade's body).

    lit is the float (~shadow) mask [L, R].
    """
    args = _args_of(o, d, w, rows48, light_pos, light_color, ambience,
                    background, is_t, h, miss, lit)
    (add, o2, d2, w2), _ = _fwd_core(*args)
    return (jnp.stack(add, axis=-1), jnp.stack(o2, axis=-1),
            jnp.stack(d2, axis=-1), w2)


def segment_bwd_ref(o, d, w, rows48, light_pos, light_color, ambience,
                    background, is_t, h, miss, lit,
                    g_add, g_o2, g_d2, g_w2):
    """Hand-derived VJP of :func:`segment_ref` (array-shaped)."""
    args = _args_of(o, d, w, rows48, light_pos, light_color, ambience,
                    background, is_t, h, miss, lit)
    (g_o, g_d, g_w, gc, g_lp, g_lc, g_amb, g_bg) = _bwd_core(
        *args,
        g_add=(g_add[:, 0], g_add[:, 1], g_add[:, 2]),
        g_o2=(g_o2[:, 0], g_o2[:, 1], g_o2[:, 2]),
        g_d2=(g_d2[:, 0], g_d2[:, 1], g_d2[:, 2]),
        g_w2=g_w2)
    R = o.shape[0]
    g_rows = jnp.zeros((R, rows48.shape[1]), o.dtype)
    for c in _GRAD_COLS:
        g_rows = g_rows.at[:, c].set(gc[c])
    g_lp_a = jnp.stack([jnp.stack([jnp.sum(x) for x in row])
                        for row in g_lp])
    g_lc_a = jnp.stack([jnp.stack([jnp.sum(x) for x in row])
                        for row in g_lc])
    g_amb_a = jnp.stack([jnp.sum(x) for x in g_amb])
    g_bg_a = jnp.stack([jnp.sum(x) for x in g_bg])
    return (jnp.stack(g_o, axis=-1), jnp.stack(g_d, axis=-1), g_w,
            g_rows, g_lp_a, g_lc_a, g_amb_a, g_bg_a)


# --------------------------------------------------------------------------
# Pallas executors
# --------------------------------------------------------------------------

def _pad1(x, pad):
    return jnp.pad(x, (0, pad)) if pad else x


def _vec_spec():
    return pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM)


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.SMEM)


def _kernel_args(refs, L):
    """Unpack the shared vec-input prefix -> core argument tuple."""
    n_cols = len(_COLS)
    (ox, oy, oz, dx, dy, dz, w, it_r, h_r, ms_r) = refs[:10]
    lit_rs = refs[10:10 + L]
    col_rs = refs[10 + L:10 + L + n_cols]
    lp_r, lc_r, env_r = refs[10 + L + n_cols:10 + L + n_cols + 3]
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    cols = {c: col_rs[k][:] for k, c in enumerate(_COLS)}
    lp = [[lp_r[li, i] for i in range(3)] for li in range(L)]
    lc = [[lc_r[li, i] for i in range(3)] for li in range(L)]
    amb = [env_r[0, i] for i in range(3)]
    bg = [env_r[1, i] for i in range(3)]
    lit = [lit_rs[li][:] for li in range(L)]
    return (o, d, w[:], cols, lp, lc, amb, bg,
            it_r[:] > 0, h_r[:] > 0, ms_r[:] > 0, lit, L,
            10 + L + n_cols + 3)


def _seg_fwd_kernel(*refs, L):
    (o, d, w, cols, lp, lc, amb, bg, is_t, h, miss, lit, L_,
     n_in) = _kernel_args(refs, L)
    outs = refs[n_in:]
    (add, o2, d2, w2), _ = _fwd_core(o, d, w, cols, lp, lc, amb, bg,
                                     is_t, h, miss, lit, L)
    for i in range(3):
        outs[i][:] = add[i]
        outs[3 + i][:] = o2[i]
        outs[6 + i][:] = d2[i]
    outs[9][:] = w2


def _seg_bwd_kernel(*refs, L):
    (o, d, w, cols, lp, lc, amb, bg, is_t, h, miss, lit, L_,
     n_in) = _kernel_args(refs, L)
    g_refs = refs[n_in:n_in + 10]
    outs = refs[n_in + 10:]
    g_add = (g_refs[0][:], g_refs[1][:], g_refs[2][:])
    g_o2 = (g_refs[3][:], g_refs[4][:], g_refs[5][:])
    g_d2 = (g_refs[6][:], g_refs[7][:], g_refs[8][:])
    g_w2 = g_refs[9][:]
    (g_o, g_d, g_w, gc, g_lp, g_lc, g_amb, g_bg) = _bwd_core(
        o, d, w, cols, lp, lc, amb, bg, is_t, h, miss, lit, L,
        g_add=g_add, g_o2=g_o2, g_d2=g_d2, g_w2=g_w2)
    k = 0
    for i in range(3):
        outs[k][:] = g_o[i]; k += 1
    for i in range(3):
        outs[k][:] = g_d[i]; k += 1
    outs[k][:] = g_w; k += 1
    for c in _GRAD_COLS:
        outs[k][:] = gc[c]; k += 1
    for li in range(L):
        for i in range(3):
            outs[k][:] = g_lp[li][i]; k += 1
        for i in range(3):
            outs[k][:] = g_lc[li][i]; k += 1
    for i in range(3):
        outs[k][:] = g_amb[i]; k += 1
    for i in range(3):
        outs[k][:] = g_bg[i]; k += 1


def _vec_inputs(o, d, w, rows48, is_t, h, miss, lit, pad):
    return (
        [_pad1(o[:, k], pad) for k in range(3)]
        + [_pad1(d[:, k], pad) for k in range(3)]
        + [_pad1(w, pad),
           _pad1(is_t, pad), _pad1(h, pad), _pad1(miss, pad)]
        + [_pad1(lit[li], pad) for li in range(lit.shape[0])]
        + [_pad1(rows48[:, c], pad) for c in _COLS]
    )


def segment_pallas(o, d, w, rows48, light_pos, light_color, ambience,
                   background, is_t, h, miss, lit, interpret=False):
    """Pallas forward (same contract as :func:`segment_ref`; float masks)."""
    R = o.shape[0]
    L = light_pos.shape[0]
    n_chunks = (R + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - R
    Rp = R + pad
    env = jnp.stack([ambience, background])
    vec_in = _vec_inputs(o, d, w, rows48, is_t, h, miss, lit, pad)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[_vec_spec()] * len(vec_in)
        + [_smem_spec((L, 3)), _smem_spec((L, 3)), _smem_spec((2, 3))],
        out_specs=[_vec_spec()] * 10,
    )
    outs = pl.pallas_call(
        functools.partial(_seg_fwd_kernel, L=L),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Rp,), jnp.float32)] * 10,
        interpret=interpret,
    )(*vec_in, light_pos, light_color, env)
    add = jnp.stack([outs[0][:R], outs[1][:R], outs[2][:R]], axis=1)
    o2 = jnp.stack([outs[3][:R], outs[4][:R], outs[5][:R]], axis=1)
    d2 = jnp.stack([outs[6][:R], outs[7][:R], outs[8][:R]], axis=1)
    return add, o2, d2, outs[9][:R]


def segment_bwd_pallas(o, d, w, rows48, light_pos, light_color, ambience,
                       background, is_t, h, miss, lit,
                       g_add, g_o2, g_d2, g_w2, interpret=False):
    """Pallas backward (same contract as :func:`segment_bwd_ref`)."""
    R = o.shape[0]
    L = light_pos.shape[0]
    n_chunks = (R + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - R
    Rp = R + pad
    env = jnp.stack([ambience, background])
    vec_in = _vec_inputs(o, d, w, rows48, is_t, h, miss, lit, pad)
    g_in = (
        [_pad1(g_add[:, k], pad) for k in range(3)]
        + [_pad1(g_o2[:, k], pad) for k in range(3)]
        + [_pad1(g_d2[:, k], pad) for k in range(3)]
        + [_pad1(g_w2, pad)]
    )
    n_out = 7 + len(_GRAD_COLS) + 6 * L + 6
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[_vec_spec()] * len(vec_in)
        + [_smem_spec((L, 3)), _smem_spec((L, 3)), _smem_spec((2, 3))]
        + [_vec_spec()] * 10,
        out_specs=[_vec_spec()] * n_out,
    )
    outs = pl.pallas_call(
        functools.partial(_seg_bwd_kernel, L=L),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Rp,), jnp.float32)] * n_out,
        interpret=interpret,
    )(*vec_in, light_pos, light_color, env, *g_in)
    k = 0
    g_o = jnp.stack([outs[k][:R], outs[k + 1][:R], outs[k + 2][:R]],
                    axis=1); k += 3
    g_d = jnp.stack([outs[k][:R], outs[k + 1][:R], outs[k + 2][:R]],
                    axis=1); k += 3
    g_w = outs[k][:R]; k += 1
    gcol = jnp.stack([outs[k + j][:R] for j in range(len(_GRAD_COLS))],
                     axis=1)                              # [R, 29]
    k += len(_GRAD_COLS)
    g_rows = jnp.zeros((R, rows48.shape[1]), o.dtype)
    g_rows = g_rows.at[:, jnp.asarray(_GRAD_COLS)].set(gcol)
    g_lp = []
    g_lc = []
    for li in range(L):
        g_lp.append([jnp.sum(outs[k + j][:R]) for j in range(3)]); k += 3
        g_lc.append([jnp.sum(outs[k + j][:R]) for j in range(3)]); k += 3
    g_amb = jnp.stack([jnp.sum(outs[k + j][:R]) for j in range(3)]); k += 3
    g_bg = jnp.stack([jnp.sum(outs[k + j][:R]) for j in range(3)])
    g_lp_a = jnp.stack([jnp.stack(x) for x in g_lp])
    g_lc_a = jnp.stack([jnp.stack(x) for x in g_lc])
    return g_o, g_d, g_w, g_rows, g_lp_a, g_lc_a, g_amb, g_bg


# --------------------------------------------------------------------------
# custom_vjp dispatcher
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def shade_segment(impl, o, d, w, tri_pack, tif, light_pos, light_color,
                  ambience, background, is_t, h, miss, lit):
    """One differentiable Whitted shading segment with a fused VJP.

    ``impl``: "pallas" | "interpret" | "ref" (static). ``tri_pack`` is
    the WHOLE [T,48] packed-row table and ``tif`` the per-ray triangle
    index AS FLOAT (exact for T < 2^24) — the gather lives INSIDE the
    op so the saved residuals are the (loop-invariant) table plus tiny
    per-ray inputs, never a per-tile [R,48] copy; this is what lets the
    caller drop jax.checkpoint without stacking big residuals. All mask
    args are FLOAT 0/1 arrays (custom_vjp wants float cotangent slots);
    their cotangents are zeros. Value and gradients equal the plain-JAX
    replay's (tests/test_shade_grad.py).
    """
    return _seg_fwd_dispatch(impl, o, d, w, tri_pack, tif, light_pos,
                             light_color, ambience, background, is_t, h,
                             miss, lit)


def _seg_fwd_dispatch(impl, o, d, w, tri_pack, tif, lp, lc, amb, bg,
                      is_t, h, miss, lit):
    # the forward VALUE always runs as plain JAX: XLA fuses the row
    # gather's column slices straight into the consuming elementwise ops
    # (measured ~13 ms/frame), while a kernel boundary here would
    # materialize 30 per-ray columns (~24 ms/frame of pure relayout).
    # `impl` picks the BACKWARD executor only.
    rows48 = tri_pack[tif.astype(jnp.int32)]
    return segment_ref(o, d, w, rows48, lp, lc, amb, bg,
                       is_t > 0.5, h > 0.5, miss > 0.5, lit)


def _seg_fwd_rule(impl, o, d, w, tri_pack, tif, lp, lc, amb, bg, is_t,
                  h, miss, lit):
    out = _seg_fwd_dispatch(impl, o, d, w, tri_pack, tif, lp, lc, amb,
                            bg, is_t, h, miss, lit)
    return out, (o, d, w, tri_pack, tif, lp, lc, amb, bg, is_t, h, miss,
                 lit)


def _seg_bwd_rule(impl, res, cots):
    (o, d, w, tri_pack, tif, lp, lc, amb, bg, is_t, h, miss, lit) = res
    g_add, g_o2, g_d2, g_w2 = cots
    ti = tif.astype(jnp.int32)
    rows48 = tri_pack[ti]
    if impl == "ref":
        g = segment_bwd_ref(o, d, w, rows48, lp, lc, amb, bg,
                            is_t > 0.5, h > 0.5, miss > 0.5, lit,
                            g_add, g_o2, g_d2, g_w2)
    else:
        g = segment_bwd_pallas(o, d, w, rows48, lp, lc, amb, bg, is_t,
                               h, miss, lit, g_add, g_o2, g_d2, g_w2,
                               interpret=(impl == "interpret"))
    g_o, g_d, g_w, g_rows, g_lp, g_lc, g_amb, g_bg = g
    g_pack = jnp.zeros_like(tri_pack).at[ti].add(g_rows)
    return (g_o, g_d, g_w, g_pack, jnp.zeros_like(tif), g_lp, g_lc,
            g_amb, g_bg, jnp.zeros_like(is_t), jnp.zeros_like(h),
            jnp.zeros_like(miss), jnp.zeros_like(lit))


shade_segment.defvjp(_seg_fwd_rule, _seg_bwd_rule)
