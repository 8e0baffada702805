"""Fused Pallas shading kernels for the non-differentiated trace path.

Round-3 tracing showed the office forward spending ~75 ms/frame in ~20
small XLA fusions BETWEEN the traversal megakernels — hit resolve,
shadow-ray setup, and Phong, each a separate [R,*] HBM round trip with
its own dispatch cost (ops/pallas_cluster.py holds the traversal; this
module fuses everything around it). Two kernels per Whitted segment:

  pre  (resolve + shadow setup)   one pass over the tile: re-solve the
       hit triangle's barycentrics from the gathered tri_pack columns
       (shade.ShadeGeom layout), resolve analytic sphere/plane/cylinder
       hits from the gathered ana16 rows, build the shading normal
       (flat/Phong select, reference conventions incl. UNnormalized
       Phong normals, mymesh.cpp:231-234), re-project the hit point onto
       the exact surface, compute the nearest-texel atlas index for
       textured triangles (the fetch itself stays an XLA gather), and
       emit the LIGHT-major shadow-ray batch (origin/dir/dist/
       active-with-facing-cull) for the any-hit traversal kernel
       (light-major measured ~7 ms/frame faster than ray-major on the
       office shadow kernel: each light's coherent ray cone stays in its
       own compaction subgroups).

  phong (lighting + bounce)       ambient + per-light diffuse/specular
       with the recorded shadow mask (mytracer.cpp:568-608 math), the
       texture override of the diffuse color (mytracer_gpu.cu:511-544
       shades the texel inline the same way), the Whitted blend add, and
       the mirror-bounce next-ray state (mytracer_gpu.cu:265-296).

The reference's single GPU kernel handles EVERY primitive kind and
textures in one pass (trace_device, mytracer_gpu.cu:237-312); rounds 2-4
of this tier covered only untextured triangle-only scenes, which this
round lifts: the per-kind hit resolve (sphere normal/snap, plane
projection, cylinder tube normal with the viewer flip — the same math as
shade.resolve_hit) runs in-kernel on gathered analytic rows, selected by
the per-ray hit ``kind``.

Layout discipline: every per-ray quantity crosses the kernel boundary as
its own 1-D array. Mosaic's 1-D T(1024) tiling packs 8x128 consecutive
elements per vreg, so elementwise math runs at full VPU width; 2-D
[R, small] blocks would pad the lane dimension to 128 and waste 128x of
both VMEM and vector throughput (the first cut of this module OOM'd
scoped VMEM exactly that way). Material properties are NOT per-ray
columns: each ray carries its material id and the kernels select from
the whole (small) material table in-kernel — a strided column extraction
from the [R,48] gather output costs a lane relayout the trace bills at
milliseconds, a table select costs Mt vector FMAs. Light and material
constants ride in SMEM as true scalars.

The per-ray gathers (tri_pack rows by hit id, ana16 rows by analytic
hit id, texel RGB by the kernel-computed atlas index) stay in XLA — its
gather engine is the right tool; everything elementwise moves in-kernel.

These kernels have no VJP: they serve trace() when it is NOT being
differentiated (render / render_aa / bench forward). The differentiable
paths (trace_shade replay, direct grad-of-trace) keep the XLA shading —
TraceConfig.fused_shade defaults OFF and the fwd drivers opt in.

Correctness is pinned against the XLA path in tests/test_pallas_shade.py
(interpret mode on CPU: tri-only, textured, analytic-only and mixed
scenes) and spot-checked on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops.shade import EPS_OFFSET

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_OK = True
except Exception:  # pragma: no cover
    PALLAS_OK = False

#: rays per kernel block (1-D f32 blocks: ~50 operands x 32 KB, well
#: inside scoped VMEM)
CHUNK = 8192

#: tri_pack columns consumed by the pre kernel (ShadeGeom layout):
#: p0 p1 p2 (9) | n0 n1 n2 at 16.. (9) | phong flag 25 | mat id 26
_PRE_COLS = tuple(range(0, 9)) + tuple(range(16, 25)) + (25, 26)

#: extra tri_pack columns for textured scenes: corner UVs (9..14) and
#: the per-triangle texture record as floats (27 W, 28 H, 29 offset;
#: W <= 0 means untextured — shade.pack_shade_geom)
_TEX_COLS = tuple(range(9, 15)) + (27, 28, 29)

#: ana16 columns (ShadeGeom.ana16): 0-2 center, 3-5 aux vector (plane
#: normal / cylinder axis), 6 radius, 7 height, 8 material id
_ANA_COLS = tuple(range(0, 9))

#: material-table select bound: the in-kernel select unrolls over the
#: scene's ACTUAL material count (Mt compares + ~12*Mt FMAs per ray
#: chunk, full VPU width), so cost is linear in Mt, not in this cap.
#: 64 keeps the worst-case unroll well under the dense-solve cost;
#: larger tables fall back to the XLA shading path.
MAX_MATERIALS = 64

#: hit kinds (shade.py): 0 miss, 1 sphere, 2 plane, 3 tri, 4 cylinder
_K_SPHERE, _K_PLANE, _K_TRI, _K_CYL = 1, 2, 3, 4

#: mat16 row layout (shade.pack_shade_geom): kd kd kd ka ka ka ks ks ks
#: shin mirror shadowable
_M_KD, _M_KA, _M_KS, _M_SHIN, _M_MIRROR, _M_SHADOW = 0, 3, 6, 9, 10, 11


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _safe_rsqrt(n2, eps=1e-20):
    """vm.normalize guard semantics: zero-ish vectors normalize to 0."""
    ok = n2 > eps
    return jnp.where(ok, jax.lax.rsqrt(jnp.maximum(n2, eps)), 0.0)


def _mat_select(mid, mat_r, Mt, cols):
    """Select material scalars by id: out[c] = mat16[mid, c] per ray.

    Static unroll over the Mt table rows; each column costs Mt vector
    FMAs on the already-loaded one-hot masks.
    """
    sels = [(mid == m).astype(jnp.float32) for m in range(Mt)]
    out = []
    for c in cols:
        acc = sels[0] * mat_r[0, c]
        for m in range(1, Mt):
            acc = acc + sels[m] * mat_r[m, c]
        out.append(acc)
    return out


def _pre_kernel(*refs, L: int, Mt: int, has_tri: bool, has_ana: bool,
                has_tex: bool, atlas_hi: int):
    """Resolve + shadow-setup for one CHUNK of rays (see module doc)."""
    it = iter(refs)
    ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, t_r, kind_r, live_r = (
        next(it) for _ in range(9))
    c = {}
    if has_tri:
        for k in _PRE_COLS + (_TEX_COLS if has_tex else ()):
            c[k] = next(it)
    if has_ana:
        a = [next(it) for _ in _ANA_COLS]
    lp_r = next(it)
    mat_r = next(it)
    px_o, py_o, pz_o, nx_o, ny_o, nz_o, mid_o = (next(it) for _ in range(7))
    if has_tex:
        tex_o = next(it)
    light_outs = list(it)

    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    kind = kind_r[:]
    live = live_r[:] > 0
    valid = kind > 0
    # misses carry t = INF; o + INF*d would poison gated lanes with
    # inf/NaN through the where-multiplies below, so sanitize first
    t = jnp.where(valid, t_r[:], 0.0)

    # generic hit point; per-kind branches snap it onto the exact
    # surface (shade.resolve_hit's fp32 acne reprojection)
    gx = ox + t * dx
    gy = oy + t * dy
    gz = oz + t * dz

    px, py, pz = gx, gy, gz
    nmx = jnp.zeros_like(gx)
    nmy = jnp.zeros_like(gx)
    nmz = jnp.zeros_like(gx)
    midf = jnp.zeros_like(gx)

    if has_tri:
        is_t = kind == _K_TRI
        p0x, p0y, p0z = c[0][:], c[1][:], c[2][:]
        p1x, p1y, p1z = c[3][:], c[4][:], c[5][:]
        p2x, p2y, p2z = c[6][:], c[7][:], c[8][:]

        c1x, c1y, c1z = p0x - p2x, p0y - p2y, p0z - p2z
        c2x, c2y, c2z = p1x - p2x, p1y - p2y, p1z - p2z
        nx, ny, nz = _cross3(c1x, c1y, c1z, c2x, c2y, c2z)     # N = c1 x c2
        wx, wy, wz = _cross3(ox, oy, oz, dx, dy, dz)           # w = o x d
        k2x, k2y, k2z = _cross3(p2x, p2y, p2z, c2x, c2y, c2z)  # p2 x c2
        k1x, k1y, k1z = _cross3(c1x, c1y, c1z, p2x, p2y, p2z)  # c1 x p2

        s = -_dot3(nx, ny, nz, dx, dy, dz)
        s_ok = jnp.abs(s) > isx.EPS_DET
        inv_s = jnp.where(s_ok, 1.0 / jnp.where(s_ok, s, 1.0), 0.0)
        alpha = (_dot3(c2x, c2y, c2z, wx, wy, wz)
                 + _dot3(k2x, k2y, k2z, dx, dy, dz)) * inv_s
        beta = (-_dot3(c1x, c1y, c1z, wx, wy, wz)
                + _dot3(k1x, k1y, k1z, dx, dy, dz)) * inv_s
        gamma = 1.0 - alpha - beta

        # unit flat normal (vm.normalize semantics)
        inv_n = _safe_rsqrt(_dot3(nx, ny, nz, nx, ny, nz))
        fx, fy, fz = nx * inv_n, ny * inv_n, nz * inv_n

        # Phong normal: UNnormalized barycentric blend (parity,
        # mymesh.cpp:231-234); select per-triangle by the packed flag
        phong = c[25][:] > 0.5
        tnx = jnp.where(phong,
                        alpha * c[16][:] + beta * c[19][:] + gamma * c[22][:],
                        fx)
        tny = jnp.where(phong,
                        alpha * c[17][:] + beta * c[20][:] + gamma * c[23][:],
                        fy)
        tnz = jnp.where(phong,
                        alpha * c[18][:] + beta * c[21][:] + gamma * c[24][:],
                        fz)

        # hit point re-projected onto the triangle plane (fp32 acne
        # guard, shade.resolve_hit)
        off = _dot3(fx, fy, fz, gx - p2x, gy - p2y, gz - p2z)
        px = jnp.where(is_t, gx - off * fx, px)
        py = jnp.where(is_t, gy - off * fy, py)
        pz = jnp.where(is_t, gz - off * fz, pz)
        nmx = jnp.where(is_t, tnx, nmx)
        nmy = jnp.where(is_t, tny, nmy)
        nmz = jnp.where(is_t, tnz, nmz)
        # material id rides in the gathered row (shade.pack_shade_geom
        # col 26) — exact for ids < 2^24
        midf = jnp.where(is_t, c[26][:], midf)

        if has_tex:
            # nearest-neighbor atlas index (ops/texture.sample_nearest
            # parity: clamp UV, v-flip, round); the fetch is an XLA
            # gather outside. All arithmetic stays on exact f32
            # integers (< 2^24, gated by resolved_fused_shade).
            u = alpha * c[9][:] + beta * c[10][:] + gamma * c[11][:]
            v = alpha * c[12][:] + beta * c[13][:] + gamma * c[14][:]
            tw = jnp.maximum(c[27][:], 1.0)
            th = jnp.maximum(c[28][:], 1.0)
            toff = jnp.maximum(c[29][:], 0.0)
            uc = jnp.clip(u, 0.0, 1.0)
            vc = jnp.clip(v, 0.0, 1.0)
            fpx = jnp.round(uc * (tw - 1.0))
            fpy = jnp.round((1.0 - vc) * (th - 1.0))
            flat = jnp.clip(toff + fpy * tw + fpx, 0.0, float(atlas_hi))
            textured = is_t & (c[27][:] > 0.5)
            tex_o[:] = jnp.where(textured, flat.astype(jnp.int32), -1)
    elif has_tex:  # pragma: no cover - gate requires tris for textures
        tex_o[:] = jnp.full_like(kind, -1)

    if has_ana:
        is_s = kind == _K_SPHERE
        is_p = kind == _K_PLANE
        is_c = kind == _K_CYL
        is_a = is_s | is_p | is_c
        cx, cy, cz = a[0][:], a[1][:], a[2][:]
        bx, by, bz = a[3][:], a[4][:], a[5][:]
        rr = a[6][:]
        amid = a[8][:]

        relx, rely, relz = gx - cx, gy - cy, gz - cz

        # sphere: n = normalize(p - c), snap p = c + r*n
        # (shade.resolve_hit sphere branch)
        inv_s = _safe_rsqrt(_dot3(relx, rely, relz, relx, rely, relz))
        nsx, nsy, nsz = relx * inv_s, rely * inv_s, relz * inv_s
        psx, psy, psz = cx + rr * nsx, cy + rr * nsy, cz + rr * nsz

        # plane: normal = aux, snap = project onto the plane
        offp = _dot3(bx, by, bz, relx, rely, relz)
        ppx, ppy, ppz = gx - offp * bx, gy - offp * by, gz - offp * bz

        # cylinder: foot = c + (rel.axis)*axis; n0 = normalize(p - foot);
        # snap p = foot + r*n0; normal flips toward the viewer for rays
        # inside the tube (shade.resolve_hit cylinder branch order:
        # the snap uses the UNflipped direction)
        axial = _dot3(relx, rely, relz, bx, by, bz)
        fcx = relx - axial * bx
        fcy = rely - axial * by
        fcz = relz - axial * bz
        inv_f = _safe_rsqrt(_dot3(fcx, fcy, fcz, fcx, fcy, fcz))
        n0x, n0y, n0z = fcx * inv_f, fcy * inv_f, fcz * inv_f
        pcx = (cx + axial * bx) + rr * n0x
        pcy = (cy + axial * by) + rr * n0y
        pcz = (cz + axial * bz) + rr * n0z
        flip = _dot3(n0x, n0y, n0z, dx, dy, dz) > 0
        ncx = jnp.where(flip, -n0x, n0x)
        ncy = jnp.where(flip, -n0y, n0y)
        ncz = jnp.where(flip, -n0z, n0z)

        px = jnp.where(is_s, psx, jnp.where(is_p, ppx,
                                            jnp.where(is_c, pcx, px)))
        py = jnp.where(is_s, psy, jnp.where(is_p, ppy,
                                            jnp.where(is_c, pcy, py)))
        pz = jnp.where(is_s, psz, jnp.where(is_p, ppz,
                                            jnp.where(is_c, pcz, pz)))
        nmx = jnp.where(is_s, nsx, jnp.where(is_p, bx,
                                             jnp.where(is_c, ncx, nmx)))
        nmy = jnp.where(is_s, nsy, jnp.where(is_p, by,
                                             jnp.where(is_c, ncy, nmy)))
        nmz = jnp.where(is_s, nsz, jnp.where(is_p, bz,
                                             jnp.where(is_c, ncz, nmz)))
        midf = jnp.where(is_a, amid, midf)

    px_o[:], py_o[:], pz_o[:] = px, py, pz
    nx_o[:], ny_o[:], nz_o[:] = nmx, nmy, nmz
    mid = jnp.where(valid, midf, 0.0).astype(jnp.int32)
    mid_o[:] = mid

    (shadowable,) = _mat_select(mid, mat_r, Mt, (_M_SHADOW,))
    cast = valid & live & (shadowable > 0.5)
    for li in range(L):
        lx = lp_r[li, 0]
        ly = lp_r[li, 1]
        lz = lp_r[li, 2]
        lvx, lvy, lvz = lx - px, ly - py, lz - pz
        dist2 = _dot3(lvx, lvy, lvz, lvx, lvy, lvz)
        dist = jnp.sqrt(dist2)
        inv = _safe_rsqrt(dist2)
        ldx, ldy, ldz = lvx * inv, lvy * inv, lvz * inv
        facing = _dot3(nmx, nmy, nmz, ldx, ldy, ldz) > 0.0
        (sox_o, soy_o, soz_o, sdx_o, sdy_o, sdz_o, st_o, sact_o) = (
            light_outs[8 * li:8 * li + 8])
        sox_o[:] = px + EPS_OFFSET * ldx
        soy_o[:] = py + EPS_OFFSET * ldy
        soz_o[:] = pz + EPS_OFFSET * ldz
        sdx_o[:], sdy_o[:], sdz_o[:] = ldx, ldy, ldz
        st_o[:] = dist
        sact_o[:] = (cast & facing).astype(jnp.int32)


def _phong_kernel(*refs, L: int, Mt: int, has_tex: bool):
    """Phong lighting from the shadow mask + Whitted blend + bounce."""
    it = iter(refs)
    (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, w_r, valid_r, live_r, mid_r,
     px_r, py_r, pz_r, nx_r, ny_r, nz_r) = (next(it) for _ in range(16))
    if has_tex:
        txr_r, txg_r, txb_r, txm_r = (next(it) for _ in range(4))
    shadow_rs = [next(it) for _ in range(L)]
    lp_r, lc_r, env_r, mat_r = (next(it) for _ in range(4))
    (ar_o, ag_o, ab_o, o2x_o, o2y_o, o2z_o,
     d2x_o, d2y_o, d2z_o, w2_o) = (next(it) for _ in range(10))

    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    weight = w_r[:]
    valid = valid_r[:] > 0
    live = live_r[:] > 0
    px, py, pz = px_r[:], py_r[:], pz_r[:]
    nmx, nmy, nmz = nx_r[:], ny_r[:], nz_r[:]

    (kdx, kdy, kdz, kax, kay, kaz, ksx, ksy, ksz, shin, mir) = _mat_select(
        mid_r[:], mat_r, Mt,
        (_M_KD, _M_KD + 1, _M_KD + 2, _M_KA, _M_KA + 1, _M_KA + 2,
         _M_KS, _M_KS + 1, _M_KS + 2, _M_SHIN, _M_MIRROR))
    if has_tex:
        # texture overrides the diffuse color only (shade.resolve_hit's
        # diffuse_override; GPU twin mytracer_gpu.cu:511-544)
        tm = txm_r[:] > 0
        kdx = jnp.where(tm, txr_r[:], kdx)
        kdy = jnp.where(tm, txg_r[:], kdy)
        kdz = jnp.where(tm, txb_r[:], kdz)
    mirror = jnp.where(valid, mir, 0.0)

    cr = env_r[0, 0] * kax
    cg = env_r[0, 1] * kay
    cb = env_r[0, 2] * kaz

    for li in range(L):
        lx = lp_r[li, 0]
        ly = lp_r[li, 1]
        lz = lp_r[li, 2]
        lvx, lvy, lvz = lx - px, ly - py, lz - pz
        inv = _safe_rsqrt(_dot3(lvx, lvy, lvz, lvx, lvy, lvz))
        ldx, ldy, ldz = lvx * inv, lvy * inv, lvz * inv
        diff = jnp.maximum(0.0, _dot3(nmx, nmy, nmz, ldx, ldy, ldz))

        # specular: r = normalize(mirror(l, n)) = normalize(2 (l.n) n - l)
        ln = _dot3(ldx, ldy, ldz, nmx, nmy, nmz)
        rx = 2.0 * ln * nmx - ldx
        ry = 2.0 * ln * nmy - ldy
        rz = 2.0 * ln * nmz - ldz
        rinv = _safe_rsqrt(_dot3(rx, ry, rz, rx, ry, rz))
        # view = -d (raw, matches tracer.lighting's -carry.d)
        cos_rv = jnp.maximum(0.0, -_dot3(rx, ry, rz, dx, dy, dz) * rinv)
        gate = (diff > 0.0) & (cos_rv > 0.0)
        base = jnp.where(gate, cos_rv, 1.0)
        spec = jnp.where(gate, jnp.exp(shin * jnp.log(base)), 0.0)

        lit = 1.0 - shadow_rs[li][:].astype(jnp.float32)
        cr = cr + lc_r[li, 0] * lit * (kdx * diff + ksx * spec)
        cg = cg + lc_r[li, 1] * lit * (kdy * diff + ksy * spec)
        cb = cb + lc_r[li, 2] * lit * (kdz * diff + ksz * spec)

    h = live & valid
    miss = live & jnp.logical_not(valid)
    wf = weight * (1.0 - mirror)
    hf = h.astype(jnp.float32)
    mf = miss.astype(jnp.float32)
    ar_o[:] = hf * wf * cr + mf * weight * env_r[1, 0]
    ag_o[:] = hf * wf * cg + mf * weight * env_r[1, 1]
    ab_o[:] = hf * wf * cb + mf * weight * env_r[1, 2]

    # mirror bounce: refl = d - 2 (d.n) n with the RAW shading normal
    # (vm.reflect on hit.normal, tracer.segment)
    dn = _dot3(dx, dy, dz, nmx, nmy, nmz)
    rfx = dx - 2.0 * dn * nmx
    rfy = dy - 2.0 * dn * nmy
    rfz = dz - 2.0 * dn * nmz
    o2x_o[:] = jnp.where(h, px + EPS_OFFSET * rfx, ox_r[:])
    o2y_o[:] = jnp.where(h, py + EPS_OFFSET * rfy, oy_r[:])
    o2z_o[:] = jnp.where(h, pz + EPS_OFFSET * rfz, oz_r[:])
    d2x_o[:] = jnp.where(h, rfx, dx)
    d2y_o[:] = jnp.where(h, rfy, dy)
    d2z_o[:] = jnp.where(h, rfz, dz)
    w2_o[:] = jnp.where(h, weight * mirror, 0.0)


def _vec_spec():
    return pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM)


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.SMEM)


def _pad1(a, pad):
    return jnp.pad(a, (0, pad))


def shade_pre(o, d, t, kind, live, rows48, ana16, mat16, light_pos,
              want_tex=False, atlas_size=1, interpret=False):
    """Run the resolve+shadow-setup kernel over a flat ray batch.

    Args: o, d [R,3]; t [R] (merged closest-hit distance, INF on miss);
    kind [R] int32 hit kind (shade.KIND_*; MISS for dead rays); live [R]
    bool; rows48 [R,>=27] gathered tri_pack rows or None for tri-less
    scenes (the material id rides in col 26; textured scenes also carry
    UVs 9..14 and the texture record 27..29); ana16 [R,16] gathered
    analytic rows (ShadeGeom.ana16) or None; mat16 [Mt,16]; light_pos
    [L,3]; want_tex selects the in-kernel atlas-index computation;
    atlas_size bounds its clip.
    Returns (point [R,3], normal [R,3], mid [R] int32, texid [R] int32
    or None, so [L*R,4], sd [L*R,4], st [L*R], sact [L*R] int32) — the
    shadow batch in LIGHT-major order, 4-wide pre-padded for
    intersect_clusters_pallas; texid is -1 for untextured rays.
    """
    R = o.shape[0]
    L = light_pos.shape[0]
    Mt = mat16.shape[0]
    has_tri = rows48 is not None
    has_ana = ana16 is not None
    has_tex = bool(want_tex) and has_tri
    n_chunks = (R + CHUNK - 1) // CHUNK
    Rp = n_chunks * CHUNK
    pad = Rp - R

    vec_in = (
        [_pad1(o[:, k], pad) for k in range(3)]
        + [_pad1(d[:, k], pad) for k in range(3)]
        + [_pad1(t, pad),
           _pad1(kind.astype(jnp.int32), pad),
           _pad1(live.astype(jnp.int32), pad)]
    )
    if has_tri:
        vec_in += [_pad1(rows48[:, k], pad)
                   for k in _PRE_COLS + (_TEX_COLS if has_tex else ())]
    if has_ana:
        vec_in += [_pad1(ana16[:, k], pad) for k in _ANA_COLS]
    n_vec = len(vec_in)
    n_out = 7 + (1 if has_tex else 0) + 8 * L
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[_vec_spec()] * n_vec + [_smem_spec((L, 3)),
                                          _smem_spec((Mt, 16))],
        out_specs=[_vec_spec()] * n_out,
    )
    out_shape = [jax.ShapeDtypeStruct((Rp,), jnp.float32)] * 6
    out_shape.append(jax.ShapeDtypeStruct((Rp,), jnp.int32))
    if has_tex:
        out_shape.append(jax.ShapeDtypeStruct((Rp,), jnp.int32))
    for _ in range(L):
        out_shape += [jax.ShapeDtypeStruct((Rp,), jnp.float32)] * 7
        out_shape.append(jax.ShapeDtypeStruct((Rp,), jnp.int32))
    outs = pl.pallas_call(
        functools.partial(_pre_kernel, L=L, Mt=Mt, has_tri=has_tri,
                          has_ana=has_ana, has_tex=has_tex,
                          atlas_hi=max(int(atlas_size) - 1, 0)),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*vec_in, light_pos, mat16)
    px, py, pz, nmx, nmy, nmz, mid = outs[:7]
    base = 7
    texid = None
    if has_tex:
        texid = outs[base][:R]
        base += 1
    point = jnp.stack([px[:R], py[:R], pz[:R]], axis=1)
    normal = jnp.stack([nmx[:R], nmy[:R], nmz[:R]], axis=1)
    so_c, sd_c, st_c, sact_c = [], [], [], []
    zeros = None
    for li in range(L):
        sox, soy, soz, sdx, sdy, sdz, st, sact = outs[base + 8 * li:
                                                      base + 8 + 8 * li]
        if zeros is None:
            zeros = jnp.zeros((R,), jnp.float32)
        so_c.append(jnp.stack([sox[:R], soy[:R], soz[:R], zeros], axis=1))
        sd_c.append(jnp.stack([sdx[:R], sdy[:R], sdz[:R], 1.0 + zeros],
                              axis=1))
        st_c.append(st[:R])
        sact_c.append(sact[:R])
    # LIGHT-major [L*R, .]: plain axis-0 concatenation, no transposes
    so = jnp.concatenate(so_c, axis=0)
    sd = jnp.concatenate(sd_c, axis=0)
    st = jnp.concatenate(st_c, axis=0)
    sact = jnp.concatenate(sact_c, axis=0)
    return point, normal, mid[:R], texid, so, sd, st, sact


def shade_phong(o, d, weight, valid, live, mat_id, point, normal, shadow,
                mat16, light_pos, light_color, ambience, background,
                texel=None, textured=None, interpret=False):
    """Run the lighting+bounce kernel; returns (add [R,3], o2 [R,3],
    d2 [R,3], w2 [R]). ``shadow`` is [L, R] (bool/int, LIGHT-major);
    ``texel`` [R,3] + ``textured`` [R] override the diffuse color where
    textured != 0 (pass None for untextured scenes)."""
    R = o.shape[0]
    L = light_pos.shape[0]
    Mt = mat16.shape[0]
    has_tex = texel is not None
    n_chunks = (R + CHUNK - 1) // CHUNK
    Rp = n_chunks * CHUNK
    pad = Rp - R

    env = jnp.stack([ambience, background])
    vec_in = (
        [_pad1(o[:, k], pad) for k in range(3)]
        + [_pad1(d[:, k], pad) for k in range(3)]
        + [_pad1(weight, pad),
           _pad1(valid.astype(jnp.int32), pad),
           _pad1(live.astype(jnp.int32), pad),
           _pad1(mat_id.astype(jnp.int32), pad)]
        + [_pad1(point[:, k], pad) for k in range(3)]
        + [_pad1(normal[:, k], pad) for k in range(3)]
    )
    if has_tex:
        vec_in += [_pad1(texel[:, k], pad) for k in range(3)]
        vec_in.append(_pad1(textured.astype(jnp.int32), pad))
    vec_in += [_pad1(shadow[li].astype(jnp.int32), pad) for li in range(L)]
    n_vec = len(vec_in)
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=([_vec_spec()] * n_vec
                  + [_smem_spec((L, 3)), _smem_spec((L, 3)),
                     _smem_spec((2, 3)), _smem_spec((Mt, 16))]),
        out_specs=[_vec_spec()] * 10,
    )
    outs = pl.pallas_call(
        functools.partial(_phong_kernel, L=L, Mt=Mt, has_tex=has_tex),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Rp,), jnp.float32)] * 10,
        interpret=interpret,
    )(*vec_in, light_pos, light_color, env, mat16)
    ar, ag, ab, o2x, o2y, o2z, d2x, d2y, d2z, w2 = outs
    add = jnp.stack([ar[:R], ag[:R], ab[:R]], axis=1)
    o2 = jnp.stack([o2x[:R], o2y[:R], o2z[:R]], axis=1)
    d2 = jnp.stack([d2x[:R], d2y[:R], d2z[:R]], axis=1)
    return add, o2, d2, w2[:R]
