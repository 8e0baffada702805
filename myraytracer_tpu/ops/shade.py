"""Differentiable hit resolution + Phong shading terms.

The fixed-hit-topology reparameterization (BASELINE.json north-star):
traversal/selection produce only integer (kind, index) pairs; this module
*re-solves* the selected primitive's intersection in closed form, so
point/normal/UV/color are ordinary differentiable JAX expressions of the
scene parameters. Gradients flow to vertex positions, normals, materials,
lights and texels with no custom VJP.

Shading math parity (reference):
  * diffuse  = max(0, n . l)                      mytracer.cpp:510-515
  * specular = max(0, mirror(l, n) . view)^shin   mytracer.cpp:524-534
    gated on diffuse > 0
  * Phong-interpolated mesh normals are intentionally NOT normalized,
    matching mymesh.cpp:231-234 / mytracer_gpu.cu:505 exactly (the
    reference never renormalizes them; flat face normals are unit).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops import texture as tex
from myraytracer_tpu.utils import vecmath as vm

# hit kinds
KIND_MISS = 0
KIND_SPHERE = 1
KIND_PLANE = 2
KIND_TRI = 3
KIND_CYL = 4

#: self-intersection offset for secondary rays (mytracer.cpp:550,570)
EPS_OFFSET = 1e-4


class Hit(NamedTuple):
    """Differentiable per-ray surface interaction."""

    valid: jnp.ndarray      # [R] bool
    t: jnp.ndarray          # [R]
    point: jnp.ndarray      # [R, 3]
    normal: jnp.ndarray     # [R, 3] (unnormalized for PHONG meshes — parity)
    diffuse: jnp.ndarray    # [R, 3] effective diffuse (texture-aware)
    ambient: jnp.ndarray    # [R, 3]
    specular: jnp.ndarray   # [R, 3]
    mirror: jnp.ndarray     # [R]
    shininess: jnp.ndarray  # [R]
    shadowable: jnp.ndarray # [R] float 0/1


def resolve_hit(scene, o, d, kind, idx, texture_filter: str = "nearest",
                need_colors: bool = True) -> Hit:
    """Recompute the surface interaction for selected (kind, idx).

    All three primitive branches are evaluated for every ray and blended
    with ``where`` — compute-all-select is the vector-machine idiom; the
    per-branch work is tiny next to traversal.

    ``need_colors=False`` skips the texture fetch and color-material
    gathers (diffuse/ambient/specular/shininess come back as zeros) for
    callers that only need geometry + mirror/shadowable — the
    topology-recording pass (tracer.trace_topology).
    """
    R = o.shape[0]
    safe = jnp.maximum(idx, 0)

    t = jnp.zeros((R,), o.dtype)
    normal = jnp.zeros((R, 3), o.dtype)
    diffuse_override = jnp.zeros((R, 3), o.dtype)
    has_override = jnp.zeros((R,), bool)
    mat_id = jnp.zeros((R,), jnp.int32)

    if scene.n_spheres:
        si = jnp.clip(safe, 0, scene.n_spheres - 1)
        c = scene.sphere_center[si]
        r = scene.sphere_radius[si]
        t_s = ray_t_sphere(o, d, c, r)
        p_s = o + t_s[:, None] * d
        n_s = vm.normalize(p_s - c)
        is_s = kind == KIND_SPHERE
        t = jnp.where(is_s, t_s, t)
        normal = jnp.where(is_s[:, None], n_s, normal)
        mat_id = jnp.where(is_s, scene.sphere_mat[si], mat_id)

    if scene.n_planes:
        pi = jnp.clip(safe, 0, scene.n_planes - 1)
        n_p = scene.plane_normal[pi]
        c_p = scene.plane_center[pi]
        denom = vm.dot(n_p, d)
        denom = jnp.where(jnp.abs(denom) > isx.EPS_PARALLEL, denom, 1.0)
        t_p = (vm.dot(n_p, c_p) - vm.dot(n_p, o)) / denom
        is_p = kind == KIND_PLANE
        t = jnp.where(is_p, t_p, t)
        normal = jnp.where(is_p[:, None], n_p, normal)
        mat_id = jnp.where(is_p, scene.plane_mat[pi], mat_id)

    if scene.n_cylinders:
        ci = jnp.clip(safe, 0, scene.n_cylinders - 1)
        cc = scene.cyl_center[ci]
        ca = scene.cyl_axis[ci]
        cr = scene.cyl_radius[ci]
        ch = scene.cyl_height[ci]
        t_c = isx.ray_cylinder(o, d, cc, ca, cr, ch)
        t_c = jnp.where(t_c < isx.INF, t_c, 0.0)  # safe value for non-hits
        p_c = o + t_c[:, None] * d
        rel = p_c - cc
        n_c = vm.normalize(rel - vm.dot(rel, ca)[:, None] * ca)
        # flip outward normal toward the viewer for rays inside the tube
        n_c = jnp.where(vm.dot(n_c, d)[:, None] > 0, -n_c, n_c)
        is_c = kind == KIND_CYL
        t = jnp.where(is_c, t_c, t)
        normal = jnp.where(is_c[:, None], n_c, normal)
        mat_id = jnp.where(is_c, scene.cyl_mat[ci], mat_id)

    if scene.n_tris:
        ti = jnp.clip(safe, 0, scene.n_tris - 1)
        vidx = scene.tri_vidx[ti]
        p0 = scene.vertex_pos[vidx[:, 0]]
        p1 = scene.vertex_pos[vidx[:, 1]]
        p2 = scene.vertex_pos[vidx[:, 2]]
        t_t, alpha, beta = isx.ray_triangle(o, d, p0, p1, p2)
        gamma = 1.0 - alpha - beta
        # flat face normal recomputed from vertices (differentiable),
        # equal to the reference's precomputed triangle.normal
        # (mymesh.cpp:116); PHONG interpolates UNnormalized (parity).
        n_flat = vm.normalize(vm.cross(p1 - p0, p2 - p0))
        n0 = scene.vertex_normal[vidx[:, 0]]
        n1 = scene.vertex_normal[vidx[:, 1]]
        n2 = scene.vertex_normal[vidx[:, 2]]
        n_phong = alpha[:, None] * n0 + beta[:, None] * n1 + gamma[:, None] * n2
        is_phong = scene.tri_flags[ti] == 1
        n_t = jnp.where(is_phong[:, None], n_phong, n_flat)

        is_t = kind == KIND_TRI
        t = jnp.where(is_t, t_t, t)
        normal = jnp.where(is_t[:, None], n_t, normal)
        mat_id = jnp.where(is_t, scene.tri_mat[ti], mat_id)

        if need_colors and scene.has_textures:
            # texture
            uvidx = scene.tri_uvidx[ti]
            u = (alpha * scene.uv_u[uvidx[:, 0]]
                 + beta * scene.uv_u[uvidx[:, 1]]
                 + gamma * scene.uv_u[uvidx[:, 2]])
            v = (alpha * scene.uv_v[uvidx[:, 0]]
                 + beta * scene.uv_v[uvidx[:, 1]]
                 + gamma * scene.uv_v[uvidx[:, 2]])
            rec = scene.tri_tex[ti]
            sampler = (tex.sample_bilinear if texture_filter == "bilinear"
                       else tex.sample_nearest)
            texel = sampler(scene.texels, rec, u, v)
            textured = is_t & (rec[:, 0] > 0)
            diffuse_override = jnp.where(
                textured[:, None], texel, diffuse_override)
            has_override = has_override | textured

    valid = kind != KIND_MISS
    point = o + t[:, None] * d
    if need_colors:
        diffuse = jnp.where(
            has_override[:, None], diffuse_override,
            scene.mat_diffuse[mat_id])
        ambient = scene.mat_ambient[mat_id]
        specular = scene.mat_specular[mat_id]
        shininess = scene.mat_shininess[mat_id]
    else:
        diffuse = diffuse_override
        ambient = specular = jnp.zeros((R, 3), o.dtype)
        shininess = jnp.zeros((R,), o.dtype)
    return Hit(
        valid=valid,
        t=t,
        point=point,
        normal=normal,
        diffuse=diffuse,
        ambient=ambient,
        specular=specular,
        mirror=jnp.where(valid, scene.mat_mirror[mat_id], 0.0),
        shininess=shininess,
        shadowable=scene.mat_shadowable[mat_id],
    )


def ray_t_sphere(o, d, center, radius):
    """Differentiable sphere-hit distance for a *known* hit (no miss mask).

    Double-where guards the sqrt: rays that did NOT select this sphere
    still evaluate this branch (compute-all-select), and sqrt'(0) = inf
    would turn their zero cotangents into NaNs that contaminate every
    upstream parameter through the bounce-origin chain.
    """
    oc = o - center
    b = 2.0 * vm.dot(oc, d)
    a = vm.dot(d, d)
    c = vm.dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    pos = disc > 1e-12
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    sq = jnp.where(pos, sq, 0.0)
    inv2a = 0.5 / a
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    return jnp.where(t0 > isx.EPS_HIT, t0, t1)


def diffuse_term(normal, point, light_pos):
    """max(0, n . normalize(light - point)) (mytracer.cpp:510-515)."""
    l_dir = vm.normalize(light_pos - point)
    return jnp.maximum(0.0, vm.dot(normal, l_dir))


def specular_term(normal, point, view, light_pos, shininess):
    """Phong specular, gated on diffuse > 0 (mytracer.cpp:524-534).

    ``pow`` is guarded so the gradient at base == 0 stays finite.
    """
    l_dir = vm.normalize(light_pos - point)
    cos_d = vm.dot(normal, l_dir)
    r = vm.normalize(vm.mirror(l_dir, normal))
    cos_rv = jnp.maximum(0.0, vm.dot(r, view))
    gate = (cos_d > 0.0) & (cos_rv > 0.0)
    base = jnp.where(gate, cos_rv, 1.0)
    return jnp.where(gate, jnp.power(base, shininess), 0.0)
