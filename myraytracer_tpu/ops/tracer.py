"""Wavefront Whitted integrator.

The reference's deep per-ray call tree
(trace -> intersect_scene -> intersectBVH -> intersect_triangle ->
lighting, README.md:17) becomes a *wavefront*: every stage runs once over
the whole flat ray batch —

  intersect_scene : spheres + planes tested against all rays in one VPU
                    pass each; triangles through the threaded-BVH walk;
                    closest hit = argmin over the three kinds
  lighting        : Phong with one batched shadow-occlusion query per
                    light (any-hit traversal with the light distance)
  trace           : the mirror chain as a statically unrolled loop of
                    ``max_depth`` wavefront bounces with a live-weight
                    mask, the GPU twin's iterative form
                    (mytracer_gpu.cu:237-312) plus the CPU's mirror>0
                    early-exit (mytracer.cpp:547) as a mask.

Blending follows the visible GPU integrator:
``color = (1-m) * local + m * reflected``, miss adds ``weight *
background`` (mytracer_gpu.cu:265, 292-296).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from myraytracer_tpu.ops import intersect as isx
from myraytracer_tpu.ops import shade
from myraytracer_tpu.ops import traverse
from myraytracer_tpu.utils import vecmath as vm


class TraceConfig(NamedTuple):
    """Static knobs for the integrator."""

    use_bvh: bool = True            # False -> brute-force triangle scan
    texture_filter: str = "nearest"  # "nearest" (parity) | "bilinear" (diff)


def intersect_scene(
    scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    active: Optional[jnp.ndarray] = None,
    cfg: TraceConfig = TraceConfig(),
    tri_flat: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closest hit over all primitive kinds.

    Returns integer (kind, idx) per ray — topology only; resolve with
    shade.resolve_hit for the differentiable interaction.
    """
    R = o.shape[0]
    o_ng = jax.lax.stop_gradient(o)
    d_ng = jax.lax.stop_gradient(d)

    best_t = jnp.full((R,), isx.INF)
    kind = jnp.zeros((R,), jnp.int32)
    idx = jnp.zeros((R,), jnp.int32)

    if scene.n_spheres:
        t_all = isx.ray_sphere(
            o_ng[:, None, :], d_ng[:, None, :],
            jax.lax.stop_gradient(scene.sphere_center)[None],
            jax.lax.stop_gradient(scene.sphere_radius)[None],
        )  # [R, S]
        i_s = jnp.argmin(t_all, axis=1)
        t_s = jnp.take_along_axis(t_all, i_s[:, None], axis=1)[:, 0]
        better = t_s < best_t
        best_t = jnp.where(better, t_s, best_t)
        kind = jnp.where(better, shade.KIND_SPHERE, kind)
        idx = jnp.where(better, i_s.astype(jnp.int32), idx)

    if scene.n_planes:
        t_all = isx.ray_plane(
            o_ng[:, None, :], d_ng[:, None, :],
            jax.lax.stop_gradient(scene.plane_center)[None],
            jax.lax.stop_gradient(scene.plane_normal)[None],
        )
        i_p = jnp.argmin(t_all, axis=1)
        t_p = jnp.take_along_axis(t_all, i_p[:, None], axis=1)[:, 0]
        better = t_p < best_t
        best_t = jnp.where(better, t_p, best_t)
        kind = jnp.where(better, shade.KIND_PLANE, kind)
        idx = jnp.where(better, i_p.astype(jnp.int32), idx)

    if scene.n_cylinders:
        t_all = isx.ray_cylinder(
            o_ng[:, None, :], d_ng[:, None, :],
            jax.lax.stop_gradient(scene.cyl_center)[None],
            jax.lax.stop_gradient(scene.cyl_axis)[None],
            jax.lax.stop_gradient(scene.cyl_radius)[None],
            jax.lax.stop_gradient(scene.cyl_height)[None],
        )
        i_c = jnp.argmin(t_all, axis=1)
        t_c = jnp.take_along_axis(t_all, i_c[:, None], axis=1)[:, 0]
        better = t_c < best_t
        best_t = jnp.where(better, t_c, best_t)
        kind = jnp.where(better, shade.KIND_CYL, kind)
        idx = jnp.where(better, i_c.astype(jnp.int32), idx)

    if scene.n_tris:
        if cfg.use_bvh:
            tri = traverse.traverse_bvh(scene, o_ng, d_ng, active=active,
                                        tri_flat=tri_flat)
        else:
            tri = traverse.intersect_tris_brute(scene, o_ng, d_ng)
        better = tri.t < best_t
        kind = jnp.where(better, shade.KIND_TRI, kind)
        idx = jnp.where(better, tri.idx, idx)

    if active is not None:
        kind = jnp.where(active, kind, shade.KIND_MISS)
    return kind, idx


def occluded(
    scene,
    point: jnp.ndarray,
    light_pos: jnp.ndarray,
    active: jnp.ndarray,
    cfg: TraceConfig = TraceConfig(),
    tri_flat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shadow predicate: any hit with 0 < t < |light - point|.

    Matches ``isShadow = isIntersect && shadow_t < light_distance && 0 <
    shadow_t`` (mytracer.cpp:587-599) with the same 1e-4 origin offset,
    but runs as an any-hit query (identical truth value, earlier retire).
    """
    point = jax.lax.stop_gradient(point)
    light_pos = jax.lax.stop_gradient(light_pos)
    l_vec = light_pos - point
    dist = vm.norm(l_vec)
    l_dir = vm.normalize(l_vec)
    o = point + shade.EPS_OFFSET * l_dir

    shadowed = jnp.zeros(point.shape[:-1], bool)
    if scene.n_spheres:
        t_all = isx.ray_sphere(
            o[:, None, :], l_dir[:, None, :],
            jax.lax.stop_gradient(scene.sphere_center)[None],
            jax.lax.stop_gradient(scene.sphere_radius)[None],
        )
        shadowed |= jnp.any(t_all < dist[:, None], axis=1)
    if scene.n_planes:
        t_all = isx.ray_plane(
            o[:, None, :], l_dir[:, None, :],
            jax.lax.stop_gradient(scene.plane_center)[None],
            jax.lax.stop_gradient(scene.plane_normal)[None],
        )
        shadowed |= jnp.any(t_all < dist[:, None], axis=1)
    if scene.n_cylinders:
        t_all = isx.ray_cylinder(
            o[:, None, :], l_dir[:, None, :],
            jax.lax.stop_gradient(scene.cyl_center)[None],
            jax.lax.stop_gradient(scene.cyl_axis)[None],
            jax.lax.stop_gradient(scene.cyl_radius)[None],
            jax.lax.stop_gradient(scene.cyl_height)[None],
        )
        shadowed |= jnp.any(t_all < dist[:, None], axis=1)
    if scene.n_tris:
        still = active & ~shadowed
        if cfg.use_bvh:
            tri = traverse.traverse_bvh(
                scene, o, l_dir, t_max=dist, any_hit=True, active=still,
                tri_flat=tri_flat,
            )
        else:
            tri = traverse.intersect_tris_brute(scene, o, l_dir, t_max=dist)
        shadowed |= tri.idx >= 0
    return shadowed & active


def lighting(
    scene,
    hit: shade.Hit,
    view: jnp.ndarray,
    active: jnp.ndarray,
    cfg: TraceConfig = TraceConfig(),
    tri_flat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Phong local illumination with shadows (mytracer.cpp:568-608).

    ``view`` is the normalized direction from the point to the viewer.
    The per-light loop is a static unroll (L is small and static).
    """
    color = scene.ambience[None, :] * hit.ambient
    cast = active & (hit.shadowable > 0.5)
    for li in range(scene.n_lights):
        lp = scene.light_pos[li]
        lcol = scene.light_color[li]
        diff = shade.diffuse_term(hit.normal, hit.point, lp)
        spec = shade.specular_term(hit.normal, hit.point, view, lp, hit.shininess)
        is_shadow = occluded(scene, hit.point, jnp.broadcast_to(lp, hit.point.shape), cast, cfg, tri_flat)
        lit = (~is_shadow).astype(color.dtype)[:, None]
        color = color + lcol[None, :] * lit * (
            hit.diffuse * diff[:, None] + hit.specular * spec[:, None]
        )
    return color


def trace(
    scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    cfg: TraceConfig = TraceConfig(),
) -> jnp.ndarray:
    """Whitted trace of a ray batch -> [R, 3] linear color (unclamped).

    Primary miss returns the background; each bounce blends
    ``(1-m) * local`` and carries ``weight *= m`` down the single mirror
    chain, up to ``scene.max_depth`` bounces (mytracer_gpu.cu:237-312).
    """
    R = o.shape[0]
    tri_flat = traverse.pack_tri_vertices(scene) if scene.n_tris else None
    kind, idx = intersect_scene(scene, o, d, cfg=cfg, tri_flat=tri_flat)
    hit = shade.resolve_hit(scene, o, d, kind, idx, cfg.texture_filter)
    valid = hit.valid

    local = lighting(scene, hit, -d, valid, cfg, tri_flat)
    color = jnp.where(
        valid[:, None], (1.0 - hit.mirror[:, None]) * local, scene.background[None, :]
    )

    weight = jnp.where(valid, hit.mirror, 0.0)
    cur_d = d
    normal = hit.normal
    point = hit.point

    for _ in range(scene.max_depth):
        live = weight > 0.0
        refl = vm.reflect(cur_d, normal)
        o2 = point + shade.EPS_OFFSET * refl
        kind, idx = intersect_scene(scene, o2, refl, active=live, cfg=cfg,
                                    tri_flat=tri_flat)
        hit = shade.resolve_hit(scene, o2, refl, kind, idx, cfg.texture_filter)
        h = live & hit.valid
        miss = live & ~hit.valid

        local = lighting(scene, hit, -refl, h, cfg, tri_flat)
        contrib = jnp.where(
            h[:, None], weight[:, None] * (1.0 - hit.mirror[:, None]) * local, 0.0
        )
        contrib = contrib + jnp.where(miss[:, None], weight[:, None] * scene.background[None, :], 0.0)
        color = color + contrib

        weight = jnp.where(h, weight * hit.mirror, 0.0)
        cur_d = refl
        normal = hit.normal
        point = hit.point

    return color
