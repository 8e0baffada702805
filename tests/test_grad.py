"""Differentiability: analytic gradients vs central finite differences.

The fixed-hit-topology reparameterization is exact where visibility is
locally constant (BASELINE.json; SURVEY.md §7 M5) — so FD checks sample
directional derivatives of a loss over *interior* pixels, away from
silhouettes, and use loose fp32-appropriate tolerances. Silhouette
pixels are knowingly excluded (documented FD mismatch at visibility
discontinuities).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, PHONG
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.ops.render import render_loss_grad
from myraytracer_tpu.parallel.shard_render import merge_params, split_params
from myraytracer_tpu.scenes.shapes import uv_sphere, checkerboard, plane_uv_quad


def grad_scene():
    s = Scene()
    s.set_camera(eye=(0, 0.8, 5), center=(0, 0, 0), up=(0, 1, 0), fovy=45,
                 width=24, height=24)
    s.add_light((2, 4, 4), (0.7, 0.7, 0.7))
    s.ambience = (0.2, 0.2, 0.2)
    s.add_sphere((0.9, 0, 0), 0.75, Material(
        diffuse=(0.6, 0.1, 0.1), specular=(0.4, 0.4, 0.4), shininess=20, mirror=0.3))
    v, f = uv_sphere(0.6, 8, 10, center=(-0.9, 0, 0))
    s.add_mesh(TriangleMesh(v, f, material=Material(diffuse=(0.1, 0.5, 0.5)),
                            draw_mode=PHONG))
    s.add_plane((0, -0.8, 0), (0, 1, 0), Material(diffuse=(0.4, 0.4, 0.4)))
    s.max_depth = 2
    return s


def textured_scene():
    s = Scene()
    s.set_camera(eye=(0, 0.5, 3), center=(0, 0, 0), up=(0, 1, 0), fovy=45,
                 width=16, height=16)
    s.add_light((1, 3, 3), (0.8, 0.8, 0.8))
    s.ambience = (0.2, 0.2, 0.2)
    v, f, uvi, u, vv = plane_uv_quad((-2, -0.5, 2), (2, -0.5, 2), (2, -0.5, -2), (-2, -0.5, -2))
    s.add_mesh(TriangleMesh(v, f, uv_indices=uvi, u_coords=u, v_coords=vv,
                            texture=checkerboard(4, 16),
                            material=Material(diffuse=(0.5, 0.5, 0.5))))
    return s


def loss_of(scene_data, o, d, cfg=tr.TraceConfig()):
    def fn(params):
        s = merge_params(scene_data, params)
        c = tr.trace(s, o, d, cfg)
        # weight interior pixels only is handled by caller's ray choice
        return jnp.sum(c * jnp.asarray([0.3, 0.5, 0.2]))
    return fn


def central_rays(cam, n=40, margin=0.3, seed=0):
    """Rays through pixels well inside the image (away from silhouettes)."""
    rng = np.random.default_rng(seed)
    xs = rng.uniform(cam.width * margin, cam.width * (1 - margin), n).astype(np.float32)
    ys = rng.uniform(cam.height * margin, cam.height * (1 - margin), n).astype(np.float32)
    return cam.primary_rays(jnp.asarray(xs), jnp.asarray(ys))


@pytest.mark.parametrize("field,eps", [
    ("light_color", 1e-2),
    ("mat_diffuse", 1e-2),
    ("mat_ambient", 1e-2),
    ("light_pos", 1e-2),
    ("sphere_center", 5e-3),
    # radius at eps 5e-3 fails NOT because the gradient is wrong: t(r) of a
    # near-tangent hit has sqrt curvature, so central FD at that step is
    # biased ~10% (measured: FD(eps) for the two offending rays converges
    # 0.073 -> 0.0 and 0.085 -> 0.01758 as eps -> 2e-4, exactly matching
    # the analytic 0.0 / 0.01761, with zero hit-topology flips across the
    # stencil). 5e-4 sits below the curvature bias and above fp32 noise.
    ("sphere_radius", 5e-4),
    ("vertex_pos", 5e-3),
    ("mat_mirror", 1e-2),
])
@pytest.mark.slow
def test_directional_derivative_matches_fd(field, eps):
    s = grad_scene()
    data = s.build()
    o, d = central_rays(s.camera)
    fn = loss_of(data, o, d)
    params = split_params(data)

    g = jax.grad(fn)(params)[field]

    rng = np.random.default_rng(3)
    v = rng.normal(size=params[field].shape).astype(np.float32)
    v /= np.linalg.norm(v)

    def at(t):
        p = dict(params)
        p[field] = params[field] + t * v
        return float(fn(p))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    assert np.isfinite(analytic)
    # fp32 central differences: generous relative tolerance
    np.testing.assert_allclose(analytic, fd, rtol=0.08, atol=2e-3)


def test_texture_texel_grads_match_fd():
    s = textured_scene()
    data = s.build()
    o, d = central_rays(s.camera, n=30, margin=0.25, seed=5)
    cfg = tr.TraceConfig(texture_filter="bilinear")
    fn = loss_of(data, o, d, cfg)
    params = split_params(data)

    g = jax.grad(fn)(params)["texels"]
    assert float(jnp.abs(g).sum()) > 0  # grads reach the atlas

    rng = np.random.default_rng(4)
    v = rng.normal(size=params["texels"].shape).astype(np.float32)
    v /= np.linalg.norm(v)
    eps = 1e-2

    def at(t):
        p = dict(params)
        p["texels"] = params["texels"] + t * v
        return float(fn(p))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    np.testing.assert_allclose(analytic, fd, rtol=0.08, atol=2e-3)


@pytest.mark.parametrize("cam_field,eps", [
    ("eye", 2e-3),
    ("center", 2e-3),
    ("up", 2e-3),
    ("fovy", 2e-2),  # degrees: the traced intrinsic (zoom) leaf
])
@pytest.mark.slow
def test_camera_pose_grads_match_fd(cam_field, eps):
    """d(loss)/d(camera pose + fovy): rays regenerated from the camera
    inside the loss; gradients flow through primary_rays ->
    fixed-topology hit re-solve (exact where visibility is locally
    constant)."""
    import dataclasses

    s = grad_scene()
    data = s.build()
    cam = s.camera
    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.uniform(cam.width * 0.3, cam.width * 0.7, 40),
                     jnp.float32)
    ys = jnp.asarray(rng.uniform(cam.height * 0.3, cam.height * 0.7, 40),
                     jnp.float32)

    def fn(val):
        c2 = dataclasses.replace(cam, **{cam_field: val})
        o, d = c2.primary_rays(xs, ys)
        c = tr.trace(data, o, d)
        return jnp.sum(c * jnp.asarray([0.3, 0.5, 0.2]))

    base = jnp.asarray(getattr(cam, cam_field))
    g = jax.grad(fn)(base)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # pose actually reaches the image

    rng2 = np.random.default_rng(12)
    v = rng2.normal(size=np.asarray(base).shape).astype(np.float32)
    v /= np.linalg.norm(np.atleast_1d(v))
    fd = (float(fn(base + eps * v)) - float(fn(base - eps * v))) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    np.testing.assert_allclose(analytic, fd, rtol=0.08, atol=2e-3)


def test_render_loss_grad_matches_direct():
    s = grad_scene()
    data = s.build()
    xs, ys = s.camera.pixel_grid()
    o, d = s.camera.primary_rays(xs.ravel(), ys.ravel())
    target = jnp.full((o.shape[0], 3), 0.2)

    loss_t, grads_t = render_loss_grad(data, o, d, target, tile=128)

    params = split_params(data)

    def direct(p):
        c = tr.trace(merge_params(data, p), o, d)
        return jnp.sum((c - target) ** 2)

    loss_d, grads_d = jax.value_and_grad(direct)(params)
    np.testing.assert_allclose(float(loss_t), float(loss_d), rtol=1e-5)
    for k in grads_t:
        np.testing.assert_allclose(
            np.asarray(grads_t[k]), np.asarray(grads_d[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)


def test_mirror_grad_full_chain_on_trimmed_scene():
    """The live_depth trap (VERDICT r3 #7): a mirror-free build statically
    trims the Whitted chain to 1 segment; once an optimizer raises
    mat_mirror above 0 that trimmed program drops the reflected-radiance
    term from d(loss)/d(mat_mirror). render_loss_grad must restore the
    full chain on its own — pinned here against central FD through a
    full-depth renderer."""
    import dataclasses

    s = grad_scene()
    data = s.build()
    # mirror-free variant of the same scene: build-time trim kicks in
    flat = dataclasses.replace(
        data, mat_mirror=jnp.zeros_like(data.mat_mirror), live_depth=1)
    assert flat.n_segments == 1
    # ... then "the optimizer" moves mirror off zero; live_depth is stale
    moved = dataclasses.replace(
        flat, mat_mirror=jnp.full_like(data.mat_mirror, 0.15))

    o, d = central_rays(s.camera, n=80, margin=0.25, seed=13)
    target = jnp.full((o.shape[0], 3), 0.2)

    _, grads = render_loss_grad(moved, o, d, target, tile=1024)
    g = grads["mat_mirror"]

    # FD oracle: the FULL-depth renderer (what the image physically is)
    full = dataclasses.replace(moved, live_depth=moved.max_depth + 1)
    rng = np.random.default_rng(7)
    v = rng.normal(size=np.asarray(g).shape).astype(np.float32)
    v /= np.linalg.norm(v)
    eps = 5e-3

    def at(t):
        sc = dataclasses.replace(
            full, mat_mirror=full.mat_mirror + t * v)
        c = tr.trace(sc, o, d)
        return float(jnp.sum((c - target) ** 2))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    np.testing.assert_allclose(analytic, fd, rtol=0.08, atol=2e-3)


def test_inverse_rendering_converges():
    """End-to-end: recover a perturbed light color by gradient descent."""
    s = grad_scene()
    data = s.build()
    o, d = central_rays(s.camera, n=100, margin=0.2, seed=7)

    target = tr.trace(data, o, d)  # ground truth image

    import dataclasses
    wrong = dataclasses.replace(data, light_color=data.light_color * 0.3)

    @jax.jit
    def step(scene):
        def loss_fn(lc):
            sc = dataclasses.replace(scene, light_color=lc)
            c = tr.trace(sc, o, d)
            return jnp.mean((c - target) ** 2)
        l, g = jax.value_and_grad(loss_fn)(scene.light_color)
        return dataclasses.replace(scene, light_color=scene.light_color - 40.0 * g), l

    losses = []
    sc = wrong
    for _ in range(30):
        sc, l = step(sc)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.05
    np.testing.assert_allclose(
        np.asarray(sc.light_color), np.asarray(data.light_color), atol=0.05)
