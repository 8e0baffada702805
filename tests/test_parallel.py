"""Multi-chip (virtual 8-device CPU mesh) sharded render + train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.models.material import Material
from myraytracer_tpu.models.mesh import TriangleMesh, PHONG
from myraytracer_tpu.models.scene import Scene
from myraytracer_tpu.ops.render import render
from myraytracer_tpu.parallel import (
    make_mesh, render_sharded, train_step_sharded, split_params, merge_params,
)
from myraytracer_tpu.scenes.shapes import uv_sphere


def tiny_scene(w=16, h=16):
    s = Scene()
    s.set_camera(eye=(0, 1, 5), center=(0, 0, 0), up=(0, 1, 0), fovy=45,
                 width=w, height=h)
    s.add_light((2, 4, 4), (0.8, 0.8, 0.8))
    s.ambience = (0.2, 0.2, 0.2)
    s.add_sphere((0.8, 0, 0), 0.7, Material(diffuse=(0.7, 0, 0), mirror=0.2))
    v, f = uv_sphere(0.5, 6, 8, center=(-0.9, 0, 0))
    s.add_mesh(TriangleMesh(v, f, material=Material(diffuse=(0, 0.5, 0.5)),
                            draw_mode=PHONG))
    s.add_plane((0, -0.8, 0), (0, 1, 0), Material(diffuse=(0.5, 0.5, 0.5)))
    s.max_depth = 2
    return s


def test_has_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_render_matches_single(n_dev):
    s = tiny_scene()
    data = s.build()
    mesh = make_mesh(n_dev)
    want = np.asarray(render(data, s.camera))
    got = np.asarray(render_sharded(data, s.camera, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("n_dev", [1, 8])
def test_sharded_aa_matches_single(n_dev):
    """The AA pass under the ray mesh: selection replicated, supersample
    rays sharded — must reproduce the single-device render_aa to fp32
    rounding (identical math; XLA fuses the two program partitions
    differently, so bitwise equality is not guaranteed)."""
    from myraytracer_tpu.ops.render import render_aa
    from myraytracer_tpu.parallel import render_aa_sharded

    s = tiny_scene(24, 24)
    data = s.build()
    mesh = make_mesh(n_dev)
    want = np.asarray(render_aa(data, s.camera, budget_frac=0.2))
    got = np.asarray(render_aa_sharded(data, s.camera, mesh,
                                       budget_frac=0.2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_train_step_runs_and_reduces_loss():
    s = tiny_scene()
    data = s.build()
    mesh = make_mesh(4)
    xs, ys = s.camera.pixel_grid()
    o, d = s.camera.primary_rays(xs.ravel(), ys.ravel())
    target = jnp.zeros((o.shape[0], 3))

    s1, l1 = train_step_sharded(data, o, d, target, mesh, lr=2.0)
    s2, l2 = train_step_sharded(s1, o, d, target, mesh, lr=2.0)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # SGD toward black reduces MSE


@pytest.mark.slow
def test_train_step_grads_match_unsharded():
    s = tiny_scene(8, 8)
    data = s.build()
    xs, ys = s.camera.pixel_grid()
    o, d = s.camera.primary_rays(xs.ravel(), ys.ravel())
    target = jnp.full((o.shape[0], 3), 0.25)

    from myraytracer_tpu.ops import tracer as tr

    def loss_fn(params):
        sc = merge_params(data, params)
        c = tr.trace(sc, o, d)
        return jnp.mean((c - target) ** 2)

    params = split_params(data)
    g_ref = jax.grad(loss_fn)(params)

    mesh = make_mesh(8)
    s1, _ = train_step_sharded(data, o, d, target, mesh, lr=1.0)
    # sharded update = params - lr * grad(mean sq err); recover grad
    for name in ("light_color", "mat_diffuse", "sphere_center"):
        implied = (params[name] - getattr(s1, name)) / 1.0
        np.testing.assert_allclose(
            np.asarray(implied), np.asarray(g_ref[name]), atol=1e-5,
            err_msg=name,
        )


def test_split_merge_roundtrip():
    data = tiny_scene().build()
    params = split_params(data)
    assert "vertex_pos" in params and "mat_diffuse" in params
    assert "tri_vidx" not in params  # ints are not parameters
    back = merge_params(data, params)
    np.testing.assert_allclose(np.asarray(back.vertex_pos), np.asarray(data.vertex_pos))
