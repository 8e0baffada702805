"""Inverse-rendering optimizer + checkpoint/resume + profiling metrics."""

import dataclasses

import jax
import numpy as np
import optax
import pytest

from myraytracer_tpu.inverse import InverseRenderer
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.utils.profiling import Timer, render_metrics, scene_footprint_bytes

from test_grad import grad_scene, central_rays


@pytest.fixture(scope="module")
def setup():
    s = grad_scene()
    data = s.build()
    o, d = central_rays(s.camera, n=120, margin=0.2, seed=9)
    target = tr.trace(data, o, d)
    return s, data, o, d, target


def test_recovers_materials(setup):
    s, data, o, d, target = setup
    wrong = dataclasses.replace(
        data,
        mat_diffuse=data.mat_diffuse * 0.4,
        light_color=data.light_color * 2.0,
    )
    inv = InverseRenderer(wrong, param_names=("mat_diffuse", "light_color"),
                          optimizer=optax.adam(5e-2))
    res = inv.fit(o, d, target, steps=150)
    assert res.losses[-1] < res.losses[0] * 0.02
    np.testing.assert_allclose(
        np.asarray(res.scene.light_color), np.asarray(data.light_color), atol=0.15)


def test_mirror_recoverable_from_zero(setup):
    """A mirror-free start scene has live_depth=1 (models/scene.py), which
    would statically kill d(image)/d(mirror); InverseRenderer must restore
    the full chain when mat_mirror is optimized."""
    s, data, o, d, _ = setup
    target = tr.trace(data, o, d)  # data has mirror=0.3 on the sphere
    flat = dataclasses.replace(
        data, mat_mirror=np.zeros_like(np.asarray(data.mat_mirror)),
        live_depth=1)
    assert flat.n_segments == 1
    inv = InverseRenderer(flat, param_names=("mat_mirror",),
                          optimizer=optax.adam(3e-2))
    assert inv.base_scene.n_segments == data.max_depth + 1
    res = inv.fit(o, d, target, steps=60)
    assert res.losses[-1] < res.losses[0] * 0.5
    assert float(np.max(np.asarray(res.scene.mat_mirror))) > 0.05


def test_rejects_bad_param_name(setup):
    _, data, *_ = setup
    with pytest.raises(ValueError):
        InverseRenderer(data, param_names=("tri_vidx",))


def test_checkpoint_roundtrip(tmp_path, setup):
    s, data, o, d, target = setup
    wrong = dataclasses.replace(data, mat_diffuse=data.mat_diffuse * 0.5)
    inv = InverseRenderer(wrong, param_names=("mat_diffuse",),
                          optimizer=optax.adam(3e-2))
    inv.fit(o, d, target, steps=10)
    ck = str(tmp_path / "ckpt")
    inv.save_checkpoint(ck)

    inv2 = InverseRenderer(wrong, param_names=("mat_diffuse",),
                           optimizer=optax.adam(3e-2))
    inv2.restore_checkpoint(ck)
    assert inv2.step_count == 10
    np.testing.assert_allclose(
        np.asarray(inv2.params["mat_diffuse"]),
        np.asarray(inv.params["mat_diffuse"]))

    # resuming continues to make progress
    r1 = inv.fit(o, d, target, steps=5)
    r2 = inv2.fit(o, d, target, steps=5)
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=1e-4)


def test_timer_and_metrics(setup):
    s, data, o, d, _ = setup
    out, secs = Timer.timed(tr.trace, data, o, d)
    assert secs > 0 and np.isfinite(np.asarray(out)).all()
    m = render_metrics(data, s.camera.width, s.camera.height, render_s=secs)
    assert m["rays"] == s.camera.width * s.camera.height
    assert m["rays_per_s"] > 0
    assert m["scene_bytes"] == scene_footprint_bytes(data) > 0
    assert m["bvh_nodes"] == data.n_nodes
