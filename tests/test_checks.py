"""Runtime guards + image loss-grad path."""

import jax.numpy as jnp
import numpy as np
import pytest

from myraytracer_tpu.ops.render import (
    render, render_loss_grad, render_loss_grad_image,
)
from myraytracer_tpu.utils.checks import checked_trace, assert_valid_image

from test_grad import grad_scene, central_rays


def test_checked_trace_passes_on_clean_scene():
    s = grad_scene()
    data = s.build()
    o, d = central_rays(s.camera, n=30)
    color = checked_trace(data, o, d)
    assert np.isfinite(np.asarray(color)).all()


def test_checked_trace_raises_on_nan_scene():
    import dataclasses

    s = grad_scene()
    data = s.build()
    bad = dataclasses.replace(
        data, light_color=data.light_color * jnp.nan
    )
    o, d = central_rays(s.camera, n=10)
    with pytest.raises(Exception):
        checked_trace(bad, o, d)


def test_assert_valid_image():
    s = grad_scene()
    data = s.build()
    img = render(data, s.camera)
    assert_valid_image(img)
    with pytest.raises(ValueError):
        assert_valid_image(np.full((4, 4, 3), np.nan))
    with pytest.raises(ValueError):
        assert_valid_image(np.zeros((4, 3)))


@pytest.mark.slow
def test_image_loss_grad_matches_flat():
    s = grad_scene()
    data = s.build()
    xs, ys = s.camera.pixel_grid()
    o, d = s.camera.primary_rays(xs.ravel(), ys.ravel())
    tgt = jnp.full((s.camera.height, s.camera.width, 3), 0.2)

    l1, g1 = render_loss_grad(data, o, d, tgt.reshape(-1, 3), tile=128)
    l2, g2 = render_loss_grad_image(data, s.camera, tgt, tile=128)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=3e-4, atol=3e-5,
            err_msg=k)
