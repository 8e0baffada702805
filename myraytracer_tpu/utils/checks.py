"""Runtime guards: the functional replacement for the reference's CHECK
macro and sanitizers (SURVEY.md §5.2).

JAX renders can't race, but NaN/Inf can silently propagate through masked
lanes; ``checked_trace`` wraps the integrator with jax.experimental.checkify
so a debug run *errors* on non-finite radiance instead of writing black
pixels. Use in tests/debugging — the production path stays guard-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from myraytracer_tpu.ops import tracer as tr


def checked_trace(scene, o, d, cfg: tr.TraceConfig = tr.TraceConfig()):
    """Trace with finiteness checks; raises on NaN/Inf radiance.

    Returns the color batch; call inside jit or eagerly.
    """

    def fn(scene, o, d):
        color = tr.trace(scene, o, d, cfg)
        checkify.check(
            jnp.isfinite(color).all(), "non-finite radiance in trace output"
        )
        checkify.check(
            jnp.all(color > -1e-4), "negative radiance in trace output"
        )
        return color

    err, color = checkify.checkify(fn)(scene, o, d)
    err.throw()
    return color


def assert_valid_image(img) -> None:
    """Host-side image sanity: finite, clamped, correctly shaped."""
    import numpy as np

    arr = np.asarray(img)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"expected [H, W, 3] image, got {arr.shape}")
    if not np.isfinite(arr).all():
        raise ValueError("image contains non-finite values")
    if arr.min() < -1e-6 or arr.max() > 1.0 + 1e-6:
        raise ValueError(f"image outside [0, 1]: [{arr.min()}, {arr.max()}]")
