"""Texture-atlas sampling.

The atlas layout is the reference's scheme (build_Data, mytracer.cpp:
260-276): every mesh's texels are concatenated into one flat [X, 3] array
with a per-mesh (width, height, offset) record — here denormalized to a
per-triangle ``tri_tex`` record so a hit needs a single gather chain.

``nearest`` reproduces the reference fetch exactly (mymesh.cpp:79-94 /
mytracer_gpu.cu:527-543): clamp UV to [0,1], v-flip,
``px = round(u*(W-1))``, ``py = round((1-v)*(H-1))``.

``bilinear`` is the differentiable relaxation used by the backward pass:
gradients flow into both the texels and the UV coordinates (and through
them into vertex positions). SURVEY.md §7 M5.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_nearest(texels, tex_rec, u, v):
    """Nearest-neighbor atlas fetch.

    Args:
        texels: [X, 3] atlas.
        tex_rec: [R, 3] int32 (W, H, offset) per ray; W == -1 -> untextured
            (caller selects the material diffuse instead).
        u, v: [R] interpolated UV.
    Returns: [R, 3] texel colors (garbage where W == -1; caller masks).
    """
    w = jnp.maximum(tex_rec[:, 0], 1)
    h = jnp.maximum(tex_rec[:, 1], 1)
    off = jnp.maximum(tex_rec[:, 2], 0)
    uc = jnp.clip(u, 0.0, 1.0)
    vc = jnp.clip(v, 0.0, 1.0)
    px = jnp.round(uc * (w - 1).astype(u.dtype)).astype(jnp.int32)
    py = jnp.round((1.0 - vc) * (h - 1).astype(v.dtype)).astype(jnp.int32)
    flat = jnp.clip(off + py * w + px, 0, texels.shape[0] - 1)
    return texels[flat]


def sample_bilinear(texels, tex_rec, u, v):
    """Bilinearly filtered atlas fetch (differentiable in texels and UV)."""
    w = jnp.maximum(tex_rec[:, 0], 1)
    h = jnp.maximum(tex_rec[:, 1], 1)
    off = jnp.maximum(tex_rec[:, 2], 0)
    uc = jnp.clip(u, 0.0, 1.0)
    vc = jnp.clip(v, 0.0, 1.0)
    fx = uc * (w - 1).astype(u.dtype)
    fy = (1.0 - vc) * (h - 1).astype(v.dtype)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    def fetch(xi, yi):
        flat = jnp.clip(off + yi * w + xi, 0, texels.shape[0] - 1)
        return texels[flat]

    c00 = fetch(x0i, y0i)
    c10 = fetch(x1i, y0i)
    c01 = fetch(x0i, y1i)
    c11 = fetch(x1i, y1i)
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty
