"""Fit a golden scene's palette to its reference PNG by inverse rendering.

The procedural golden scenes match the reference's composition but their
hand-tuned palettes (materials, light colors, ambience, background) are
the main residual in the perceptual-cell metric. This tool closes that
gap with the framework's own differentiable path: render the scene at low
resolution, take the same GRID x GRID mean-cell statistics the perceptual
test uses, and optimize the color-like scene leaves against the reference
cells by Adam.

Usage:
  python tools/fit_palette.py o_07_toon_faces [--steps 300] [--scale 0.25]

Prints the fitted per-leaf values (deduped material table rows) so they
can be folded back into scenes/golden.py as constants — the scenes stay
self-contained, the fit is a build-time tool, not a runtime dependency.
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.parallel.shard_render import merge_params
from myraytracer_tpu.scenes.golden import GOLDEN_SCENES
from myraytracer_tpu.utils.image import read_png

GRID = 8

#: leaves the palette fit may move (colors + global light/tone; geometry
#: and camera stay fixed so composition cannot drift)
FIT_LEAVES = ("mat_ambient", "mat_diffuse", "mat_specular", "light_color",
              "ambience", "background", "mat_mirror")


def cells_jnp(img, grid=GRID):
    h, w, _ = img.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    rows = []
    for i in range(grid):
        cols = [img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean((0, 1))
                for j in range(grid)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--lr", type=float, default=2e-2)
    args = ap.parse_args()

    builder, _ = GOLDEN_SCENES[args.scene]
    sc = builder(scale=args.scale)
    data = sc.build()
    ref = read_png(f"/root/reference/outputs/{args.scene}.png")
    ref_cells = cells_jnp(jnp.asarray(ref))

    cam = sc.camera
    xs, ys = cam.pixel_grid()
    o, d = cam.primary_rays(xs.ravel(), ys.ravel())
    H, W = cam.height, cam.width

    params = {n: getattr(data, n) for n in FIT_LEAVES}

    @jax.jit
    def loss_fn(p):
        s = merge_params(data, p)
        img = tr.trace(s, o, d).reshape(H, W, 3)
        img = jnp.minimum(img, 1.0)
        dc = cells_jnp(img) - ref_cells
        return jnp.mean(dc * dc)

    opt = optax.adam(args.lr)
    state = opt.init(params)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)
        # keep colors physical
        p = {k: jnp.clip(v, 0.0, 1.5 if k.startswith("mat") or k in
                         ("ambience", "background") else 2.0)
             for k, v in p.items()}
        return p, st, l

    for i in range(args.steps):
        params, state, l = step(params, state)
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i}: cell-mse {float(l):.6f}")

    # report in the perceptual test's units
    final = merge_params(data, params)
    img = np.asarray(jnp.minimum(
        tr.trace(final, o, d).reshape(H, W, 3), 1.0))
    diff = np.abs(np.asarray(cells_jnp(jnp.asarray(img)))
                  - np.asarray(ref_cells)).mean(-1)
    print(f"final cell delta: mean {diff.mean():.4f} max {diff.max():.4f}")

    np.set_printoptions(precision=3, suppress=True)
    for n in FIT_LEAVES:
        print(f"--- {n} ---")
        print(np.asarray(params[n]))


if __name__ == "__main__":
    main()
