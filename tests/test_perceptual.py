"""Perceptual regression vs the reference golden PNGs.

The reference images (/root/reference/outputs/*.png) are the only ground
truth the reference ships (SURVEY.md §4). Our scenes are procedural
re-creations, so pixel equality is impossible — instead each render is
compared on a coarse GRID x GRID grid of mean cell colors, which pins
composition, palette and large-scale structure (it would catch e.g. the
o_10 creatures regressing to blobs, or the o_08 back room going dark)
while tolerating small-geometry differences.

Thresholds are calibrated to the current scenes plus a margin; they
should only ever be *tightened* as the scenes improve.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from myraytracer_tpu.ops.render import render
from myraytracer_tpu.scenes.golden import GOLDEN_SCENES
from myraytracer_tpu.utils.image import read_png

REF_DIR = "/root/reference/outputs"
GRID = 8
SCALE = 0.25

#: (mean cell delta, max cell delta) allowed per scene — pinned at
#: measured + 0.02 mean / + 0.05 max (re-measured 2026-08-19 after the
#: round-3 o_08 rebuild — window partition/ceiling/walls re-derived from
#: the reference PNG — and the o_06 skin/lighting/shape pass; renders
#: are deterministic on the CPU test backend so the margins only cover
#: future intentional scene edits)
THRESHOLDS = {
    "o_01_spheres": (0.043, 0.110),   # measured 0.0224 / 0.0592 (round-5 geometric solve + refit)
    "o_02_shadow": (0.033, 0.115),    # measured 0.0129 / 0.0646 (round-5 fit: limb reflections)
    "o_03_mirror": (0.046, 0.168),    # measured 0.0252 / 0.1176 (round-5 fit, corridor kept)
    "o_04_molecule": (0.048, 0.122),  # measured 0.0273 / 0.0718 (round-5 env fit + seed sweep)
    "o_05_cube": (0.035, 0.188),      # measured 0.0148 / 0.1373 (round-5 fit)
    "o_06_mask": (0.040, 0.217),      # measured 0.0199 / 0.1672 (round-5 fit)
    "o_07_toon_faces": (0.052, 0.172),  # measured 0.0321 / 0.1215 (round-5 fit + mirror 0.08)
    "o_08_office": (0.046, 0.170),    # measured 0.0256 / 0.1172 (round-5 composition rebuild + palette fit)
    "o_09_rings": (0.036, 0.160),     # measured 0.0162 / 0.1099 (round-5 fit: mirror inter-reflections)
    "o_10_pokemon": (0.061, 0.161),   # measured 0.0408 / 0.1110 (round-5 vignettes + creature shifts)
}


def _cells(img: np.ndarray, grid: int = GRID) -> np.ndarray:
    h, w, _ = img.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros((grid, grid, 3), np.float32)
    for i in range(grid):
        for j in range(grid):
            out[i, j] = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean((0, 1))
    return out


@pytest.mark.parametrize("name", sorted(GOLDEN_SCENES))
def test_perceptual_vs_reference(name):
    ref_path = os.path.join(REF_DIR, f"{name}.png")
    if not os.path.exists(ref_path):
        pytest.skip("reference outputs not available")
    builder, _ = GOLDEN_SCENES[name]
    sc = builder(scale=SCALE)
    img = np.asarray(render(sc.build(), sc.camera))
    ref = read_png(ref_path)

    diff = np.abs(_cells(img) - _cells(ref)).mean(-1)
    mean_thr, max_thr = THRESHOLDS[name]
    assert diff.mean() < mean_thr, (
        f"{name}: mean cell delta {diff.mean():.3f} >= {mean_thr}")
    assert diff.max() < max_thr, (
        f"{name}: max cell delta {diff.max():.3f} >= {max_thr}")
