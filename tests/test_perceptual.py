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

#: (mean cell delta, max cell delta) allowed per scene — calibrated
#: 2026-08-17 at margins of ~+0.03 mean / +0.10 max over measured values
#: (o_03/o_04/o_05/o_07/o_08 re-calibrated 2026-08-18 after the
#: round-2 fidelity pass: reframes, sculpted heads, brightness structure)
THRESHOLDS = {
    "o_01_spheres": (0.10, 0.25),
    "o_02_shadow": (0.065, 0.28),
    "o_03_mirror": (0.075, 0.26),
    "o_04_molecule": (0.10, 0.28),
    "o_05_cube": (0.05, 0.27),
    "o_06_mask": (0.12, 0.55),
    "o_07_toon_faces": (0.115, 0.28),
    "o_08_office": (0.15, 0.45),
    "o_09_rings": (0.09, 0.30),
    "o_10_pokemon": (0.10, 0.29),
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
