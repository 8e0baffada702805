"""CLI smoke tests: every verb drives the real pipeline end-to-end.

The reference has no CLI (SURVEY.md §5.6 — backend choice was a
compile-time flag); ours is part of the public surface, so each
subcommand gets an end-to-end run at tiny sizes.
"""

import numpy as np
import pytest

from myraytracer_tpu.cli import main
from myraytracer_tpu.utils.image import read_png, write_png


def test_render_golden(tmp_path):
    out = str(tmp_path / "r.png")
    rc = main(["render", "--golden", "o_05_cube", "--scale", "0.08",
               "--out", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (40, 40, 3)
    assert img.max() > 0.2  # something rendered


def test_render_golden_prefix_match(tmp_path):
    out = str(tmp_path / "r.png")
    assert main(["render", "--golden", "o_05", "--scale", "0.08",
                 "--out", out]) == 0


def test_render_scene_file(tmp_path):
    sce = tmp_path / "s.sce"
    sce.write_text(
        "camera 0 0 5  0 0 0  0 1 0  45 32 24\n"
        "light 2 4 4  0.8 0.8 0.8\n"
        "ambience 0.2 0.2 0.2\n"
        "background 0 0 0\n"
        "depth 2\n"
        "sphere 0 0 0  1.0  0.2 0 0  0.7 0 0  0.5 0.5 0.5  30  0\n"
    )
    out = str(tmp_path / "r.png")
    assert main(["render", "--scene", str(sce), "--out", out]) == 0
    assert read_png(out).shape == (24, 32, 3)


def test_render_aa_flag(tmp_path):
    out = str(tmp_path / "r.png")
    assert main(["render", "--golden", "o_05_cube", "--scale", "0.08",
                 "--aa", "--out", out]) == 0


def test_fit_verb(tmp_path):
    # target = a darkened render of the same scene; the fit must recover
    # a lower loss by dimming materials
    tgt = str(tmp_path / "t.png")
    assert main(["render", "--golden", "o_05_cube", "--scale", "0.08",
                 "--out", tgt]) == 0
    img = read_png(tgt)
    write_png(tgt, np.clip(img * 0.75, 0, 1))
    out = str(tmp_path / "fit.png")
    rc = main(["fit", "--golden", "o_05_cube", "--scale", "0.08",
               "--target", tgt, "--params", "mat_diffuse,mat_ambient",
               "--steps", "15", "--lr", "0.05", "--out", out])
    assert rc == 0
    fitted = read_png(out)
    # fitted render is darker than the original (moved toward the target)
    assert fitted.mean() < img.mean()


def test_fit_rejects_wrong_resolution(tmp_path):
    tgt = str(tmp_path / "t.png")
    write_png(tgt, np.zeros((8, 8, 3), np.float32))
    assert main(["fit", "--golden", "o_05_cube", "--scale", "0.08",
                 "--target", tgt, "--steps", "1"]) == 2


def test_unknown_golden_errors(tmp_path):
    assert main(["render", "--golden", "nope",
                 "--out", str(tmp_path / "r.png")]) == 2
