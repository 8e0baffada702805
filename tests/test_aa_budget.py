"""Adaptive-supersampling budget covers the reference rule on every golden.

The reference's second kernel supersamples EVERY pixel whose
4-neighborhood squared-color deviation exceeds 0.02
(/root/reference/mytracer_gpu.cu:195-221, unbounded). Our static-shape
pass compacts the top-K deviating pixels (ops/render.py render_aa), so
the semantics match the reference iff K >= count(deviation > threshold).
This test renders pass 1 of each golden AT ITS REFERENCE RESOLUTION and
asserts the registered per-scene budget actually covers.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from myraytracer_tpu.ops.render import AA_THRESHOLD, _deviation, render
from myraytracer_tpu.scenes import golden


@pytest.mark.parametrize("name", sorted(golden.GOLDEN_SCENES))
def test_budget_covers_reference_rule(name):
    builder, budget = golden.GOLDEN_SCENES[name]
    sc = builder(scale=1.0)
    img = render(sc.build(), sc.camera)
    dev = np.asarray(_deviation(img))
    frac = float((dev > AA_THRESHOLD).mean())
    assert frac <= budget, (
        f"{name}: {frac:.4f} of pixels exceed the AA threshold but the "
        f"compaction budget is only {budget}; raise it in GOLDEN_SCENES")
