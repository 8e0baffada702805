from myraytracer_tpu.ops import intersect
from myraytracer_tpu.ops import bvh
from myraytracer_tpu.ops import shade
from myraytracer_tpu.ops import render
