from myraytracer_tpu.utils import vecmath
from myraytracer_tpu.utils import image
