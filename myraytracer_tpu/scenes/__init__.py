from myraytracer_tpu.scenes import shapes
