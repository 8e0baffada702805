from myraytracer_tpu.runtime.native import native_available, build_bvh_native
