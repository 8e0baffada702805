from myraytracer_tpu.parallel.mesh import make_mesh, ray_sharding
from myraytracer_tpu.parallel.shard_render import (
    render_sharded,
    render_aa_sharded,
    make_train_step,
    train_step_sharded,
    split_params,
    merge_params,
)
