"""Weak-scaling harness for the sharded train step (virtual-mesh proxy).

Fixed per-device ray count; devices 1 -> 2 -> 4 -> 8 on the CPU virtual
mesh (xla_force_host_platform_device_count). Perfect weak scaling keeps
per-step wall time constant as total work grows with the mesh; this is
the program-structure proxy for the BASELINE ">=80% linear on v4-16"
axis that single-chip hardware can't measure directly (SURVEY.md §5.8 —
forward is zero-communication, backward all-reduces scene grads once).

Usage: python tools/weak_scaling.py [rays_per_device] [max_devices]
Prints one table row per mesh size + a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rays_per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    max_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # single-threaded per virtual device: without this every device's op
    # fans out over the shared Eigen pool, so an 8-device mesh on a 4-core
    # host measures thread thrash, not program structure
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max_dev}"
        + " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from myraytracer_tpu.parallel import make_mesh
    from myraytracer_tpu.scenes.golden import scene_08_office

    sc = scene_08_office(tess=2, resolution=(64, 64))
    scene = sc.build()

    rows = []
    n = 1
    while n <= max_dev:
        R = rays_per_dev * n
        rng = np.random.default_rng(0)
        # rays toward the scene from the camera position, block-coherent
        # enough for the cluster tracer to behave like the real driver
        xs = rng.uniform(0, 64, R).astype(np.float32)
        ys = rng.uniform(0, 64, R).astype(np.float32)
        o, d = sc.camera.primary_rays(jnp.asarray(xs), jnp.asarray(ys))
        target = jnp.zeros((R, 3), jnp.float32)
        mesh = make_mesh(n)

        # compiled-program accounting: cost_analysis() describes the
        # per-device SPMD module, so its flops must stay CONSTANT as the
        # mesh grows — structural evidence that each chip does the same
        # work regardless of mesh size, independent of the host-CPU
        # contention that pollutes virtual-mesh wall times.
        from myraytracer_tpu.parallel.shard_render import make_train_step

        step = make_train_step(mesh, lr=0.0)
        w = jnp.ones((R,), jnp.float32)
        ca = step.lower(scene, o, d, target, w).compile().cost_analysis()
        flops_dev = float(ca.get("flops", 0.0)) if ca else float("nan")

        # compile + warm
        _, loss = step(scene, o, d, target, w)
        float(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss = step(scene, o, d, target, w)
            float(loss)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rows.append({"devices": n, "rays": R, "step_s": round(dt, 4),
                     "rays_per_s": round(R / dt, 1),
                     "gflop_per_device": round(flops_dev / 1e9, 3)})
        print(f"devices={n:2d} rays={R:7d} step={dt:8.4f}s "
              f"rays/s={R / dt:12.1f} gflop/dev={flops_dev / 1e9:8.3f}",
              flush=True)
        n *= 2

    base = rows[0]["step_s"]
    eff = [round(base / r["step_s"], 3) for r in rows]
    fbase = rows[0]["gflop_per_device"]
    fconst = [round(r["gflop_per_device"] / fbase, 3) if fbase else None
              for r in rows]
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "rays_per_device": rays_per_dev,
                      "rows": rows, "efficiency": eff,
                      "flop_per_device_ratio": fconst}))


if __name__ == "__main__":
    main()
