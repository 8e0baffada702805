"""Round-2 TPU probe: staged timings for bench design.

Logs each stage with wall timestamps to stdout (flushed) so a background
run shows exactly where time goes:
  stage A: tiny render compile+run (64x64, small scene)
  stage B: same tiny program in a fresh subprocess (cache-across-process?)
  stage C: office 1080p forward compile + 3 runs
  stage D: office 1080p fwd+bwd compile + 3 runs
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg: str) -> None:
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def sync(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.asarray(jax.tree.leaves(x)[0]).sum())


def tiny_render() -> float:
    import numpy as np

    from myraytracer_tpu import Material, Scene
    from myraytracer_tpu.ops.render import render

    s = Scene()
    s.set_camera(eye=(0, 1, 5), center=(0, 0, 0), up=(0, 1, 0), fovy=45,
                 width=64, height=64)
    s.add_light((2, 4, 4), (0.8, 0.8, 0.8))
    s.add_sphere((0, 0, 0), 1.0,
                 Material(diffuse=(.7, 0, 0), specular=(.5,) * 3,
                          shininess=30, mirror=0.3))
    s.add_plane((0, -1, 0), (0, 1, 0), Material(diffuse=(.5,) * 3))
    t0 = time.time()
    img = render(s.build(), s.camera)
    m = sync(img)
    return time.time() - t0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "tiny":
        # subprocess mode: just do the tiny render and print its time
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        dt = tiny_render()
        print(f"TINY_SUBPROCESS_S {dt:.2f}", flush=True)
        return

    import jax
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    # ---- stage A: tiny program ----
    dt = tiny_render()
    log(f"A tiny render compile+run: {dt:.2f}s")
    dt = tiny_render()
    log(f"A tiny render warm: {dt:.3f}s")

    # ---- stage B: cache across processes? ----
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "tiny"],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    log(f"B subprocess total {time.time()-t0:.1f}s out={r.stdout.strip()!r} "
        f"err_tail={r.stderr[-200:]!r}")

    # ---- stage C: office forward ----
    from myraytracer_tpu.ops.render import render, render_loss_grad_image
    from myraytracer_tpu.scenes.golden import scene_08_office

    t0 = time.time()
    sc = scene_08_office(tess=10, resolution=(1920, 1080))
    scene = sc.build()
    log(f"C scene build: {time.time()-t0:.1f}s (tris={int(scene.n_tris)})")

    t0 = time.time()
    img = render(scene, sc.camera)
    sync(img)
    log(f"C office fwd compile+run: {time.time()-t0:.1f}s")
    for i in range(3):
        t0 = time.time()
        img = render(scene, sc.camera)
        sync(img)
        log(f"C office fwd run {i}: {time.time()-t0:.3f}s")

    # ---- stage D: office fwd+bwd ----
    target = jnp.zeros((1080, 1920, 3), jnp.float32)
    t0 = time.time()
    loss, grads = render_loss_grad_image(scene, sc.camera, target)
    sync(loss); sync(grads)
    log(f"D office fwd+bwd compile+run: {time.time()-t0:.1f}s")
    for i in range(3):
        t0 = time.time()
        loss, grads = render_loss_grad_image(scene, sc.camera, target)
        sync(loss); sync(grads)
        log(f"D office fwd+bwd run {i}: {time.time()-t0:.3f}s")

    log("probe done")


if __name__ == "__main__":
    main()
