"""TPU performance probes for the traversal path.

Usage:
  python tools/perf_probe.py gathers            # microbench access patterns
  python tools/perf_probe.py traverse R [steps] # traversal-only timing
  python tools/perf_probe.py render W H LEAF    # office render timing
  python tools/perf_probe.py steps              # step-count statistics (CPU)

Every probe bounds its work so a slow pattern reports slow instead of
wedging the TPU worker.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def bench(f, *args, n=5):
    import jax

    f = jax.jit(f)
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


def probe_gathers():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    R, N = 1 << 17, 16384

    tbl8 = jax.random.normal(key, (N, 8))
    idx = jax.random.randint(key, (R,), 0, N)
    t = bench(lambda tb, ix: tb[ix], tbl8, idx)
    print(f"row-gather [R,8] R={R}: {t*1e3:.3f} ms ({R/t/1e6:.1f} Mrows/s)")

    tbl9 = jax.random.normal(key, (N, 9))
    t = bench(lambda tb, ix: tb[ix], tbl9, idx)
    print(f"row-gather [R,9] R={R}: {t*1e3:.3f} ms ({R/t/1e6:.1f} Mrows/s)")

    flat = jax.random.normal(key, (N * 9 + 64,))
    starts = idx * 9
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(flat, (s,), (36,)))
    t = bench(lambda s: win(s), starts)
    print(f"vmap(dyn_slice) window 36 R={R}: {t*1e3:.3f} ms ({R/t/1e6:.1f} Mrows/s)")

    # gather inside a while loop (traversal shape)
    def loop_gather(tb, ix):
        def body(s):
            i, acc = s
            acc = acc + tb[(ix + i) % N][:, 0]
            return i + 1, acc

        def cond(s):
            return s[0] < 32

        return jax.lax.while_loop(cond, body, (0, jnp.zeros(R)))[1]

    t = bench(loop_gather, tbl8, idx)
    print(f"32x row-gather in while_loop: {t*1e3:.3f} ms "
          f"({32*R/t/1e6:.1f} Mrows/s)")


def office_scene(w, h, leaf, tess=10):
    from myraytracer_tpu.scenes.golden import scene_08_office

    sc = scene_08_office(tess=tess, resolution=(w, h))
    return sc, sc.build(leaf_size=leaf)


def probe_traverse(R=65536, max_steps=2000, leaf=4):
    import jax
    import jax.numpy as jnp

    from myraytracer_tpu.ops import traverse

    sc, scene = office_scene(640, 360, leaf)
    print(f"scene: {scene.n_tris} tris {scene.n_nodes} nodes leaf={scene.max_leaf}")
    xs, ys = sc.camera.pixel_grid()
    o, d = sc.camera.primary_rays(xs.ravel()[:R], ys.ravel()[:R])

    def go(o, d):
        hit = traverse.traverse_bvh(scene, o, d, max_steps=max_steps)
        return hit.t.sum(), (hit.idx >= 0).sum()

    t = bench(go, o, d, n=3)
    print(f"traverse R={R} max_steps={max_steps}: {t*1e3:.1f} ms "
          f"({R/t/1e6:.3f} Mray/s)")


def probe_render(w=480, h=270, leaf=8):
    import numpy as np

    from myraytracer_tpu.ops.render import render

    sc, scene = office_scene(w, h, leaf)
    t0 = time.perf_counter()
    img = np.asarray(render(scene, sc.camera))
    t1 = time.perf_counter()
    img = np.asarray(render(scene, sc.camera))
    t2 = time.perf_counter()
    n = w * h
    print(f"render {w}x{h} leaf={leaf}: compile {t1-t0:.1f}s run {t2-t1:.3f}s "
          f"({n/(t2-t1)/1e6:.3f} Mray/s) mean={img.mean():.4f}")


def probe_steps():
    """CPU: how many lockstep iterations does a tile actually take?"""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from myraytracer_tpu.ops import traverse

    for leaf in (2, 4, 8, 16, 32):
        sc, scene = office_scene(640, 360, leaf)
        xs, ys = sc.camera.pixel_grid()
        for R in (4096, 65536):
            o, d = sc.camera.primary_rays(xs.ravel()[:R], ys.ravel()[:R])
            _, steps = traverse.traverse_bvh(scene, o, d, return_steps=True)
            print(f"leaf={leaf} nodes={scene.n_nodes} R={R}: "
                  f"lockstep steps {int(steps)}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "gathers"
    if cmd == "gathers":
        probe_gathers()
    elif cmd == "traverse":
        R = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
        leaf = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        probe_traverse(R, steps, leaf)
    elif cmd == "render":
        w = int(sys.argv[2]) if len(sys.argv) > 2 else 480
        h = int(sys.argv[3]) if len(sys.argv) > 3 else 270
        leaf = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        probe_render(w, h, leaf)
    elif cmd == "steps":
        probe_steps()
    else:
        print(__doc__)
