"""Roofline / speed-of-light accounting for the office benchmark.

Answers the question the reference's my-ncu.sh (my-ncu.sh:14-38) answers
with hardware counters: what fraction of the chip's peak the render
achieves and which resource bounds it.

XLA's ``compiled.cost_analysis()`` is useless for this program (it
counts loop bodies once — it reports 0.2 GFLOP for a render that
executes ~150 GFLOP), so the accounting is analytic: the tracer's work
is a handful of dense, countable kernels —

  phase 1 (XLA)    ray x cluster slab tests        ~30 flops each
  phase 2 (Pallas) ray x 128-tri Cramer solves     ~55 flops each
                   + one 8 KB cluster-constant DMA per
                   (512-ray subgroup, touched cluster)

The touched-cluster statistics are computed exactly (same phase-1 code
path the kernel uses), so the FLOP/byte totals are the real executed
work, not estimates. Stage times are measured with config ablations
(lights off / depth 0), the same decomposition as PERF.md's cost
structure.

v5e peaks used:
  HBM bandwidth   819 GB/s (published chip spec)
  VPU fp32        ~3.9 TFLOP/s = 8 sublanes x 128 lanes x 4 ALUs
                  x ~0.94 GHz (FMA-counted-as-2 would double this; the
                  tracer is mostly compare/select math, so the
                  conservative figure is used)
  MXU bf16        197 TFLOP/s (unused: the fp32 elementwise solve beat
                  the MXU form, PERF.md)

Usage (in the TPU worker or standalone):
    python tools/roofline.py
"""

from __future__ import annotations

import time

HBM_GBPS = 819.0
VPU_TFLOPS = 3.9

FLOPS_SLAB = 30.0     # ray-AABB slab test (12 mul/sub, 10 min/max, cmps)
FLOPS_TRI = 55.0      # Cramer solve + inside test + argmin update
DMA_BYTES = 16 * 128 * 4  # one cluster-constant block [16, M=128] f32


def row(name: str, gflops: float, gbytes: float, measured_s: float) -> dict:
    t_flops = gflops / (VPU_TFLOPS * 1e3)
    t_bw = gbytes / HBM_GBPS
    t_sol = max(t_flops, t_bw)
    return {
        "name": name,
        "gflops": round(gflops, 1),
        "gbytes": round(gbytes, 2),
        "bound": "compute" if t_flops >= t_bw else "memory",
        "measured_s": round(measured_s, 4),
        "sol_s": round(t_sol, 4),
        "pct_of_sol": round(100.0 * t_sol / measured_s, 1),
        "achieved_tflops": round(gflops / measured_s / 1e3, 3),
        "achieved_gbps": round(gbytes / measured_s, 1),
    }


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("MRT_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from myraytracer_tpu.ops import intersect as isx
    from myraytracer_tpu.ops.pallas_cluster import SUB
    from myraytracer_tpu.ops.render import BLOCK, render
    from myraytracer_tpu.scenes.golden import scene_08_office

    width, height = 1920, 1080
    sc = scene_08_office(tess=10, resolution=(width, height))
    scene = sc.build()
    K = int(scene.cl_bbmin.shape[0])
    n_lights = int(scene.light_pos.shape[0])

    def sync(x):
        return float(jnp.asarray(jax.tree.leaves(x)[0]).sum())

    # block-ordered primary rays, exactly as render() emits them
    bh = bw = BLOCK
    Hp = ((height + bh - 1) // bh) * bh
    Wp = ((width + bw - 1) // bw) * bw
    ys, xs = jnp.meshgrid(jnp.arange(Hp, dtype=jnp.float32),
                          jnp.arange(Wp, dtype=jnp.float32), indexing="ij")

    def to_blocks(a):
        return a.reshape(Hp // bh, bh, Wp // bw, bw).transpose(
            0, 2, 1, 3).reshape(-1)

    o, d = sc.camera.primary_rays(to_blocks(xs), to_blocks(ys))
    R = o.shape[0]

    # ---- exact touched-cluster statistics (the phase-1 rule) ----
    @jax.jit
    def touched_stats(o, d):
        n_sub = R // SUB
        o_s = o.reshape(n_sub, SUB, 3)
        iv = (1.0 / d).reshape(n_sub, SUB, 3)
        hit, _ = isx.ray_aabb(o_s[:, :, None, :], iv[:, :, None, :],
                              scene.cl_bbmin[None, None],
                              scene.cl_bbmax[None, None])
        per_sub = jnp.sum(jnp.any(hit, axis=1).astype(jnp.int32), axis=1)
        per_ray = jnp.sum(hit.astype(jnp.int32), axis=2)
        return per_sub, per_ray

    per_sub, per_ray = touched_stats(o, d)
    tot_sub_clusters = float(jnp.sum(per_sub))       # Σ subgroup-touched
    mean_sub = float(jnp.mean(per_sub))
    mean_ray = float(jnp.mean(per_ray))

    # ---- measured stage times (scene ablations, 2 reps, best) ----
    def timed(scn):
        sync(render(scn, sc.camera))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sync(render(scn, sc.camera))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timed(scene)
    # primary-only ablation: no lights (kills shadow queries) and
    # max_depth=0 (kills the mirror chain) isolates one traverse+shade
    sp = scene_08_office(tess=10, resolution=(width, height))
    sp.lights = []
    sp.max_depth = 0
    t_primary = timed(sp.build())
    t_shadow = t_full - t_primary

    # ---- analytic work ----
    # per closest-hit segment batch over R rays:
    p1_gflops = R * K * FLOPS_SLAB / 1e9
    p2_gflops = tot_sub_clusters * SUB * 128 * FLOPS_TRI / 1e9
    p2_gbytes = tot_sub_clusters * DMA_BYTES / 1e9
    ray_state_gb = R * 64 / 1e9   # o,d in + t/idx/act/shade state out

    primary = row("primary segment (traverse+shade, lights off)",
                  p1_gflops + p2_gflops,
                  p2_gbytes + ray_state_gb, t_primary)
    # shadow batch: L*R any-hit rays through the same two phases;
    # any-hit early-outs make this an upper bound on executed work
    shadow = row(f"shadow queries ({n_lights} lights, upper bound)",
                 n_lights * (p1_gflops + p2_gflops),
                 n_lights * (p2_gbytes + ray_state_gb), max(t_shadow, 1e-9))
    full = row("office 1080p forward (total)",
               primary["gflops"] + shadow["gflops"],
               primary["gbytes"] + shadow["gbytes"], t_full)

    print(f"scene: {int(scene.n_tris)} tris, {K} clusters, R={R} rays")
    print(f"touched clusters: mean/ray {mean_ray:.1f}, "
          f"mean/{SUB}-subgroup {mean_sub:.1f} "
          f"(amplification {mean_sub / max(mean_ray, 1e-9):.1f}x)")
    for r in (primary, shadow, full):
        print(r)


if __name__ == "__main__":
    main()
