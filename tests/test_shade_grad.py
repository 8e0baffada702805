"""Fused differentiable shade-segment (ops/shade_grad.py).

Pins, on a triangle-only mirror scene (tori) and the office:
  1. segment_ref chained over a recorded topology == trace_shade.
  2. The hand-derived backward == jax.vjp of segment_ref, every
     cotangent (o, d, w, rows48, lights, ambience, background).
  3. The Pallas kernels (interpret mode) == the plain-JAX reference,
     forward and backward.
  4. trace_shade with the fused path enabled == the plain path, and the
     scene-parameter gradients of a scalar loss agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myraytracer_tpu.ops import shade
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.ops import shade_grad as sg
from myraytracer_tpu.scenes.golden import scene_09_rings


@pytest.fixture(scope="module")
def setup():
    sc = scene_09_rings(scale=0.05, seg=10)
    scene = sc.build()
    assert scene.n_spheres == 0 and scene.n_planes == 0
    cam = sc.camera
    o, d = cam.primary_rays(*[a.ravel() for a in cam.pixel_grid()])
    topo = tr.trace_topology(scene, o, d)
    geom = shade.pack_shade_geom(scene)
    return scene, o, d, topo, geom


def _seg_inputs(scene, o, d, topo, geom, s=0):
    R = o.shape[0]
    kind, idx = topo.kind[s], topo.idx[s]
    h, miss, sh = topo.hit[s], topo.miss[s], topo.shadow[s]
    ti = jnp.clip(jnp.maximum(idx, 0), 0, scene.n_tris - 1)
    rows48 = geom.tri_pack[ti]
    lit = jnp.logical_not(sh).astype(jnp.float32)
    return (o, d, jnp.ones((R,)), rows48, scene.light_pos,
            scene.light_color, scene.ambience, scene.background,
            (kind == shade.KIND_TRI), h, miss, lit)


def test_ref_matches_trace_shade(setup):
    scene, o, d, topo, geom = setup
    plain = tr.trace_shade(scene, o, d, topo,
                           tr.TraceConfig(fused_shade_grad=False))
    R = o.shape[0]
    w = jnp.ones((R,))
    oo, dd = o, d
    col = jnp.zeros((R, 3))
    for s in range(scene.n_segments):
        args = _seg_inputs(scene, oo, dd, topo, geom, s)
        args = (oo, dd, w) + args[3:]
        add, o2, d2, w2 = sg.segment_ref(*args)
        col, oo, dd, w = col + add, o2, d2, w2
    np.testing.assert_allclose(np.asarray(col), np.asarray(plain),
                               atol=5e-6)


def test_hand_bwd_matches_autodiff(setup):
    scene, o, d, topo, geom = setup
    (o_, d_, w_, rows48, lp, lc, amb, bg, is_t, h, miss,
     lit) = _seg_inputs(scene, o, d, topo, geom)
    R = o.shape[0]
    rng = np.random.default_rng(1)
    cots = tuple(jnp.asarray(rng.normal(size=s), jnp.float32)
                 for s in ((R, 3), (R, 3), (R, 3), (R,)))

    def f(o2_, d2_, w2_, rows_, lp_, lc_, amb_, bg_):
        return sg.segment_ref(o2_, d2_, w2_, rows_, lp_, lc_, amb_, bg_,
                              is_t, h, miss, lit)

    _, vjp = jax.vjp(f, o_, d_, w_, rows48, lp, lc, amb, bg)
    ad = vjp(cots)
    mine = sg.segment_bwd_ref(o_, d_, w_, rows48, lp, lc, amb, bg,
                              is_t, h, miss, lit, *cots)
    for name, a, m in zip(("o", "d", "w", "rows", "lp", "lc", "amb",
                           "bg"), ad, mine):
        a, m = np.asarray(a), np.asarray(m)
        tol = 3e-5 * max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(m, a, atol=tol, err_msg=name)


def test_pallas_interpret_matches_ref(setup):
    scene, o, d, topo, geom = setup
    args = _seg_inputs(scene, o, d, topo, geom)
    fargs = args[:8] + (args[8].astype(jnp.float32),
                        args[9].astype(jnp.float32),
                        args[10].astype(jnp.float32), args[11])
    ref = sg.segment_ref(*args)
    pal = sg.segment_pallas(*fargs, interpret=True)
    for name, a, b in zip(("add", "o2", "d2", "w2"), ref, pal):
        # interpret-mode lowering reassociates a few fp ops (measured
        # max 2e-6 on world-scale coordinates)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, err_msg=name)

    R = o.shape[0]
    rng = np.random.default_rng(2)
    cots = tuple(jnp.asarray(rng.normal(size=s), jnp.float32)
                 for s in ((R, 3), (R, 3), (R, 3), (R,)))
    gr = sg.segment_bwd_ref(*args, *cots)
    gp = sg.segment_bwd_pallas(*fargs, *cots, interpret=True)
    for name, a, b in zip(("o", "d", "w", "rows", "lp", "lc", "amb",
                           "bg"), gr, gp):
        a, b = np.asarray(a), np.asarray(b)
        tol = 3e-5 * max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol, err_msg=name)


def test_trace_shade_fused_value_and_grads(setup):
    scene, o, d, topo, geom = setup
    cfg_plain = tr.TraceConfig(fused_shade_grad=False)
    cfg_fused = tr.TraceConfig(fused_shade_grad=True)
    plain = tr.trace_shade(scene, o, d, topo, cfg_plain)
    fused = tr.trace_shade(scene, o, d, topo, cfg_fused)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=5e-6)

    from myraytracer_tpu.parallel.shard_render import (merge_params,
                                                       split_params)

    params = split_params(scene)
    names = ("vertex_pos", "vertex_normal", "mat_diffuse", "mat_mirror",
             "mat_shininess", "light_pos", "light_color", "ambience",
             "background")
    sub = {k: params[k] for k in names}
    tgt = plain + 0.03

    def loss(p, cfg):
        sc2 = merge_params(scene, {**params, **p})
        c = tr.trace_shade(sc2, o, d, topo, cfg)
        return jnp.sum((c - tgt) ** 2)

    g_plain = jax.grad(lambda p: loss(p, cfg_plain))(sub)
    g_fused = jax.grad(lambda p: loss(p, cfg_fused))(sub)
    for k in names:
        a = np.asarray(g_plain[k])
        b = np.asarray(g_fused[k])
        tol = 5e-4 * max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol, err_msg=k)
