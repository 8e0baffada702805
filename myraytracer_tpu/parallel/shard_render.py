"""Sharded rendering + inverse-rendering training step (shard_map).

Forward: rays sharded over the mesh's ``rays`` axis, scene replicated —
zero cross-chip communication (SURVEY.md §5.8). Backward: per-shard
scene-parameter gradients are ``psum``-reduced over ICI; XLA overlaps the
collective with remaining backward work.

The "training step" is inverse rendering: fit differentiable scene
parameters (vertex positions, normals, materials, lights, texels, sphere/
plane geometry) to a target image by gradient descent — the
differentiable-renderer counterpart of a NN train step, and the
BASELINE.json "fwd+bwd" benchmark shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from myraytracer_tpu.models.scene import SceneData
from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.ops.refit import refit_accel
from myraytracer_tpu.parallel.mesh import RAY_AXIS


#: acceleration-structure float arrays: NOT scene parameters. Traversal
#: is stop-gradient by design, so their gradients are identically zero —
#: excluding them keeps the backward from materializing and all-reducing
#: dead cotangents for ~12k BVH nodes every step.
_ACCEL_PREFIXES = ("bvh_", "cl_")


def _float_field_names(scene: SceneData):
    out = []
    for f in dataclasses.fields(scene):
        if f.metadata.get("static"):
            continue
        if f.name.startswith(_ACCEL_PREFIXES):
            continue
        v = getattr(scene, f.name)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.inexact):
            out.append(f.name)
    return tuple(out)


def split_params(scene: SceneData) -> Dict[str, jnp.ndarray]:
    """Extract the differentiable (float) leaves as a flat dict."""
    return {n: getattr(scene, n) for n in _float_field_names(scene)}


def merge_params(scene: SceneData, params: Dict[str, jnp.ndarray]) -> SceneData:
    """Rebuild a SceneData with updated float leaves."""
    return dataclasses.replace(scene, **params)


def _pad_rays(o, d, n_shards):
    R = o.shape[0]
    Rp = ((R + n_shards - 1) // n_shards) * n_shards
    if Rp != R:
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (Rp - R, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (Rp - R, 3))])
    return o, d, R


def render_sharded(scene, camera, mesh, cfg: tr.TraceConfig = tr.TraceConfig()):
    """Forward render with rays sharded across ``mesh`` -> [H, W, 3].

    Rays are laid out in 2D screen blocks (ops/render.BLOCK) before
    sharding, so each chip receives whole coherent tiles and traces them
    with the same tiled driver as the single-chip path — per-chip
    behavior (cluster culling, memory) is identical, communication stays
    zero.
    """
    from myraytracer_tpu.ops.render import BLOCK, _trace_tiled

    H, W = camera.height, camera.width
    bh = bw = BLOCK
    Hp = ((H + bh - 1) // bh) * bh
    Wp = ((W + bw - 1) // bw) * bw
    ys, xs = jnp.meshgrid(
        jnp.arange(Hp, dtype=jnp.float32), jnp.arange(Wp, dtype=jnp.float32),
        indexing="ij",
    )

    def to_blocks(a):
        return a.reshape(Hp // bh, bh, Wp // bw, bw).transpose(0, 2, 1, 3).reshape(-1)

    o, d = camera.primary_rays(to_blocks(xs), to_blocks(ys))
    o, d, R = _pad_rays(o, d, mesh.devices.size)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    def _fwd(scene, o, d):
        return _trace_tiled(scene, o, d, cfg, bh * bw)

    color = _fwd(scene, o, d)[:R]
    img = (
        color.reshape(Hp // bh, Wp // bw, bh, bw, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(Hp, Wp, 3)[:H, :W]
    )
    return jnp.minimum(img, 1.0)


def make_train_step(mesh, cfg: tr.TraceConfig = tr.TraceConfig(), lr: float = 1e-3):
    """Build a jitted sharded inverse-rendering SGD step.

    Returns step(scene, o, d, target) -> (scene', loss): rays and target
    pixels sharded over ``mesh``; loss is the global mean squared error of
    the unclamped linear image; scene updates are replicated.
    """

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(scene, o, d, target, w):
        # grads include mat_mirror: restore a statically-trimmed mirror
        # chain so d(loss)/d(mirror) keeps the reflected term (the
        # live_depth trap — see ops/render._loss_grad_tiled)
        if scene.live_depth and scene.live_depth <= scene.max_depth:
            scene = dataclasses.replace(scene,
                                        live_depth=scene.max_depth + 1)
        params = split_params(scene)

        def loss_fn(p):
            s = merge_params(scene, p)
            # vertex_pos is an optimized leaf: refit BVH/cluster bounds
            # from the current vertices so culling stays conservative
            # across steps (ops/refit.py)
            s = refit_accel(s)
            c = tr.trace(s, o, d, cfg)
            # w masks padded rays out of loss and gradient
            return jnp.sum(w[:, None] * (c - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # the one cross-chip collective: all-reduce scene-param grads
        loss = jax.lax.psum(loss, RAY_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, RAY_AXIS), grads)
        n_total = jax.lax.psum(jnp.sum(w), RAY_AXIS) * 3
        new_params = jax.tree.map(lambda p, g: p - lr * g / n_total, params, grads)
        return merge_params(scene, new_params), loss / n_total

    return step


def train_step_sharded(scene, o, d, target, mesh, lr: float = 1e-3,
                       cfg: tr.TraceConfig = tr.TraceConfig()):
    """One-shot convenience wrapper around :func:`make_train_step`."""
    R0 = o.shape[0]
    o, d, R = _pad_rays(o, d, mesh.devices.size)
    w = jnp.concatenate([jnp.ones((R0,), o.dtype), jnp.zeros((o.shape[0] - R0,), o.dtype)])
    if target.shape[0] != o.shape[0]:
        pad = o.shape[0] - target.shape[0]
        target = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)])
    return make_train_step(mesh, cfg, lr)(scene, o, d, target, w)
