"""Inverse rendering: fit scene parameters to target images.

The differentiable-path capstone (BASELINE.json north star): pixel
gradients flow back to vertex positions, normals, materials, lights and
texels, so scene parameters can be optimized against a reference image.

  InverseRenderer   optax-based optimization loop over a chosen subset of
                    the scene's float leaves, with optional multi-chip
                    sharding (parallel/) and orbax checkpoint/resume —
                    the checkpoint/resume subsystem the reference lacks
                    (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myraytracer_tpu.ops import tracer as tr
from myraytracer_tpu.parallel.shard_render import merge_params, split_params


@dataclasses.dataclass
class FitResult:
    scene: object
    losses: list
    params: Dict[str, jnp.ndarray]


class InverseRenderer:
    """Optimize selected scene parameters against target pixel colors.

    Args:
        scene: built SceneData (topology fixed during optimization).
        param_names: which float leaves to optimize (default: all).
        optimizer: any optax GradientTransformation (default adam(1e-2)).
        cfg: TraceConfig; bilinear texturing recommended when optimizing
            texels or UV-affecting geometry.
    """

    def __init__(
        self,
        scene,
        param_names: Optional[Sequence[str]] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        cfg: tr.TraceConfig = tr.TraceConfig(texture_filter="bilinear"),
    ) -> None:
        self.base_scene = scene
        all_params = split_params(scene)
        if param_names is None:
            param_names = tuple(all_params)
        if "mat_mirror" in param_names and scene.n_segments < scene.max_depth + 1:
            # live_depth statically trims provably-dead mirror segments
            # (models/scene.py), but under optimization mirror can GROW
            # from 0 — the trimmed program would give a one-sided
            # d(image)/d(mirror) that can never discover reflection.
            # Restore the full mirror chain for the fit.
            import dataclasses as _dc

            scene = _dc.replace(scene, live_depth=scene.max_depth + 1)
            self.base_scene = scene
        unknown = set(param_names) - set(all_params)
        if unknown:
            raise ValueError(f"not differentiable leaves: {sorted(unknown)}")
        self.param_names = tuple(param_names)
        self.params = {n: all_params[n] for n in self.param_names}
        self.optimizer = optimizer or optax.adam(1e-2)
        self.opt_state = self.optimizer.init(self.params)
        self.cfg = cfg
        self.step_count = 0
        self._step_fn = self._build_step()

    def scene_with(self, params) -> object:
        return merge_params(self.base_scene, dict(params))

    def _build_step(self):
        cfg = self.cfg
        optimizer = self.optimizer
        base = self.base_scene

        @jax.jit
        def step(params, opt_state, o, d, target):
            def loss_fn(p):
                c = tr.trace(merge_params(base, p), o, d, cfg)
                return jnp.mean((c - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def fit(self, o, d, target, steps: int = 100,
            log_every: int = 0) -> FitResult:
        """Run SGD for `steps` iterations against target colors [R, 3]."""
        losses = []
        for i in range(steps):
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, o, d, target
            )
            self.step_count += 1
            losses.append(float(loss))
            if log_every and i % log_every == 0:
                print(f"step {self.step_count}: loss={losses[-1]:.6f}")
        return FitResult(self.scene_with(self.params), losses, self.params)

    # --- checkpoint / resume (orbax) ---------------------------------------
    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "step_count": self.step_count,
            },
            force=True,
        )

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step_count": self.step_count,
        }
        state = ckptr.restore(path, item=template)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step_count = int(state["step_count"])
