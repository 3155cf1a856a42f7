"""Distributed inverse-rendering optimization.

The "training" axis of the framework: given target images, optimize scene
parameters (vertex positions, materials, camera pose) by gradient descent
through the differentiable renderer. Entirely new capability — the
reference renders forward only.

Distribution model: pure data parallelism over pixels. The target image and
the ray wavefront are sharded over the mesh "rows" axis; scene parameters
are replicated. `jax.grad` under `jit` with these shardings makes XLA emit
the gradient all-reduce (psum over "rows") automatically — the TPU-native
replacement for hand-written NCCL allreduce (SURVEY.md §5, distributed
communication backend).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clpathtracer_tpu.core.camera import cam_matrix, generate_rays
from clpathtracer_tpu.render.integrator import RenderOptions, render_rays
from clpathtracer_tpu.parallel.mesh import replicated, row_sharded


class TrainState(NamedTuple):
    params: Any          # dict of optimizable scene fields
    opt_state: Any


def apply_params(scene, params: dict):
    """Overlay optimizable fields onto the scene pytree."""
    return scene.replace(**params)


def make_train_step(scene, opts: RenderOptions, mesh: Mesh,
                    optimizer: optax.GradientTransformation,
                    tree=None,
                    param_fields=("verts", "albedo", "emission")) -> Callable:
    """Build a jitted, mesh-sharded train step.

    Returns step(state, camera, target, key) -> (state, loss) where target
    is an [H, W, 3] image sharded over rows. Loss is mean squared error in
    linear radiance.
    """
    n_rows = mesh.shape["rows"]
    assert opts.height % n_rows == 0
    if opts.use_tree and not opts.differentiable:
        raise ValueError(
            "training through the kd-tree needs opts.differentiable=True "
            "(detached-topology hits; the raw traversal while_loop is not "
            "reverse-differentiable)")

    scene_sharded = type(tree).__name__ == "ShardedTree"
    if scene_sharded:
        # scene-parallel training: acceleration blocks stay sharded over
        # "scene" and ring-rotate inside the loss (intersect_ring under
        # shard_map); rays/pixels shard over BOTH axes; parameter
        # cotangents are psummed by shard_map's transpose (replicated
        # in_spec) — the gradient all-reduce, derived not hand-written.
        import dataclasses

        from jax import shard_map

        S = mesh.shape["scene"]
        n_px = opts.width * opts.height
        assert n_px % (n_rows * S) == 0, (n_px, n_rows, S)
        opts_local = dataclasses.replace(opts, scene_axis="scene")

        def render_local(params, base_scene, stree_blk, key, orig, dir):
            s = apply_params(base_scene, params)
            if key is not None:
                shard = (jax.lax.axis_index("rows") * S
                         + jax.lax.axis_index("scene"))
                key = jax.random.fold_in(key, shard)
            return render_rays(s, stree_blk, orig, dir, opts_local, key)

        render_sharded = shard_map(
            render_local, mesh=mesh,
            in_specs=(P(), P(), P("scene"), P(),
                      P(("rows", "scene"), None),
                      P(("rows", "scene"), None)),
            out_specs=P(("rows", "scene"), None),
        )

        def loss_fn(params, base_scene, base_tree, camera, target, key):
            cam_inv = cam_matrix(camera, opts.height)
            orig, dir = generate_rays(cam_inv, opts.width, opts.height)
            img = render_sharded(params, base_scene, base_tree, key,
                                 orig, dir)
            img = img.reshape(opts.height, opts.width, 3)
            return jnp.mean((img - target) ** 2)
    else:
        def loss_fn(params, base_scene, base_tree, camera, target, key):
            s = apply_params(base_scene, params)
            cam_inv = cam_matrix(camera, opts.height)
            orig, dir = generate_rays(cam_inv, opts.width, opts.height)
            spec = NamedSharding(mesh, P("rows", None))
            orig = jax.lax.with_sharding_constraint(orig, spec)
            dir = jax.lax.with_sharding_constraint(dir, spec)
            img = render_rays(s, base_tree, orig, dir, opts, key)
            img = img.reshape(opts.height, opts.width, 3)
            return jnp.mean((img - target) ** 2)

    def step_impl(state: TrainState, base_scene, base_tree, camera, target,
                  key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, base_scene, base_tree, camera, target, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    # Shardings ride on the committed inputs (init device_puts the params;
    # the caller device_puts the target row-sharded) + the constraint inside
    # loss_fn. The scene/tree are passed as ARGUMENTS, not closure captures,
    # and the framework keeps its jaxprs constant-free (see camera.py /
    # BIG): jax 0.9 drops hoisted-constant buffers when re-executing a
    # cached grad computation on a multi-device mesh ("Execution supplied N
    # buffers but compiled program expected M" on the 2nd call).
    repl = replicated(mesh)
    jitted = jax.jit(step_impl)
    scene_r = jax.device_put(scene, repl)
    if tree is None:
        tree_r = None
    elif scene_sharded:
        # treelet blocks live sharded over the "scene" axis — the point
        tree_r = jax.device_put(tree, NamedSharding(mesh, P("scene")))
    else:
        tree_r = jax.device_put(tree, repl)

    def step(state: TrainState, camera, target, key):
        camera = jax.device_put(camera, repl)
        key = jax.device_put(key, repl)
        return jitted(state, scene_r, tree_r, camera, target, key)

    def init() -> TrainState:
        params = {f: getattr(scene, f) for f in param_fields}
        params = jax.device_put(params, repl)
        opt_state = optimizer.init(params)
        return TrainState(params, jax.device_put(opt_state, repl))

    return step, init
