"""Checkpoint/resume round-trip for optimization state (diff/checkpoint.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from clpathtracer_tpu.diff.checkpoint import (
    restore_train_state, save_train_state)


def test_roundtrip(tmp_path):
    params = {"verts": jnp.arange(12.0).reshape(4, 3),
              "albedo": jnp.full((2, 3), 0.5)}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_train_state(path, step=7, params=params, opt_state=opt_state)

    template = {"params": params, "opt_state": opt_state}
    step, restored = restore_train_state(path, template=template)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["verts"]),
                                  np.asarray(params["verts"]))
    leaves_a = jax.tree.leaves(restored["opt_state"])
    leaves_b = jax.tree.leaves(opt_state)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_max_to_keep(tmp_path):
    params = {"w": jnp.zeros((2,))}
    opt_state = optax.sgd(0.1).init(params)
    path = str(tmp_path / "ckpt")
    for s in range(5):
        save_train_state(path, step=s, params=params, opt_state=opt_state,
                         max_to_keep=2)
    step, _ = restore_train_state(
        path, template={"params": params, "opt_state": opt_state})
    assert step == 4
