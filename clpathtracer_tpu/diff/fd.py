"""Finite-difference gradient harness.

The validation oracle for the differentiable-rendering mode (BASELINE north
star: pixel gradients allclose vs finite differences). Central differences
over arbitrary pytrees, element by element — O(2·n_params) evaluations, so
use tiny scenes/images.
"""

from __future__ import annotations

import jax
import numpy as np


def fd_grad(f, x, eps: float = 1e-3):
    """Central-difference gradient of scalar f at pytree x.

    Returns a pytree shaped like x with d f / d x_i estimated as
    (f(x + eps·e_i) - f(x - eps·e_i)) / (2 eps).
    """
    leaves, treedef = jax.tree.flatten(x)
    out_leaves = []
    for li, leaf in enumerate(leaves):
        leaf = np.asarray(leaf, np.float64)
        g = np.zeros_like(leaf)
        flat = leaf.reshape(-1)
        gflat = g.reshape(-1)
        for i in range(flat.size):
            for s, dst in ((eps, +1.0), (-eps, -1.0)):
                pert = flat.copy()
                pert[i] += s
                new_leaves = list(leaves)
                new_leaves[li] = pert.reshape(leaf.shape).astype(
                    np.asarray(leaves[li]).dtype)
                val = f(jax.tree.unflatten(treedef, new_leaves))
                gflat[i] += dst * float(val)
            gflat[i] /= 2.0 * eps
        out_leaves.append(g.reshape(leaf.shape))
    return jax.tree.unflatten(treedef, out_leaves)
