"""Checkpoint/resume for inverse-rendering optimization runs.

The reference checkpoints exactly one artifact — the built kd-tree, as raw
structs next to the OBJ (src/kd_tree.c:239-274; our portable analogue is
scene/cache.py). Optimization runs add mutable state worth persisting:
scene parameters + optimizer state + step counter. Orbax handles the
device-array serialization; this module pins the layout.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(path: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_train_state(path: str, step: int, params: Any, opt_state: Any,
                     max_to_keep: int = 3) -> None:
    """Persist {params, opt_state} at `step` under `path`."""
    import orbax.checkpoint as ocp
    mgr = _manager(path, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": params, "opt_state": opt_state}))
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(path: str, step: Optional[int] = None,
                        template: Any = None):
    """Restore (step, {params, opt_state}); latest step when unspecified.

    template: matching pytree of arrays (shapes/dtypes/shardings) — pass
    the freshly-initialized state to restore onto the right devices.
    """
    import orbax.checkpoint as ocp
    mgr = _manager(path)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    if template is not None:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return step, restored
