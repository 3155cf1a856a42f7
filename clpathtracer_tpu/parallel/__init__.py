from clpathtracer_tpu.parallel.mesh import (
    default_mesh, make_sharded_renderer, render_image_sharded, replicated,
    row_sharded)
from clpathtracer_tpu.parallel.train import (
    TrainState, apply_params, make_train_step)

__all__ = [
    "default_mesh", "make_sharded_renderer", "render_image_sharded",
    "replicated", "row_sharded", "TrainState", "apply_params",
    "make_train_step",
]
