"""clpathtracer_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-imagining of the capabilities of
taylor-santos/CLPathTracer (an interactive OpenCL kd-tree path tracer):

* OBJ mesh ingest (reference: src/model.c, include/tinyobj_loader_c.h)
* SAH kd-tree construction with ropes (reference: src/kd_tree.c)
* stackless ray traversal + Moller-Trumbore intersection (reference: src/kernel.cl)
* camera model with inverse view-projection unprojection (reference: src/camera.c)

re-designed TPU-first:

* rays are batched SoA arrays; traversal is a lockstep masked wavefront
  (`lax.while_loop` + Pallas kernels) instead of divergent per-ray loops
* the scene and acceleration structure are flat SoA device arrays (pytrees)
* rendering is a pure function: scene in, image out — jit/pjit boundaries
  replace OpenCL command queues
* differentiable: pixel gradients w.r.t. camera pose, vertex positions and
  materials via detached-topology custom VJPs
* distributed: pixel tiles sharded over `jax.sharding.Mesh` axes with XLA
  collectives, not hand-written transport
"""

__version__ = "0.1.0"

from clpathtracer_tpu.core.camera import Camera, cam_matrix, generate_rays

__all__ = [
    "Camera",
    "cam_matrix",
    "generate_rays",
    "__version__",
]
