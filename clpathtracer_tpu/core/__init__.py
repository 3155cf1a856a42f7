from clpathtracer_tpu.core import vecmath, matrix, camera, ray

__all__ = ["vecmath", "matrix", "camera", "ray"]
