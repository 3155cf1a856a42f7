from clpathtracer_tpu.diff.grad import intersect_diff
from clpathtracer_tpu.diff.fd import fd_grad

__all__ = ["intersect_diff", "fd_grad"]
