from slam2d_tpu.core import se2  # noqa: F401
