from slam2d_tpu.utils.profiling import PhaseTimer, Throughput  # noqa: F401
