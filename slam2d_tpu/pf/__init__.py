from slam2d_tpu.pf.fastslam import (  # noqa: F401
    PFState,
    effective_sample_size,
    fastslam_init,
    fastslam_step,
    systematic_ancestors,
)
