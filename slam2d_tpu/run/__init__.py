from slam2d_tpu.run.frontend import (  # noqa: F401
    FrontendState,
    frontend_init,
    frontend_step,
    make_chunk_fn,
    run_frontend,
)
