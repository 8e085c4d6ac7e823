from slam2d_tpu.match.correlative import (  # noqa: F401
    build_search_space,
    coarse_space,
    match_scan,
    score_offsets,
)
