from slam2d_tpu.ops.pallas_score import score_offsets_pallas  # noqa: F401
