import json

from slam2d_tpu.utils.metrics_logger import MetricsLogger


def test_metrics_logger_jsonl(tmp_path):
    with MetricsLogger(str(tmp_path), tensorboard=False) as ml:
        ml.log(0, score=0.9, n_eff=31.5)
        ml.log(1, score=0.8)
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 0 and rec["score"] == 0.9 and rec["n_eff"] == 31.5


def test_metrics_logger_tensorboard_optional(tmp_path):
    # must not fail whether or not tensorboardX exists
    with MetricsLogger(str(tmp_path), tensorboard=True) as ml:
        ml.log(0, x=1.0)
