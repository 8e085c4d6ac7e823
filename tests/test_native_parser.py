"""Native C++ CARMEN parser == Python parser (skipped if no toolchain)."""

import numpy as np
import pytest

from slam2d_tpu.data.carmen import load_carmen_log as load_py


def _make_log(tmp_path, rows=50, beams=12):
    rng = np.random.default_rng(1)
    lines = ["# carmen log\n", "PARAM robot_frontlaser_offset 0.08\n"]
    for t in range(rows):
        r = rng.uniform(0.5, 20.0, beams)
        pose = rng.uniform(-10, 10, 6)
        lines.append(
            "FLASER %d %s %s 1.0 host 1.0\n"
            % (
                beams,
                " ".join(f"{v:.3f}" for v in r),
                " ".join(f"{v:.6f}" for v in pose),
            )
        )
        if t % 7 == 0:
            lines.append("ODOM 1 2 3 0 0 0 ts host lts\n")
    p = tmp_path / "log.clf"
    p.write_text("".join(lines))
    return str(p)


def test_native_matches_python(tmp_path):
    native = pytest.importorskip("slam2d_tpu.data.native")
    if not native.native_available():
        pytest.skip("native parser not buildable")
    path = _make_log(tmp_path)
    py = load_py(path)
    nat = native.load_carmen_log_native(path)
    assert nat["odom"].shape == py["odom"].shape
    np.testing.assert_allclose(nat["odom"], py["odom"], atol=1e-4)
    np.testing.assert_allclose(nat["ranges"], py["ranges"], atol=1e-3)


def test_dispatcher_prefers_native(tmp_path):
    from slam2d_tpu.data import load_carmen_log

    path = _make_log(tmp_path, rows=5)
    log = load_carmen_log(path)
    assert log["ranges"].shape == (5, 12)


def test_native_fuzz_matches_python(tmp_path):
    """Randomized + adversarial CARMEN lines parse identically in C++ and
    Python: varied float formats, wrong beam counts, truncated rows,
    non-numeric fields, zero/negative counts, and a CORRUPT FIRST ROW
    (which must not poison the beam-count latch)."""
    native = pytest.importorskip("slam2d_tpu.data.native")
    if not native.native_available():
        pytest.skip("native parser not buildable")

    rng = np.random.default_rng(42)
    beams = 7
    lines = [
        "FLASER 361 0.5\n",                       # truncated first row
        "FLASER 0 1 2 3 4 5 6 ts host lts\n",     # zero beam count
        "FLASER -3 1 2 3 4 5 6 7 8 9 ts h l\n",   # negative beam count
        "FLASER seven 1 2 3 4 5 6 ts host lts\n", # non-numeric count
    ]
    for t in range(200):
        r = rng.uniform(0, 90, beams)
        pose = rng.normal(0, 30, 6)
        fmt = rng.choice(["%.3f", "%.6f", "%.1e", "%g"])
        vals = " ".join(fmt % v for v in r)
        ps = " ".join("%.8g" % v for v in pose)
        lines.append(f"FLASER {beams} {vals} {ps} 1.0 host 1.0\n")
        if t % 11 == 0:
            lines.append("TRUEPOS 1 2 3 4 5 6 ts host lts\n")
        if t % 17 == 0:
            # wrong beam count row: both parsers must skip it
            lines.append("FLASER 3 1.0 2.0 3.0 0 0 0 0 0 0 ts host lts\n")
        if t % 23 == 0:
            # right count, non-numeric range field: both must skip
            bad = vals.replace(vals.split()[2], "oops", 1)
            lines.append(f"FLASER {beams} {bad} {ps} 1.0 host 1.0\n")
    p = tmp_path / "fuzz.clf"
    p.write_text("".join(lines))

    py = load_py(str(p))
    nat = native.load_carmen_log_native(str(p))
    assert py["ranges"].shape == (200, beams)
    assert nat["ranges"].shape == py["ranges"].shape
    np.testing.assert_allclose(nat["odom"], py["odom"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nat["ranges"], py["ranges"], rtol=1e-5, atol=1e-4)


def test_both_parsers_error_on_unparseable_log(tmp_path):
    native = pytest.importorskip("slam2d_tpu.data.native")
    if not native.native_available():
        pytest.skip("native parser not buildable")
    p = tmp_path / "bad.clf"
    p.write_text("FLASER 5 a b c d e 1 2 3 4 5 6 ts h l\n")
    with pytest.raises(ValueError):
        load_py(str(p))
    with pytest.raises(ValueError):
        native.load_carmen_log_native(str(p))
