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


def test_real_world_variance_matrix(tmp_path):
    """Round-4 hardening matrix (VERDICT r3 item 7): pre-2000 FLASER
    rows (laser pose only — no odometry fields), ROBOTLASER1 rows
    (robot pose after config/remissions), comment/PARAM lines, CRLF
    line endings, comma decimal separators, and a truncated final line.
    C++ == Python on every case."""
    native = pytest.importorskip("slam2d_tpu.data.native")
    if not native.native_available():
        pytest.skip("native parser not buildable")
    rng = np.random.default_rng(3)
    beams = 9

    def flaser_std(r, pose, odom):
        return "FLASER %d %s %s %s 12.5 laptop2 12.6\n" % (
            beams,
            " ".join("%.3f" % v for v in r),
            " ".join("%.6f" % v for v in pose),
            " ".join("%.6f" % v for v in odom),
        )

    def flaser_legacy(r, pose):
        # pre-2000: ranges, laser pose, ts host log_ts — no odom fields
        return "FLASER %d %s %s 9.25 dorothy 9.30\n" % (
            beams,
            " ".join("%.3f" % v for v in r),
            " ".join("%.6f" % v for v in pose),
        )

    def robotlaser(r, lpose, rpose, n_rem=4):
        rem = " ".join("0" for _ in range(n_rem))
        return (
            "ROBOTLASER1 0 -1.5708 3.14159 0.0175 81.9 0.01 0 %d %s %d %s "
            "%s %s 0.3 0.05 0.5 0.2 0.3 77.1 host 77.2\n"
            % (
                beams,
                " ".join("%.3f" % v for v in r),
                n_rem, rem,
                " ".join("%.6f" % v for v in lpose),
                " ".join("%.6f" % v for v in rpose),
            )
        )

    lines = ["# robot log, exported 1999-06-12\r\n",
             "PARAM laser_front_laser_resolution 0.5\r\n"]
    want_odom = []
    for t in range(60):
        r = rng.uniform(0.1, 50.0, beams)
        pose = rng.normal(0, 20, 3)
        odom = rng.normal(0, 20, 3)
        kind = t % 3
        if kind == 0:
            lines.append(flaser_std(r, pose, odom))
            want_odom.append(odom)
        elif kind == 1:
            lines.append(flaser_legacy(r, pose))
            want_odom.append(pose)          # falls back to laser pose
        else:
            lines.append(robotlaser(r, pose, odom, n_rem=t % 5))
            want_odom.append(odom)          # robot pose
        if t % 10 == 0:
            lines.append("ODOM 1 2 3 0 0 0 55.5 host 55.6\r\n")
    # comma decimal separators (European locale export)
    r = rng.uniform(0.1, 50.0, beams)
    lines.append(
        "FLASER %d %s 1,5 -2,25 0,75 1,5 -2,25 0,75 3.0 host 3.1\n"
        % (beams, " ".join(("%.3f" % v).replace(".", ",") for v in r))
    )
    want_odom.append([1.5, -2.25, 0.75])
    # truncated final line (no trailing newline, row cut mid-ranges)
    lines.append("FLASER %d 1.0 2.0 3.0" % beams)

    p = tmp_path / "variance.clf"
    p.write_text("".join(lines))

    py = load_py(str(p))
    nat = native.load_carmen_log_native(str(p))
    assert py["ranges"].shape == (61, beams), py["ranges"].shape
    np.testing.assert_allclose(
        py["odom"], np.asarray(want_odom, np.float32), atol=1e-4
    )
    assert nat["odom"].shape == py["odom"].shape
    np.testing.assert_allclose(nat["odom"], py["odom"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        nat["ranges"], py["ranges"], rtol=1e-5, atol=1e-4
    )
