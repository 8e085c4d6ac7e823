"""CARMEN / JSON log loaders (SURVEY.md §2 L0, §3 "Data preprocessor").

The reference preprocesses raw Radish CARMEN logs into per-dataset JSON with
records {x, y, theta, range[]}. We support both on the host:

- `load_carmen_log`: parses `FLASER` lines (which carry their own odometry
  fields) and plain `ODOM` lines from a raw CARMEN file.
- `load_json_log`: reads the reference's preprocessed-JSON shape — either a
  list of records or a dict keyed by timestamp with
  {"x", "y", "theta", "range": [...]} — tolerating a few common key spellings.

Output contract everywhere: dict of float32 arrays
  odom   [T, 3]   (x, y, theta) odometry pose per scan
  ranges [T, B]   raw ranges (not yet clipped; pipeline clips via SensorConfig)
"""

from __future__ import annotations

import json

import numpy as np


def load_carmen_log(path: str):
    """Parse FLASER entries from a raw CARMEN log file.

    FLASER format: `FLASER num_readings r1 ... rn x y theta odom_x odom_y
    odom_theta ts host log_ts` — we take the odometry pose fields.
    """
    odoms, scans = [], []
    n_beams = None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "FLASER":
                continue
            # Any malformed row (bad count, short row, non-numeric field)
            # is skipped — matching the C++ parser, which drops rows that
            # fail numeric parsing. The beam count latches from the first
            # VALID positive-count row only.
            try:
                n = int(parts[1])
                if n <= 0 or len(parts) < 2 + n + 6:
                    continue
                if n_beams is not None and n != n_beams:
                    continue
                ranges = [float(v) for v in parts[2 : 2 + n]]
                # after ranges: x y theta odom_x odom_y odom_theta ...
                ox, oy, oth = (float(v) for v in parts[2 + n + 3 : 2 + n + 6])
            except ValueError:
                continue
            n_beams = n
            odoms.append((ox, oy, oth))
            scans.append(ranges)
    if not scans:
        raise ValueError(f"no FLASER entries in {path}")
    return {
        "odom": np.asarray(odoms, dtype=np.float32),
        "ranges": np.asarray(scans, dtype=np.float32),
    }


_XY_KEYS = (("x", "y", "theta"), ("x", "y", "t"), ("odom_x", "odom_y", "odom_theta"))
_RANGE_KEYS = ("range", "ranges", "scan", "readings")


def _record_to_row(rec: dict):
    for kx, ky, kt in _XY_KEYS:
        if kx in rec and ky in rec and kt in rec:
            pose = (float(rec[kx]), float(rec[ky]), float(rec[kt]))
            break
    else:
        raise KeyError(f"no pose keys in record: {sorted(rec)[:8]}")
    for kr in _RANGE_KEYS:
        if kr in rec:
            return pose, [float(v) for v in rec[kr]]
    raise KeyError(f"no range key in record: {sorted(rec)[:8]}")


def load_json_log(path: str):
    """Read a preprocessed JSON log (list of records, or dict keyed by time)."""
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        if "map" in data and isinstance(data["map"], dict):
            data = data["map"]
        records = [data[k] for k in sorted(data, key=_num_or_str)]
    else:
        records = data
    odoms, scans = [], []
    for rec in records:
        pose, ranges = _record_to_row(rec)
        odoms.append(pose)
        scans.append(ranges)
    return {
        "odom": np.asarray(odoms, dtype=np.float32),
        "ranges": np.asarray(scans, dtype=np.float32),
    }


def _num_or_str(k):
    try:
        return (0, float(k))
    except (TypeError, ValueError):
        return (1, str(k))


def save_carmen_log(path: str, log: dict) -> str:
    """Write a {odom, ranges} log as CARMEN FLASER lines (the raw-log
    format load_carmen_log reads). The laser pose is written equal to the
    odometry pose, timestamps are synthetic."""
    odom = np.asarray(log["odom"], np.float64)
    ranges = np.asarray(log["ranges"], np.float64)
    n = ranges.shape[1]
    with open(path, "w") as f:
        for t in range(len(odom)):
            r = " ".join(f"{v:.6f}" for v in ranges[t])
            x, y, th = odom[t]
            pose = f"{x:.6f} {y:.6f} {th:.6f}"
            f.write(f"FLASER {n} {r} {pose} {pose} {float(t):.6f} synth {float(t):.6f}\n")
    return path


def save_json_log(path: str, log: dict) -> str:
    """Write a {odom, ranges} log in the reference's preprocessed-JSON
    shape (list of {x, y, theta, range} records) — the output format of
    the reference's DataPreprocess step."""
    odom = np.asarray(log["odom"], np.float64)
    ranges = np.asarray(log["ranges"], np.float64)
    records = [
        {
            "x": float(odom[t, 0]),
            "y": float(odom[t, 1]),
            "theta": float(odom[t, 2]),
            "range": [float(v) for v in ranges[t]],
        }
        for t in range(len(odom))
    ]
    with open(path, "w") as f:
        json.dump(records, f)
    return path


def carmen_to_json(path_in: str, path_out: str) -> str:
    """Preprocess a raw CARMEN log into the reference-style JSON log
    (the reference's DataPreprocess.py equivalent)."""
    return save_json_log(path_out, load_carmen_log(path_in))


def main(argv=None) -> int:
    """CLI: python -m slam2d_tpu.data.carmen in.clf out.json"""
    import sys

    args = sys.argv[1:] if argv is None else argv
    if len(args) != 2:
        print("usage: python -m slam2d_tpu.data.carmen IN.clf OUT.json")
        return 2
    carmen_to_json(args[0], args[1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
