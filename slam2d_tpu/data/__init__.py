from slam2d_tpu.data.carmen import (  # noqa: F401
    carmen_to_json,
    load_json_log,
    save_carmen_log,
    save_json_log,
)
from slam2d_tpu.data.carmen import load_carmen_log as _load_carmen_py
from slam2d_tpu.data.synth import SynthWorld, simulate_log  # noqa: F401


def load_carmen_log(path: str):
    """CARMEN loader: native C++ parser when built, Python fallback."""
    from slam2d_tpu.data import native

    if native.native_available():
        return native.load_carmen_log_native(path)
    return _load_carmen_py(path)
