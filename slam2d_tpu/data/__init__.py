from slam2d_tpu.data.carmen import load_carmen_log, load_json_log  # noqa: F401
from slam2d_tpu.data.synth import SynthWorld, simulate_log  # noqa: F401
