#!/bin/bash
# Round-4 chip session 6: endurance (>=10k scans, laps=4), fine-res PF
# sweep extension (noise below 0.005 — the round-4 sweep's trend), the
# sharded-1dev smoke-stage seed probe (chaos vs regression for the r04
# smoke FAIL), and the frontend int8 scorer A/B.
#   bash scripts/r4_chip_session6.sh > /tmp/r4_session6.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

# 1. endurance (VERDICT item 2)
timeout 5400 python scripts/bench_endurance.py 2>&1 | grep -v WARNING | tee /tmp/endurance_r04.txt

# 2. frontend headline + int8 A/B (VERDICT item 3)
timeout 2400 python bench.py 2>&1 | grep -v WARNING
timeout 2400 python bench.py --score-impl mxu_int8 2>&1 | grep -v WARNING
# ATE parity for int8 on 3 seeds
for seed in 0 1 2; do
  timeout 1800 python scripts/bench_ate.py auto $seed 2 mxu_int8 2>&1 | grep -v WARNING
done

# 3. fine-res PF: push the noise axis below 0.005 (sweep trend)
for args in "--noise-xy 0.004 --noise-theta 0.002" \
            "--noise-xy 0.003 --noise-theta 0.0015" \
            "--noise-xy 0.002 --noise-theta 0.001"; do
  timeout 1800 python bench_pf.py --particles 100 --resolution 0.05 \
    --grid 1024 --match-min-motion 0.25 $args --seed 0 2>&1 | grep -v WARNING
done

# 4. sharded-1dev seed probe (r04 smoke FAIL attribution)
timeout 2400 python - << 'EOF' 2>&1 | grep -v WARNING
import numpy as np
from slam2d_tpu.config import (FrontendConfig, GridConfig, MatcherConfig,
                               PFConfig, SensorConfig)
from slam2d_tpu.data.synth import SynthWorld, simulate_log
from slam2d_tpu.metrics import ate_rmse
from slam2d_tpu.run.sharded_run import run_sharded_fastslam
import json

sensor = SensorConfig(n_beams=180, max_range=12.0)
cfg = FrontendConfig(
    sensor=sensor,
    grid=GridConfig(height=512, width=512, resolution=0.05,
                    ray_samples=256, center_x=10.0, center_y=10.0),
    matcher=MatcherConfig(search_xy=0.3, search_theta=0.15, n_theta=13),
    chunk=32, bootstrap_dist=2.0, match_min_motion=0.25,
)
world = SynthWorld.box_rooms(20.0)
wp = np.array([[3.0, 3.0], [3.0, 8.0], [8.0, 8.0], [12.0, 3.5],
               [16.0, 3.5], [17.0, 9.0], [12.0, 14.0], [9.0, 17.0],
               [4.0, 16.0], [3.0, 4.0]])
log = simulate_log(world, wp, sensor, step=0.05, seed=0)
gt = log["gt_poses"]
odom_ate = float(ate_rmse(log["odom"], gt, align=False))
for seed in (0, 1, 2):
    _, straj, _, _ = run_sharded_fastslam(log, cfg,
                                          PFConfig(n_particles=64,
                                                   map_dtype="bfloat16"),
                                          seed=seed, n_devices=1)
    print(json.dumps({
        "probe": "sharded_1dev", "seed": seed,
        "ate": round(float(ate_rmse(straj, gt, align=False)), 3),
        "odom_ate": round(odom_ate, 3),
    }), flush=True)
EOF
