#!/bin/bash
# Round-4 chip session 1: axis-separated shared-update quantization probes
# (VERDICT r3 item 1). Controls from round 3 (same shapes, chip):
#   shared            ATE 0.221/0.271/0.223/0.303 (mean 0.255)
#   per_particle      ATE 0.162/0.164/0.166/0.173 (mean 0.166)
#   quantized_per_particle ATE 0.259/0.236 (seeds 0/1)
# This session runs the two single-axis probes x 4 seeds to pin the
# guilty axis. ONE chip process at a time; run via:
#   bash scripts/r4_axis_probes.sh > /tmp/r4_axis_probes.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2 3; do
  for mode in quantized_theta_only quantized_xy_only; do
    timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
      --update-mode $mode --seed $seed 2>&1 | grep -v WARNING
  done
done
