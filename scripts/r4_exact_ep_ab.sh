#!/bin/bash
# Round-4 chip session 2: exact-endpoint shared update A/B (the fix for
# the xy-quantization gap the axis probes pinned). 4 seeds x
# {exact (new default), snapped (round-3 shared)} at FastSLAM-1000 bench
# shapes. Same-session numbers only — tunnel throughput varies across
# sessions. Run via:
#   bash scripts/r4_exact_ep_ab.sh > /tmp/r4_exact_ep_ab.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2 3; do
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --seed $seed 2>&1 | grep -v WARNING
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --snapped-endpoints --seed $seed 2>&1 | grep -v WARNING
done
# per-particle control, seed 0 (ATE target ~0.166, throughput ~110)
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
  --update-mode per_particle --seed 0 2>&1 | grep -v WARNING
