#!/bin/bash
# Round-4 chip session 9: FastSLAM-100 shared-update ATE validation
# (session 8 measured +44% throughput from forcing shared+exact at
# P=100; the ungated bench doesn't print ATE — the host-gated form
# does). 2 seeds x {per_particle (current default), shared exact}.
#   bash scripts/r4_chip_session9.sh > /tmp/r4_session9.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2; do
  timeout 1500 python bench_pf.py --particles 100 --seed $seed 2>&1 | grep -v WARNING
  timeout 1500 python bench_pf.py --particles 100 --update-mode shared \
    --seed $seed 2>&1 | grep -v WARNING
done
