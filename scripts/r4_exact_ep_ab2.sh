#!/bin/bash
# Round-4 chip session 3: close the remaining exact-endpoint gap.
# Session-2 numbers (same shapes): exact 4-seed mean 0.210, snapped
# 0.270, per_particle 0.159/0.166. Residual axes: carve xy snap
# (bilinear carve placement fixes to first order; blur harmless on the
# smooth carve) and theta slots (theta_only probe: +0.017).
#   bash scripts/r4_exact_ep_ab2.sh > /tmp/r4_exact_ep_ab2.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2 3; do
  # exact endpoints + bilinear carve
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --update-bilinear --seed $seed 2>&1 | grep -v WARNING
  # exact endpoints + finer theta slots (coverage-matched G)
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --update-qstep-cells 0.25 --update-theta-slots 32 \
    --seed $seed 2>&1 | grep -v WARNING
  # both
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --update-bilinear --update-qstep-cells 0.25 \
    --update-theta-slots 32 --seed $seed 2>&1 | grep -v WARNING
done
