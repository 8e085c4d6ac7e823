#!/bin/bash
# Round-4 chip session 4: (a) carve-shrink falsification for the exact-
# endpoint residual (+0.044 vs per_particle; bilinear/G32 already
# falsified in session 3), (b) endpoint-pass throughput attribution
# (exact vs snapped at matched session conditions).
#   bash scripts/r4_exact_ep_ab3.sh > /tmp/r4_exact_ep_ab3.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2 3; do
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --carve-shrink 0.0 --seed $seed 2>&1 | grep -v WARNING
done
# same-session throughput anchors (ATE known from sessions 2/3)
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
  --update-mode shared --seed 0 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
  --update-mode shared --snapped-endpoints --seed 0 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
  --update-mode per_particle --seed 0 2>&1 | grep -v WARNING
