#!/bin/bash
# Round-4 session 13: f32-image-stack A/B for the shared-update residual
# (+0.033 vs per_particle; carve-xy/theta/shrink falsified — the bf16
# image cast at 4.2 MB is the next suspect), 4 seeds.
#   bash scripts/r4_chip_session13.sh > /tmp/r4_session13.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x
for seed in 0 1 2 3; do
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --images-f32 --seed $seed 2>&1 | grep -v WARNING
done
