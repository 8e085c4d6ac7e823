#!/bin/bash
# Round-4 chip session 7: re-validate after the int8-default +
# matched-noise-smoke changes, FastSLAM headlines with all round-4
# defaults, pose-graph solver chip timings, and the endpoint-pass
# attribution at P=1000.
#   bash scripts/r4_chip_session7.sh > /tmp/r4_session7.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

# 1. full smoke (expect all stages PASS now)
timeout 3600 python scripts/tpu_smoke.py 2>&1 | grep -v WARNING | tee /tmp/tpu_smoke_r04b.txt

# 2. FastSLAM headlines at round-4 defaults
timeout 1500 python bench_pf.py --particles 100 --ungated 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 2>&1 | grep -v WARNING

# 3. pose-graph solver wall times on chip (dense/schur/hier vs K)
timeout 3600 python scripts/bench_graph_scale.py 2>&1 | grep -v WARNING

# 4. endpoint-pass cost attribution at P=1000 (exact vs snapped, same
#    session, ungated chunk timing, throughput only)
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
  --snapped-endpoints 2>&1 | grep -v WARNING
