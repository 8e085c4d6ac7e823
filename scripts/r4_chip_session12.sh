#!/bin/bash
# Round-4 final chip session: smoke + headlines with ALL round-4
# defaults (int8 scorer, exact endpoints, measured gates, 8x unroll).
#   bash scripts/r4_chip_session12.sh > /tmp/r4_session12.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

timeout 3600 python scripts/tpu_smoke.py 2>&1 | grep -v WARNING | tee /tmp/tpu_smoke_r04c.txt
timeout 2400 python bench.py 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 100 --ungated 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 2>&1 | grep -v WARNING
