#!/bin/bash
# Round-4 chip session 10: chunk-size sweep for the frontend headline
# (session-8 profile: device floor 94 us/scan = 10.6k/s vs bench 8610 —
# the gap is ~1.5 ms/chunk host+tunnel overhead, which larger chunks
# amortize). Same-session control at chunk=64.
#   bash scripts/r4_chip_session10.sh > /tmp/r4_session10.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

timeout 2400 python bench.py --chunk 64 2>&1 | grep -v WARNING
timeout 2400 python bench.py --chunk 128 2>&1 | grep -v WARNING
timeout 2400 python bench.py --chunk 256 2>&1 | grep -v WARNING
# ATE guard at the winning chunk (chunking changes nothing numerically,
# but the guard is cheap): bench_ate at chunk 64 is the standing 3-seed
# record; one seed at 256 here
timeout 1800 python scripts/bench_ate.py auto 0 2 mxu_int8 2>&1 | grep -v WARNING
