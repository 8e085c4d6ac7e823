#!/bin/bash
# Round-4 chip session 8: frontend stage profile with the int8 scorer
# (where does the 126 µs/scan go now — the roofline note for the 9.5k
# question), FastSLAM-100 shared-update A/B (can P=100 profit from the
# exact-endpoint shared path?), and a bench.py repeat for the headline.
#   bash scripts/r4_chip_session8.sh > /tmp/r4_session8.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

timeout 3600 python scripts/bench_frontend_parts.py 2>&1 | grep -v WARNING

# FastSLAM-100: per_particle (current default at P=100) vs forced shared
timeout 1500 python bench_pf.py --particles 100 --ungated 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 100 --ungated \
  --update-mode shared 2>&1 | grep -v WARNING
timeout 1500 python bench_pf.py --particles 100 --ungated \
  --update-mode shared --snapped-endpoints 2>&1 | grep -v WARNING

# headline repeats (same session as the profile)
timeout 2400 python bench.py 2>&1 | grep -v WARNING
timeout 2400 python bench.py --score-impl mxu 2>&1 | grep -v WARNING
