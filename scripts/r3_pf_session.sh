#!/bin/bash
# Round-3 chip session: FastSLAM-1000 breakdown + shared-refine stages
# (with the Pallas stack kernel) + the shared-update rotation-quantization
# (qstep) accuracy sweep. ONE chip process at a time; run via:
#   bash scripts/r3_pf_session.sh > /tmp/r3_pf_session.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

# stage timing with the new stack kernel (compare COMPONENTS.md: splat+stack 1.78 ms)
timeout 1500 python scripts/bench_shared_refine.py --particles 125 2>&1 | grep -v WARNING

# FastSLAM-1000 attribution (compare: refine event 10.5 ms, ~3.05 ms/scan avg)
timeout 2400 python scripts/bench_pf1000_parts.py 2>&1 | grep -v WARNING

# headline FastSLAM-1000 + FastSLAM-100 with the stack kernel
timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 2>&1 | grep -v WARNING
timeout 1200 python bench_pf.py --particles 100 --ungated 2>&1 | grep -v WARNING

# qstep sweep (item 3): rotation-quantization hypothesis — finer slot step
# with coverage-matched G, multi-seed
for seed in 0 1 2 3; do
  timeout 1200 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --seed $seed 2>&1 | grep -v WARNING
  timeout 1200 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --update-qstep-cells 0.25 --update-theta-slots 32 \
    --seed $seed 2>&1 | grep -v WARNING
done
