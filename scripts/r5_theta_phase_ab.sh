#!/bin/bash
# Round-5 chip session: theta-slot-grid PHASE JITTER A/B for the shared
# update's remaining +0.033 ATE residual (VERDICT r4 item 3's named
# fallback: test the slot-boundary-chaos hypothesis directly). 4 seeds x
# {off (control), theta_phase}. Controls from round 4/5 (same shapes):
#   exact endpoints, dither off   mean ATE ~0.199-0.204
#   per_particle                  mean ATE  0.166
#   random xy dither              mean ATE  0.1965 (one-seed win, 3 washes)
# Same-session numbers only. ONE chip process at a time; run via:
#   bash scripts/r5_theta_phase_ab.sh > /tmp/r5_theta_phase.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

for seed in 0 1 2 3; do
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --seed $seed 2>&1 | grep -v WARNING
  timeout 1500 python bench_pf.py --particles 1000 --refine-chunk 125 \
    --update-mode shared --anchor-dither theta_phase --seed $seed \
    2>&1 | grep -v WARNING
done
