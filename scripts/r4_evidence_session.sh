#!/bin/bash
# Round-4 chip session 5: the round's VALIDATION EVIDENCE (VERDICT r3
# item 2) — tpu_smoke (all stages, verbatim -> docs/TPU_SMOKE_r04.md),
# the endurance chip run, and the fine-res PF constant sweep (item 5).
# ONE chip process at a time; runs sequentially.
#   bash scripts/r4_evidence_session.sh > /tmp/r4_evidence.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

timeout 3600 python scripts/tpu_smoke.py 2>&1 | grep -v WARNING | tee /tmp/tpu_smoke_r04.txt

timeout 3600 python scripts/bench_endurance.py 2>&1 | grep -v WARNING | tee /tmp/endurance_r04.txt

timeout 7200 python scripts/bench_pf_finesweep.py 2>&1 | grep -v WARNING | tee /tmp/finesweep_r04.txt
