#!/bin/bash
# Round-4 chip session 11: update-kernel unroll A/B (VERDICT r3 item 9
# candidate "wider unroll"): _UNROLL 4 (control) vs 8, bench_update at
# the frontend 520^2 and PF 100x256^2 shapes. The working tree is
# patched and restored around the second run.
#   bash scripts/r4_chip_session11.sh > /tmp/r4_session11.log 2>&1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
set -x

timeout 2400 python scripts/bench_update.py 2>&1 | grep -v WARNING

sed -i 's/^_UNROLL = 4$/_UNROLL = 8/' slam2d_tpu/ops/pallas_update.py
timeout 2400 python scripts/bench_update.py 2>&1 | grep -v WARNING
sed -i 's/^_UNROLL = 8$/_UNROLL = 4/' slam2d_tpu/ops/pallas_update.py
grep -n "^_UNROLL" slam2d_tpu/ops/pallas_update.py
