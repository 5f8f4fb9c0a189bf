#!/bin/bash
# Round-5 hardware campaign: run the moment the chip returns.
# Each job alone on the chip; outputs under docs/artifacts/.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/artifacts
TS=$(date +%H%M%S)

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a docs/artifacts/campaign_r5_$TS.log
  timeout "${JOB_TIMEOUT:-900}" "$@" 2>&1 | tee docs/artifacts/${name}_r5.txt \
    | tail -20
}

# 1. int8 MXU probe: does Pallas s8xs8 hit ~2x bf16?
run int8_mxu python tools/bench_int8_mxu.py

# 2. encoder A/B: bf16 vs W8A8, single window + batch 16
run enc8_ab python tools/bench_enc8_ab.py large-v3-turbo 1
run enc8_ab_b16 python tools/bench_enc8_ab.py large-v3-turbo 16

# 2b. batched serving A/B: encoder x decoder quant variants at B=16
run batched_ab python tools/bench_batched_ab.py 16

# 3. full bench artifact (also pre-warms the persistent compile cache
#    for the driver's own run)
JOB_TIMEOUT=1100 run bench env OWK_BENCH_BUDGET_S=1000 python bench.py

# 4. second bench pass — warm-cache timing (the driver-comparable run)
JOB_TIMEOUT=900 run bench_warm env OWK_BENCH_BUDGET_S=780 python bench.py
