#!/bin/bash
# Round-3 hardware campaign: run each benchmark ALONE on the TPU, in
# order, logging to /tmp/campaign/. See docs/PERFORMANCE.md "Round 3".
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/campaign

run() {
    name="$1"; shift
    echo "=== $name: $* ($(date)) ===" | tee -a /tmp/campaign/summary.log
    timeout 4000 "$@" > "/tmp/campaign/$name.log" 2>&1
    rc=$?
    tail -20 "/tmp/campaign/$name.log" | tee -a /tmp/campaign/summary.log
    echo "=== $name rc=$rc ===" | tee -a /tmp/campaign/summary.log
}

# 1. the driver-format artifact (headline + every column incl. beam5 e2e,
#    sortformer, grouped medium); first run also warms the compile cache
run bench1 python bench.py
# 2. deep-decoder grouped A/B
run grouped_medium python tools/bench_grouped_ab.py medium
run grouped_large_v2 python tools/bench_grouped_ab.py large-v2
# 3. batched-stream kernel tac sweep
run batch_ab python tools/bench_batch_ab.py
# 4. beam kernel re-verify
run beam_ab python tools/bench_beam_ab.py
# 4a. beam-5 e2e component breakdown (VERDICT #5's fallback deliverable)
run beam_profile python tools/profile_beam_e2e.py
# 4b. speculative-decode components (draft XLA vs mega; modeled speedup)
run spec_ab python tools/bench_spec_ab.py
# 5. clean second bench pass (fully warm cache)
run bench2 python bench.py
echo "CAMPAIGN DONE $(date)" | tee -a /tmp/campaign/summary.log
