#!/bin/bash
# CI driver (the reference's ci/run.sh analog, SURVEY §4): run everything
# that can be validated without real weights or a live TPU, in the order a
# regression is cheapest to catch. Usage:
#
#   bash tools/ci.sh            # full suite
#   bash tools/ci.sh --fast     # smoke subset (~5 min)
#
# Exit code is the first failing stage's.
set -u
cd "$(dirname "$0")/.."

FAST=${1:-}
log() { echo "=== ci: $* ($(date +%T)) ==="; }

log "package import + syntax"
python - <<'EOF' || exit 1
import ast, pathlib
for p in pathlib.Path("open_whisper_kit_tpu").rglob("*.py"):
    ast.parse(p.read_text())
import open_whisper_kit_tpu  # noqa: F401
print("import ok")
EOF

log "graft entry: single-chip compile check (CPU trace)"
python - <<'EOF' || exit 1
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as G
fn, args = G.entry()
jax.jit(fn).lower(*args)   # trace+lower proves shapes/dtypes compose
print("entry lowers ok")
EOF

log "native sanitizers (ASan+UBSan, TSan — reference CMakeLists.txt:74-76)"
make -C native/owk_audio sanitize || exit 1
make -C bindings/c sanitize || exit 1

log "graft entry: 8-virtual-device multichip dryrun"
python -c "import __graft_entry__ as G; G.dryrun_multichip(8)" || exit 1

log "bench salvage path (no-chip artifact must be parseable, rc 0)"
OWK_BENCH_PROBE_TIMEOUT=${CI_PROBE_TIMEOUT:-30} \
OWK_BENCH_PROBE_SLEEPS=0 \
python bench.py | python -c "import json,sys; json.loads(sys.stdin.readline()); print('bench JSON ok')" || exit 1

if [ "$FAST" = "--fast" ]; then
    log "pytest (smoke subset)"
    python -m pytest tests/test_whisper_model.py tests/test_io.py \
        tests/test_quantize.py tests/test_logit_rules.py \
        tests/test_mesh_api.py -q || exit 1
else
    log "pytest (full suite)"
    python -m pytest tests/ -q || exit 1
fi

log "ALL GREEN"
