#!/bin/bash
# One-command real-weight acceptance runway (VERDICT r3 ask #7; the
# reference's tests/run-tests.sh + tests/librispeech/eval.py flow).
#
# With network egress it downloads real checkpoints and runs:
#   1. tiny.en on samples/jfk.wav, char-diffed against the reference's
#      golden semantics (tests/en-*-ref.txt style human-inspectable diff);
#   2. a LibriSpeech-subset WER smoke via tools/eval_wer.py (jiwer-parity
#      normalizer; reference tests/librispeech/eval.py:30-46);
#   3. Silero VAD segment extraction on jfk.wav;
#   4. SortFormer diarization + DER-style RTTM compare against the
#      reference's streaming-sortformer/nemo_streaming.rttm golden
#      (tools/compare_rttm.py).
#
# Without egress (this image): --dry-run exercises the SAME flow end-to-end
# on stub/random-weight checkpoints so the plumbing is proven in CI now;
# outputs are format-checked instead of accuracy-checked.
#
# Usage:
#   bash tools/acceptance.sh [--dry-run] [--models DIR] [--corpus DIR]
set -u
cd "$(dirname "$0")/.."

DRY=0
MODELS_DIR=models
CORPUS=""
while [ $# -gt 0 ]; do
    case "$1" in
        --dry-run) DRY=1 ;;
        --models) MODELS_DIR=$2; shift ;;
        --corpus) CORPUS=$2; shift ;;
        *) echo "unknown arg $1"; exit 2 ;;
    esac
    shift
done
mkdir -p "$MODELS_DIR"
log() { echo "=== acceptance: $* ($(date +%T)) ==="; }
# dry-run: device-free (OWK_FORCE_CPU pins the CPU backend centrally in
# utils/cache.enable_compile_cache — the image's sitecustomize beats
# JAX_PLATFORMS, so an env var alone is not enough)
[ "$DRY" = 1 ] && export OWK_FORCE_CPU=1
FAIL=0

REF=${OWK_REFERENCE_DIR:-/root/reference}
JFK=$REF/samples/jfk.wav

if [ "$DRY" = 1 ]; then
    WHISPER=$REF/models/for-tests-ggml-tiny.en.bin
    SILERO=$REF/models/for-tests-silero-v6.2.0-ggml.bin
    SORTFORMER=""     # generated below
else
    log "downloading real checkpoints (tiny.en, silero, sortformer)"
    python tools/download_models.py tiny.en --dir "$MODELS_DIR" || exit 1
    python tools/download_models.py --vad --dir "$MODELS_DIR" || exit 1
    WHISPER=$MODELS_DIR/ggml-tiny.en.bin
    SILERO=$(ls "$MODELS_DIR"/*silero*.bin | head -1)
    # NeMo sortformer: convert from the HF .nemo (needs nemo_toolkit deps
    # only for the converter's tar/yaml reading; weights load via torch)
    if [ ! -f "$MODELS_DIR/sortformer.gguf" ]; then
        python - <<'EOF' || exit 1
import urllib.request, pathlib
url = ("https://huggingface.co/nvidia/diar_streaming_sortformer_4spk-v2/"
       "resolve/main/diar_streaming_sortformer_4spk-v2.nemo")
dst = pathlib.Path("models/sortformer.nemo")
if not dst.exists():
    print("downloading", url)
    urllib.request.urlretrieve(url, dst)
EOF
        python tools/convert_nemo_to_gguf.py "$MODELS_DIR/sortformer.nemo" \
            "$MODELS_DIR/sortformer.gguf" || exit 1
    fi
    SORTFORMER=$MODELS_DIR/sortformer.gguf
fi

log "1/4 jfk.wav transcription golden"
OUT=$(mktemp -d)
python -m open_whisper_kit_tpu.cli.main -m "$WHISPER" -f "$JFK" \
    --output-txt --output-file "$OUT/jfk" || FAIL=1
if [ "$DRY" = 1 ]; then
    # stub model emits an empty transcript BY DESIGN (whisper.cpp:7426
    # short-circuit); the acceptance here is a clean exit + file produced
    [ -f "$OUT/jfk.txt" ] || FAIL=1
else
    # golden semantics of tests/run-tests.sh:60-75: word-level diff vs the
    # expected transcript, human-inspected (exact match for jfk.wav)
    EXPECTED=" And so my fellow Americans, ask not what your country can do for you, ask what you can do for your country."
    ACTUAL=$(cat "$OUT/jfk.txt")
    if [ "$(echo "$ACTUAL" | tr -d '[:space:]')" != "$(echo "$EXPECTED" | tr -d '[:space:]')" ]; then
        echo "jfk transcript mismatch:"; diff <(echo "$EXPECTED") <(echo "$ACTUAL")
        FAIL=1
    fi
fi

log "2/4 WER smoke (tools/eval_wer.py)"
if [ "$DRY" = 1 ]; then
    # plumbing-only: synthesize a 2-file plain-layout corpus; WER vs the
    # stub's empty output is 1.0 by definition — assert the harness runs
    # and reports, not the number
    python - "$WHISPER" <<'EOF' || FAIL=1
import subprocess, sys, tempfile, wave, pathlib
import numpy as np
d = pathlib.Path(tempfile.mkdtemp())
for i in range(2):
    pcm = (np.random.default_rng(i).standard_normal(16000) * 1000).astype("<i2")
    with wave.open(str(d / f"u{i}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    (d / f"u{i}.txt").write_text("hello world\n")
r = subprocess.run([sys.executable, "tools/eval_wer.py", "--model",
                    sys.argv[1], "--corpus", str(d)],
                   capture_output=True, text=True)
print(r.stdout[-400:])
assert r.returncode == 0 and "WER" in r.stdout, (r.returncode, r.stderr[-400:])
EOF
else
    if [ -z "$CORPUS" ]; then
        log "downloading LibriSpeech test-clean subset"
        python - <<'EOF' || exit 1
import urllib.request, tarfile, pathlib
url = "https://www.openslr.org/resources/12/test-clean.tar.gz"
dst = pathlib.Path("models/test-clean.tar.gz")
if not dst.exists():
    urllib.request.urlretrieve(url, dst)
with tarfile.open(dst) as t:
    t.extractall("models/librispeech")
EOF
        CORPUS=models/librispeech/LibriSpeech/test-clean
    fi
    python tools/eval_wer.py --model "$WHISPER" --corpus "$CORPUS" \
        --limit 50 || FAIL=1
    # target: WER parity with whisper.cpp tiny.en (~5.6% on test-clean)
fi

log "3/4 Silero VAD segments"
python -m open_whisper_kit_tpu.cli.vad_segments --vad-model "$SILERO" \
    -f "$JFK" || FAIL=1

log "4/4 SortFormer diarization + RTTM compare"
if [ "$DRY" = 1 ]; then
    python - <<'EOF' || FAIL=1
# random-weight sortformer: full diarize -> RTTM -> self-compare (DER 0)
import sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import tempfile, pathlib, subprocess
from open_whisper_kit_tpu.models.sortformer import model as SM
from open_whisper_kit_tpu.models.sortformer.export import write_sortformer_gguf
sys.path.insert(0, "tests")
from test_sortformer import TINY
d = pathlib.Path(tempfile.mkdtemp())
gguf = write_sortformer_gguf(d / "tiny.gguf", TINY, SM.init_params(TINY, seed=0))
r = subprocess.run([sys.executable, "-m", "open_whisper_kit_tpu.cli.diarize",
                    "-m", str(gguf), "-f", "/root/reference/samples/jfk.wav",
                    "-o", str(d / "out.rttm")], capture_output=True, text=True)
assert r.returncode == 0, r.stderr[-400:]
r = subprocess.run([sys.executable, "tools/compare_rttm.py",
                    str(d / "out.rttm"), str(d / "out.rttm")],
                   capture_output=True, text=True)
assert r.returncode == 0, r.stderr[-400:]
print("diarize + self-compare ok:", r.stdout.strip()[-120:])
EOF
else
    python -m open_whisper_kit_tpu.cli.diarize -m "$SORTFORMER" \
        -f "$REF/streaming-sortformer/test_audio.wav" -o "$OUT/dz.rttm" || FAIL=1
    python tools/compare_rttm.py "$OUT/dz.rttm" \
        "$REF/streaming-sortformer/nemo_streaming.rttm" || FAIL=1
fi

if [ "$FAIL" = 0 ]; then
    log "ACCEPTANCE GREEN"
else
    log "ACCEPTANCE FAILED"
fi
exit $FAIL
