"""Offline WER-harness dry-run: the full evaluation plumbing rehearsed
end-to-end BEFORE real weights exist (the round-3 close of VERDICT ask #8).

A small corpus of synthetic wavs is transcribed by the REFERENCE
whisper_full (the C++ runtime built in-tree, tests/test_ref_golden.py
harness) on a random-weight tiny.en checkpoint; its transcripts become the
corpus "reference texts". tools/eval_wer.py then transcribes the same wavs
with THIS framework on the same checkpoint, normalizes both sides with the
faithful EnglishTextNormalizer, and must report WER == 0 — proving corpus
collection, audio I/O, decode-config matching, normalization, and the WER
math all work, so when real weights arrive only the download step is new.

Reference counterpart: tests/librispeech/eval.py:30-46 (jiwer + normalizer
over whisper-cli --output-txt batch runs).
"""

import contextlib
import io
import struct
import wave
from pathlib import Path

import numpy as np
import pytest

from tests import test_ref_golden as TRG


@pytest.fixture(scope="module")
def harness():
    if not TRG.REF.exists():
        pytest.skip("reference tree not available")
    try:
        return TRG._build_reference()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference build failed: {e}")


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from open_whisper_kit_tpu.io import quant
    from open_whisper_kit_tpu.io.ggml_whisper import load_checkpoint
    from open_whisper_kit_tpu.io.ggml_writer import (
        random_reference_tensors, write_checkpoint)

    stub = TRG.REF / "models" / "for-tests-ggml-tiny.en.bin"
    if not stub.exists():
        pytest.skip("reference stub model not available")
    ck = load_checkpoint(stub)
    tensors = random_reference_tensors(ck.hparams, seed=1234)
    path = tmp_path_factory.mktemp("ckpt") / "random-tiny.en.bin"
    write_checkpoint(path, ck.hparams, ck.mel_filters, ck.tokens, tensors,
                     wtype=quant.GGML_TYPE_F16)
    return path


def _write_wav(path: Path, pcm: np.ndarray) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        ints = np.clip(pcm * 32767.0, -32768, 32767).astype("<i2")
        w.writeframes(ints.tobytes())


def test_wer_harness_dry_run(harness, checkpoint, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()

    rng = np.random.default_rng(7)
    n_files = 3
    for i in range(n_files):
        # tone + noise so the random-weight model decodes varied tokens
        t = np.arange(16000 * 3, dtype=np.float32) / 16000.0
        pcm = (0.05 * np.sin(2 * np.pi * (120 + 90 * i) * t)
               + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        wav = corpus / f"utt{i}.wav"
        _write_wav(wav, pcm)

        # 16-bit WAV quantization: run the reference on the SAME samples
        # the framework will read back from disk
        from open_whisper_kit_tpu.audio.wav import load_wav
        pcm_rt = np.asarray(load_wav(str(wav)), np.float32)
        raw = tmp_path / f"utt{i}.f32"
        raw.write_bytes(pcm_rt.tobytes())
        segs = TRG._run_full(harness, checkpoint, raw, tmp_path)
        ref_text = " ".join(s[2].strip() for s in segs).strip()
        (corpus / f"utt{i}.txt").write_text(ref_text)

    from tools import eval_wer
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = eval_wer.main(["--model", str(checkpoint),
                            "--corpus", str(corpus), "--no-fallback"])
    out = buf.getvalue()
    assert rc == 0, out

    total_line = next(ln for ln in out.splitlines() if "TOTAL WER" in ln)
    # "TOTAL WER: 0.0000 over N words, 3 files"
    parts = total_line.split()
    total_wer = float(parts[2])
    total_words = int(parts[4])
    assert total_words > 0, ("normalizer emptied every transcript — "
                             "dry run proves nothing\n" + out)
    assert total_wer == 0.0, out
