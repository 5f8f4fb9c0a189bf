"""Silero VAD tests against the real reference fixture.

Golden expectations come from the reference's own test
(tests/test-vad.cpp: jfk.wav -> 344 chunk probs, 4 speech segments).
"""

import numpy as np
import pytest

from open_whisper_kit_tpu.audio.wav import load_wav
from open_whisper_kit_tpu.decode.params import VadParams
from open_whisper_kit_tpu.models.silero.vad import SileroVAD
from open_whisper_kit_tpu.vad import segments as VS

FIXTURE = "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin"


@pytest.fixture(scope="module")
def vad(ref_models):
    return SileroVAD.from_file(str(ref_models / "for-tests-silero-v6.2.0-ggml.bin"))


@pytest.fixture(scope="module")
def jfk(jfk_wav):
    return load_wav(jfk_wav)


def test_jfk_probs_golden(vad, jfk):
    probs = vad.detect_speech(jfk)
    assert len(probs) == 344           # tests/test-vad.cpp:31
    assert (probs >= 0).all() and (probs <= 1).all()
    # jfk is mostly speech
    assert probs.mean() > 0.5


def test_jfk_segments_golden(vad, jfk):
    probs = vad.detect_speech(jfk)
    segs = VS.segments_from_probs(probs, VadParams())
    assert len(segs) == 4              # tests/test-vad.cpp:39
    for s in segs:
        assert 0 <= s.start < s.end <= 1200
    # segments are ordered and non-overlapping
    for a, b in zip(segs, segs[1:]):
        assert a.end <= b.start


def test_silence_has_no_segments(vad):
    probs = vad.detect_speech(np.zeros(16000 * 2, np.float32))
    assert probs.max() < 0.5
    assert VS.segments_from_probs(probs, VadParams()) == []


def test_state_carry(vad, jfk):
    """Stateful chunked calls must match the one-shot probs."""
    one = vad.detect_speech(jfk)
    vad.reset_state()
    n = len(jfk) // 2 // 512 * 512  # split at a chunk boundary
    a = vad.detect_speech(jfk[:n], reset=True)
    b = vad.detect_speech(jfk[n:], reset=False)
    two = np.concatenate([a, b])
    assert len(two) == len(one)
    np.testing.assert_allclose(one, two, atol=1e-5)


def test_filter_and_remap(vad, jfk):
    probs = vad.detect_speech(jfk)
    segs = VS.segments_from_probs(probs, VadParams())
    fr = VS.filter_samples(jfk, segs, VadParams())
    assert 0 < len(fr.samples) < len(jfk)
    assert fr.mapping == sorted(fr.mapping, key=lambda m: m[0])
    # processed times are unique
    keys = [m[0] for m in fr.mapping]
    assert len(keys) == len(set(keys))
    # boundary mapping: processed 0 maps to (near) first segment start
    assert abs(VS.map_processed_to_original(0, fr.mapping) - segs[0].start) <= 1
    # monotonic mapping
    pts = [VS.map_processed_to_original(t, fr.mapping) for t in range(0, keys[-1], 7)]
    assert all(a <= b for a, b in zip(pts, pts[1:]))


def test_whisper_full_with_vad(ref_models, jfk):
    """params.vad routes through filter + transcribe + remap (stub model)."""
    import jax.numpy as jnp
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams

    ctx = F.WhisperContext.from_file(
        str(ref_models / "for-tests-ggml-tiny.en.bin"), dtype=jnp.float32)
    p = FullParams(print_progress=False, vad=True,
                   vad_model_path=str(ref_models / "for-tests-silero-v6.2.0-ggml.bin"))
    p.greedy.best_of = 1
    res = F.whisper_full(ctx, p, jfk)
    assert res.timings.n_encode >= 1  # pipeline ran on filtered audio
