"""Log-mel front-end tests: jitted path vs numpy oracle, reference semantics."""

import numpy as np

from open_whisper_kit_tpu.audio import mel as mel_mod
from open_whisper_kit_tpu.audio.wav import load_wav
from open_whisper_kit_tpu.io import ggml_whisper


def _filters(ref_models):
    ck = ggml_whisper.load_checkpoint(
        ref_models / "for-tests-ggml-tiny.en.bin", load_tensors=False)
    return ck.mel_filters


def test_hann_window_periodic():
    w = mel_mod.hann_window(400)
    assert w[0] == 0.0
    assert abs(w[200] - 1.0) < 1e-6
    # periodic: w[k] == w[400-k]
    np.testing.assert_allclose(w[1:], w[:0:-1], atol=1e-6)


def test_frame_counts(ref_models):
    filt = _filters(ref_models)
    n = 16000  # 1 s
    m = mel_mod.log_mel_spectrogram(np.zeros(n, np.float32), filt)
    # n_len = (n + 480000 + 400 - 400)/160
    assert m.n_len == (n + 480000) // 160
    # n_len_org = 1 + (n + 200 - 400)/160
    assert m.n_len_org == 1 + (n + 200 - 400) // 160
    assert m.data.shape[0] >= m.n_len and m.data.shape[1] == 80
    # compile-bucket padding is zeroed
    assert np.asarray(m.data[m.n_len:]).sum() == 0


def test_silence_normalization(ref_models):
    filt = _filters(ref_models)
    m = mel_mod.log_mel_spectrogram(np.zeros(16000, np.float32), filt)
    d = np.asarray(m.data[:m.n_len])
    # all-silence: log10(1e-10) = -10 everywhere, clamped to max-8 = -18 →
    # every value (−10+4)/4 = −1.5
    np.testing.assert_allclose(d, -1.5, atol=1e-5)


def test_jit_matches_numpy_oracle(ref_models):
    filt = _filters(ref_models)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    m = mel_mod.log_mel_spectrogram(x, filt)
    ref = mel_mod.log_mel_spectrogram_numpy(x, filt)  # (n_mel, n_len)
    got = m.ref_layout()
    assert got.shape == ref.shape
    # jnp computes the FFT in f32 (like the reference C impl); the numpy
    # oracle promotes to f64 — tolerance covers that precision gap
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_jfk_mel_has_speech_energy(ref_models, jfk_wav):
    filt = _filters(ref_models)
    audio = load_wav(jfk_wav)
    assert abs(audio.shape[0] / 16000 - 11.0) < 0.5  # jfk.wav is ~11 s
    m = mel_mod.log_mel_spectrogram(audio, filt)
    d = np.asarray(m.data[:m.n_len])
    # speech region should be well above the silence floor
    speech = d[: m.n_len_org]
    assert speech.max() > 0.0
    # zero-padded tail collapses to the clamp floor
    tail = d[m.n_len_org + 100:]
    assert tail.std() < 0.2


def test_nemo_mel_shapes():
    # 128-mel filterbank synthesized (triangular) just for shape checks
    filt = np.random.default_rng(0).random((128, 257)).astype(np.float32) * 0.01
    x = np.zeros(16000, np.float32)
    out = mel_mod.nemo_log_mel(x, filt)
    assert out.shape[1] == 128
    assert out.shape[0] % 16 == 0
    n_frames = 1 + (16000 + 512 - 512) // 160
    assert out.shape[0] == -(-n_frames // 16) * 16


def test_long_audio_bucketed_chunks_match_oracle(ref_models):
    """>8 mel chunks triggers the 8-multiple bucket (_bucket_chunks); the
    padded program must still match the exact oracle on the live frames."""
    filt = _filters(ref_models)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(16000 * 95) * 0.1).astype(np.float32)  # 95 s
    m = mel_mod.log_mel_spectrogram(x, filt)
    assert m.data.shape[0] % (8 * 1024) == 0        # bucketed chunk count
    ref = mel_mod.log_mel_spectrogram_numpy(x, filt)
    got = m.ref_layout()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)
    # padding rows beyond n_len are exactly zero
    assert float(np.abs(np.asarray(m.data[m.n_len:])).max()) == 0.0
