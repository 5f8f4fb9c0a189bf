"""Native audio runtime (C++ owk_audio) vs the numpy reference paths."""

import numpy as np
import pytest

from open_whisper_kit_tpu.audio import native as N
from open_whisper_kit_tpu.audio.wav import load_wav

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native runtime not built")


def test_wav_decode_matches_python(jfk_wav):
    data = jfk_wav.read_bytes()
    a = N.decode_wav(data)
    b = load_wav(jfk_wav, use_native=False)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_stereo_decode(tmp_path):
    import wave
    sr = 16000
    left = (np.sin(np.arange(sr) * 0.1) * 0.5 * 32767).astype("<i2")
    right = (np.cos(np.arange(sr) * 0.1) * 0.5 * 32767).astype("<i2")
    inter = np.empty(2 * sr, "<i2")
    inter[0::2] = left
    inter[1::2] = right
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())
    out = N.decode_wav(p.read_bytes(), stereo=True)
    assert out.shape == (sr, 2)
    np.testing.assert_allclose(out[:, 0], left / 32768.0, atol=1e-4)


def test_resample_preserves_tone():
    t = np.arange(44100) / 44100.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = N.resample(x, 44100)
    assert abs(len(y) - 16000) <= 1
    # tone amplitude preserved (skip edges)
    rms = np.sqrt((y[500:-500] ** 2).mean())
    assert abs(rms - 1 / np.sqrt(2)) < 0.02
    # frequency preserved: zero crossings per second ~= 880
    zc = int((np.diff(np.sign(y[500:-500])) != 0).sum())
    dur = (len(y) - 1000) / 16000.0
    assert abs(zc / dur - 880) < 20


def test_resample_antialiases():
    """A tone above the target Nyquist must be attenuated, not folded."""
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 11000 * t).astype(np.float32)  # > 8 kHz
    y = N.resample(x, 48000)
    rms = np.sqrt((y[500:-500] ** 2).mean())
    assert rms < 0.25


def test_signal_energy_matches_python():
    from open_whisper_kit_tpu.timestamps.energy import get_signal_energy
    x = np.random.default_rng(0).standard_normal(5000).astype(np.float32)
    a = N.signal_energy(x, 32)
    b = get_signal_energy(x, 32)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_high_pass_matches_python():
    from open_whisper_kit_tpu.decode.stream import high_pass_filter
    x = np.random.default_rng(1).standard_normal(2000).astype(np.float32)
    a = N.high_pass(x, 100.0)
    b = high_pass_filter(x, 100.0)
    np.testing.assert_allclose(a, b, atol=1e-5)


class TestRing:
    def test_basic(self):
        r = N.NativeRing(100)
        r.write(np.arange(10, dtype=np.float32))
        assert len(r) == 10
        np.testing.assert_array_equal(r.get(3), [7, 8, 9])

    def test_wraparound(self):
        r = N.NativeRing(16)
        r.write(np.arange(40, dtype=np.float32))
        assert len(r) == 16
        np.testing.assert_array_equal(r.get(4), [36, 37, 38, 39])

    def test_clear(self):
        r = N.NativeRing(8)
        r.write(np.ones(5, np.float32))
        r.clear()
        assert len(r) == 0
        assert r.get(4).size == 0


class TestLiveCapture:
    def test_unavailable_raises_cleanly(self):
        """No ALSA in this container: constructor must raise the typed
        error (code NO_LIB or OPEN), never crash; stop() is a no-op."""
        from open_whisper_kit_tpu.audio import native as N
        if not N.available():
            pytest.skip("native lib unavailable")
        with pytest.raises(N.CaptureUnavailable) as ex:
            N.LiveCapture(device="default")
        assert ex.value.code in (N.CAPTURE_ERR_NO_LIB, N.CAPTURE_ERR_OPEN,
                                 N.CAPTURE_ERR_PARAMS)
        assert not N._load().owk_capture_running()

    def test_ring_with_synthetic_producer(self):
        """The mic-loop contract on the same ring the capture thread uses:
        a producer thread writes blocks concurrently; the consumer polls
        the buffered tail and reconstructs a gapless in-order stream
        (exactly LiveCapture.get_new's unseen-tail semantics)."""
        import threading
        import time
        from open_whisper_kit_tpu.audio import native as N
        if not N.available():
            pytest.skip("native lib unavailable")
        ring = N.NativeRing(capacity=16000)
        src = np.arange(48000, dtype=np.float32)

        def producer():
            for i in range(0, len(src), 800):
                ring.write(src[i:i + 800])
                time.sleep(0.001)

        t = threading.Thread(target=producer)
        t.start()
        got = []
        seen = 0           # absolute sample position consumed so far
        deadline = time.monotonic() + 10.0
        while seen < len(src) and time.monotonic() < deadline:
            time.sleep(0.002)
            buf = ring.get(len(ring))          # everything buffered
            if not len(buf):
                continue
            first = int(buf[0])                # values encode positions
            fresh = buf[max(0, seen - first):]
            if len(fresh):
                got.append(fresh)
                seen = int(fresh[-1]) + 1
        t.join()
        stream = np.concatenate(got)
        assert seen == len(src), "producer data lost (poller outpaced?)"
        assert np.all(np.diff(stream) == 1.0), "stream has gaps/reorders"
