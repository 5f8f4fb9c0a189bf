"""Utils: timings print, system info, state save/restore round-trips."""

import io

import numpy as np
import jax.numpy as jnp

from open_whisper_kit_tpu.utils import state as ST
from open_whisper_kit_tpu.utils import timings as TM


def test_print_timings():
    from open_whisper_kit_tpu.decode.full import Timings, TranscribeResult
    r = TranscribeResult(segments=[], timings=Timings(
        t_mel_ms=1.5, t_encode_ms=20.0, t_decode_ms=50.0, t_sample_ms=2.0,
        n_encode=2, n_decode=100, n_sample=98))
    buf = io.StringIO()
    TM.print_timings(r, file=buf)
    out = buf.getvalue()
    assert "encode time" in out and "100 runs" in out


def test_system_info():
    info = TM.system_info()
    assert "jax =" in info and "devices =" in info


def test_log_callback():
    seen = []
    TM.log_set(lambda lvl, msg: seen.append((lvl, msg)))
    TM.log(TM.LOG_LEVEL_INFO, "hello\n")
    TM.log_set(None)
    assert seen == [(TM.LOG_LEVEL_INFO, "hello\n")]


def test_vad_state_roundtrip(tmp_path, ref_models):
    from open_whisper_kit_tpu.models.silero.vad import SileroVAD
    vad = SileroVAD.from_file(
        str(ref_models / "for-tests-silero-v6.2.0-ggml.bin"))
    audio = np.sin(np.arange(512 * 31) * 0.1).astype(np.float32)
    vad.detect_speech(audio)      # advance state
    h_before = np.asarray(vad.h)

    p = tmp_path / "st.npz"
    ST.save_state(p, vad=vad)
    vad.reset_state()
    assert not np.allclose(np.asarray(vad.h), h_before)
    ST.restore(vad, ST.load_state(p)["vad"])
    np.testing.assert_allclose(np.asarray(vad.h), h_before)

    # resumed stateful detection equals uninterrupted
    more = np.sin(np.arange(8192) * 0.07).astype(np.float32)
    a = vad.detect_speech(more, reset=False)
    vad.reset_state()
    full = vad.detect_speech(np.concatenate([audio, more]))
    np.testing.assert_allclose(a, full[len(audio) // 512:], atol=1e-5)


def test_sortformer_state_roundtrip(tmp_path):
    from open_whisper_kit_tpu.models.sortformer.streaming import StreamState
    st = StreamState(8)
    st.spkcache = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    st.spkcache_preds = np.random.default_rng(1).random((5, 4)).astype(np.float32)
    st.spkcache_preds_valid = True
    st.n_sil_frames = 7
    p = tmp_path / "sf.npz"
    ST.save_state(p, aosc=st)
    st2 = StreamState(8)
    ST.restore(st2, ST.load_state(p)["aosc"])
    np.testing.assert_array_equal(st2.spkcache, st.spkcache)
    assert st2.spkcache_preds_valid
    assert st2.n_sil_frames == 7


def test_streaming_transcriber_state(tmp_path, ref_models):
    from open_whisper_kit_tpu.decode.full import WhisperContext
    from open_whisper_kit_tpu.decode.stream import (StreamParams,
                                                    StreamingTranscriber)
    ctx = WhisperContext.from_file(
        str(ref_models / "for-tests-ggml-tiny.en.bin"), dtype=jnp.float32)
    st = StreamingTranscriber(ctx, StreamParams(step_ms=1000))
    st.feed(np.zeros(20000, np.float32))
    p = tmp_path / "tr.npz"
    ST.save_state(p, stream=st)
    st2 = StreamingTranscriber(ctx, StreamParams(step_ms=1000))
    ST.restore(st2, ST.load_state(p)["stream"])
    assert st2.n_iter == st.n_iter
    np.testing.assert_array_equal(st2._buf, st._buf)
