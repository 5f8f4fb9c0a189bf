"""End-to-end speaker-attributed transcript (BASELINE config #5 path):
transcribe -> word timings -> diarize -> align -> "[speaker]: text"."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu import api
from open_whisper_kit_tpu.decode.params import FullParams


def test_words_from_result_grouping():
    from open_whisper_kit_tpu.decode.full import Segment, TokenData, TranscribeResult

    class V:
        token_eot = 50256
        def token_to_str(self, tid):
            return {1: " Hello", 2: " wor", 3: "ld", 4: "."}[tid]

    toks = [TokenData(1, 0, 0.9, -0.1, 0, 0, t0=0, t1=50),
            TokenData(2, 0, 0.8, -0.2, 0, 0, t0=50, t1=80),
            TokenData(3, 0, 0.7, -0.2, 0, 0, t0=80, t1=100),
            TokenData(4, 0, 0.95, -0.1, 0, 0, t0=100, t1=110)]
    res = TranscribeResult(segments=[Segment(0, 110, " Hello world.", 0.0, toks)])
    words = api.words_from_result(res, vocab=V())
    assert [w.word for w in words] == ["Hello", "world."]
    assert words[0].start == 0.0 and abs(words[0].end - 0.5) < 1e-6
    assert abs(words[1].start - 0.5) < 1e-6 and abs(words[1].end - 1.1) < 1e-6


def test_full_speaker_attributed_pipeline(ref_models, jfk_wav):
    """Whole chain runs: whisper (stub) + sortformer (tiny random) + align."""
    from open_whisper_kit_tpu.models.sortformer import model as SM
    from open_whisper_kit_tpu.models.sortformer import streaming as SS

    tr = api.Transcriber(preset="tiny.en", dtype=jnp.float32)
    p = FullParams(print_progress=False, token_timestamps=True)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    audio = (np.random.default_rng(1).standard_normal(16000 * 2)
             .astype(np.float32) * 0.1)
    res = tr.transcribe(audio, p)
    words = api.words_from_result(res, ctx=tr.ctx)

    tiny = SM.SortformerConfig(
        n_mels=32, d_model=32, n_layers=2, n_heads=4, conv_kernel=5,
        ff_expansion=2, subsampling_channels=8,
        tf_layers=2, tf_d_model=16, tf_heads=4, tf_ff=32)
    d = api.Diarizer(cfg=tiny, params=SM.init_params(tiny, seed=0))
    probs, segments = d.diarize(
        audio, stream_config=SS.StreamConfig(
            chunk_len=8, spkcache_len=8, spkcache_update_period=8,
            spkcache_sil_frames_per_spk=1),
        threshold=0.4, median_win=1, file_id="t")

    out = api.align(words, segments)
    assert isinstance(out.text, str)
    assert len(out.words) == len(words)
    if out.segments:
        assert out.text.startswith("[")
