"""Behavioral tests for whisper_full's parameter surface
(single_segment, audio_ctx, offset/duration, prompts, translate, max_tokens)."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.decode import full as F
from open_whisper_kit_tpu.decode.params import FullParams


@pytest.fixture(scope="module")
def ctx():
    return F.WhisperContext.from_preset("tiny.en", dtype=jnp.float32)


@pytest.fixture(scope="module")
def ml_ctx():
    return F.WhisperContext.from_preset("tiny", dtype=jnp.float32)


def _audio(seconds=2.0, seed=0):
    return (np.random.default_rng(seed).standard_normal(int(16000 * seconds))
            .astype(np.float32) * 0.1)


def _p(**kw):
    p = FullParams(print_progress=False, **kw)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    return p


def test_single_segment(ctx):
    res = F.whisper_full(ctx, _p(single_segment=True), _audio())
    assert len(res.segments) <= 1


def test_no_timestamps(ctx):
    res = F.whisper_full(ctx, _p(no_timestamps=True), _audio(seed=1))
    for s in res.segments:
        for t in s.tokens:
            assert t.id <= ctx.vocab.token_beg  # no timestamp tokens emitted


def test_audio_ctx_override(ctx):
    # shrinking the encoder context must still produce a valid run
    res = F.whisper_full(ctx, _p(audio_ctx=512), _audio(seed=2))
    assert res.timings.n_encode >= 1
    with pytest.raises(ValueError):
        F.whisper_full(ctx, _p(audio_ctx=5000), _audio(seed=2))


def test_offset_and_duration(ctx):
    audio = _audio(4.0, seed=3)
    res = F.whisper_full(ctx, _p(offset_ms=1000, duration_ms=2000), audio)
    for s in res.segments:
        assert s.t0 >= 100  # starts at/after the offset


def test_max_tokens_caps_segment(ctx):
    res = F.whisper_full(ctx, _p(max_tokens=3), _audio(seed=4))
    # every emitted segment's token walk stopped at <= max_tokens + 1
    for s in res.segments:
        assert len(s.tokens) <= 5


def test_translate_task_token(ml_ctx):
    """Multilingual models put the task token in the prompt; run must work."""
    res = F.whisper_full(ml_ctx, _p(translate=True, language="es"),
                         _audio(seed=5))
    assert res.lang_id >= 0


def test_initial_prompt_tokenized(ctx):
    p = _p(initial_prompt="Context about TPUs.")
    res = F.whisper_full(ctx, p, _audio(seed=6))
    assert res.timings.n_encode >= 1


def test_carry_initial_prompt(ctx):
    p = _p(initial_prompt="STATIC.", carry_initial_prompt=True,
           no_context=False)
    res = F.whisper_full(ctx, p, _audio(3.0, seed=7))
    assert res.timings.n_encode >= 1


def test_detect_language_returns_early(ml_ctx):
    p = _p(detect_language=True, language="auto")
    res = F.whisper_full(ml_ctx, p, _audio(seed=8))
    assert res.segments == []
    assert 0 <= res.lang_id < 100


def test_callbacks_fire(ctx):
    calls = {"progress": 0, "segment": 0, "encoder_begin": 0}
    p = _p()
    p.print_progress = True
    p.progress_callback = lambda pct: calls.__setitem__(
        "progress", calls["progress"] + 1)
    p.new_segment_callback = lambda res, n: calls.__setitem__(
        "segment", calls["segment"] + 1)
    p.encoder_begin_callback = lambda: (
        calls.__setitem__("encoder_begin", calls["encoder_begin"] + 1) or True)
    res = F.whisper_full(ctx, p, _audio(seed=9))
    assert calls["progress"] >= 1
    assert calls["encoder_begin"] >= 1
    if res.segments:
        assert calls["segment"] == len(res.segments)


def test_abort_callback_stops(ctx):
    # abort fires on the first poll -> the token loop must terminate after
    # at most the prompt decode + one token step per window attempt
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return True

    p = _p()
    p.abort_callback = abort
    res = F.whisper_full(ctx, p, _audio(seed=10))
    assert calls["n"] >= 1, "abort_callback was never polled"
    assert res.timings.n_decode <= 2, (
        f"abort did not stop the loop early (n_decode={res.timings.n_decode})")


def test_abort_callback_routes_to_host_loop(ctx):
    # with device loops left at the default, setting abort_callback must
    # still produce a per-token-pollable path (the fused loops cannot poll)
    polls = {"n": 0}

    def abort():
        polls["n"] += 1
        return False   # never cancel; just prove the poll happens

    p = _p()
    assert p.use_device_loops
    p.abort_callback = abort
    res = F.whisper_full(ctx, p, _audio(seed=10))
    # polled at least once per token step of each window (the fused
    # device loops never poll, so >=1 proves host routing)
    assert polls["n"] >= 1
    assert isinstance(res.segments, list)


def test_encoder_begin_veto(ctx):
    p = _p()
    p.encoder_begin_callback = lambda: False
    res = F.whisper_full(ctx, p, _audio(seed=11))
    assert res.segments == []
    assert res.timings.n_encode == 0


def test_cross_kv_int8_full(ctx, jfk_wav):
    """whisper_full with int8 cross-KV planes runs through both device
    paths (greedy + beam) and matches shape-wise."""
    from open_whisper_kit_tpu.audio.wav import load_wav
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import (FullParams,
                                                    SamplingStrategy)
    audio = load_wav(jfk_wav)[:16000 * 3]
    p = FullParams(print_progress=False, cross_kv_int8=True)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    r = F.whisper_full(ctx, p, audio)
    assert r is not None
    pb = FullParams(print_progress=False, cross_kv_int8=True,
                    strategy=SamplingStrategy.BEAM_SEARCH)
    pb.beam_search.beam_size = 2
    pb.temperature_inc = 0
    rb = F.whisper_full(ctx, pb, audio)
    assert rb is not None
