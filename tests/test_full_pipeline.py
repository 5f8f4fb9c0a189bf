"""End-to-end pipeline tests: stub checkpoints and random-weight presets.

The reference exercises its full pipeline with weightless stub models
(tests/CMakeLists.txt + the n_loaded==0 short-circuit); we reuse the same
fixtures plus random-weight real-shape models for the paths that need
non-degenerate logits.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.audio.wav import load_wav
from open_whisper_kit_tpu.decode import full as F
from open_whisper_kit_tpu.decode.params import FullParams, SamplingStrategy


@pytest.fixture(scope="module")
def jfk(request):
    import tests.conftest as C
    return load_wav(C.REFERENCE / "samples/jfk.wav")


@pytest.fixture(scope="module")
def stub_ctx():
    return F.WhisperContext.from_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin", dtype=jnp.float32)


@pytest.fixture(scope="module")
def rand_ctx():
    # small random model: fast, produces non-degenerate logits
    ctx = F.WhisperContext.from_preset("tiny.en", dtype=jnp.float32)
    return ctx


def test_stub_pipeline_greedy(stub_ctx, jfk):
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    res = F.whisper_full(stub_ctx, p, jfk)
    # stub model -> pipeline runs, no segments (reference behavior)
    assert res.segments == []
    assert res.timings.n_encode >= 1
    assert res.timings.n_decode >= 1


def test_stub_pipeline_beam(stub_ctx, jfk):
    p = FullParams(strategy=SamplingStrategy.BEAM_SEARCH, print_progress=False)
    p.beam_search.beam_size = 2
    res = F.whisper_full(stub_ctx, p, jfk[:16000 * 3])
    assert res.segments == []
    assert res.timings.n_encode >= 1


def test_short_audio_skipped(stub_ctx):
    p = FullParams(print_progress=False)
    res = F.whisper_full(stub_ctx, p, np.zeros(800, np.float32))  # 50 ms
    assert res.segments == []
    assert res.timings.n_encode == 0


def test_random_model_emits_segments(rand_ctx):
    """Random weights decode *something*; exercises segment emission,
    timestamp tokens, sliding window advance and termination."""
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    p.temperature_inc = 0  # single pass; random logits often fail qa gates
    audio = np.random.default_rng(0).standard_normal(16000 * 2).astype(np.float32) * 0.1
    res = F.whisper_full(rand_ctx, p, audio)
    # must terminate; any segments must have sane timestamps
    for s in res.segments:
        assert 0 <= s.t0 <= s.t1
        assert isinstance(s.text, str)


def test_token_timestamps_fill(rand_ctx):
    p = FullParams(print_progress=False, token_timestamps=True)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    audio = np.random.default_rng(1).standard_normal(16000 * 2).astype(np.float32) * 0.1
    res = F.whisper_full(rand_ctx, p, audio)
    for s in res.segments:
        for t in s.tokens:
            assert t.t0 >= 0 and t.t1 >= t.t0


def test_prompt_roundtrip(stub_ctx):
    """initial_prompt is tokenized and survives the prompt-budget logic."""
    v = stub_ctx.vocab
    ids = v.tokenize("Hello world")
    assert ids, "tokenizer produced no tokens"
    text = v.decode(ids)
    assert text == "Hello world"


def test_tokenizer_special_ids(stub_ctx):
    v = stub_ctx.vocab
    assert v.token_eot == 50256   # tiny.en is not multilingual
    assert v.token_sot == 50257
    assert v.token_beg == 50363
    assert not v.is_multilingual


def test_tokenizer_multilingual_ids():
    from open_whisper_kit_tpu.io import ggml_whisper
    from open_whisper_kit_tpu.decode import tokenizer as T
    ck = ggml_whisper.load_checkpoint(
        "/root/reference/models/for-tests-ggml-tiny.bin", load_tensors=False)
    v = T.build_vocab(ck.tokens, ck.hparams.n_vocab)
    assert v.is_multilingual
    assert v.token_eot == 50257
    assert v.token_sot == 50258
    assert v.token_beg == 50364
    assert v.token_lang(T.lang_id("en")) == 50259
    assert v.token_lang(T.lang_id("es")) == 50262


def test_stub_pipeline_beam_megakernel(stub_ctx, jfk):
    """Beam search through the megakernel step (origin-table lineage, no
    physical KV reorder): wiring check through whisper_full — single-slot
    prompt ingest, per-step beam_attn_bias, origin carry."""
    p = FullParams(strategy=SamplingStrategy.BEAM_SEARCH,
                   print_progress=False, megakernel=True)
    p.beam_search.beam_size = 2
    res = F.whisper_full(stub_ctx, p, jfk[:16000 * 3])
    assert res.segments == []
    assert res.timings.n_encode >= 1
    assert res.timings.n_decode >= 1


def test_rand_pipeline_beam_megakernel(rand_ctx, jfk):
    """Non-degenerate logits through the beam megakernel: the decode must
    produce finite, in-vocab tokens (numerical parity of the kernel is
    gated by tests/test_decode_megakernel.py; this checks the fused-loop
    integration end-to-end)."""
    p = FullParams(strategy=SamplingStrategy.BEAM_SEARCH,
                   print_progress=False, megakernel=True,
                   single_segment=True, max_tokens=6)
    p.beam_search.beam_size = 2
    res = F.whisper_full(rand_ctx, p, jfk[:16000 * 2])
    assert res.timings.n_decode >= 1
    for seg in res.segments:
        for t in seg.tokens:
            assert 0 <= t.id < rand_ctx.cfg.n_vocab
