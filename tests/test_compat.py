"""whisper.h compat shim tests — the mechanical-porting surface."""

import numpy as np
import pytest
import jax.numpy as jnp

import open_whisper_kit_tpu.compat as whisper


@pytest.fixture(scope="module")
def ctx(ref_models):
    return whisper.whisper_init_from_file(
        str(ref_models / "for-tests-ggml-tiny.en.bin"), dtype=jnp.float32)


def test_model_info(ctx):
    assert whisper.whisper_n_vocab(ctx) == 51864
    assert whisper.whisper_n_audio_ctx(ctx) == 1500
    assert whisper.whisper_n_text_ctx(ctx) == 448
    assert not whisper.whisper_is_multilingual(ctx)
    assert whisper.whisper_model_type_readable(ctx) == "tiny"


def test_token_api(ctx):
    assert whisper.whisper_token_eot(ctx) == 50256
    assert whisper.whisper_token_beg(ctx) == 50363
    toks = whisper.whisper_tokenize(ctx, "Hello world")
    assert toks
    text = "".join(whisper.whisper_token_to_str(ctx, t) for t in toks)
    assert text == "Hello world"


def test_lang_api():
    assert whisper.whisper_lang_id("en") == 0
    assert whisper.whisper_lang_id("spanish") == whisper.whisper_lang_id("es")
    assert whisper.whisper_lang_str(0) == "en"
    assert whisper.whisper_lang_str_full(0) == "english"
    assert whisper.whisper_lang_max_id() == 99


def test_full_flow(ctx):
    params = whisper.whisper_full_default_params(
        whisper.WHISPER_SAMPLING_GREEDY)
    params.print_progress = False
    params.greedy.best_of = 1
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.05
    assert whisper.whisper_full(ctx, params, audio, len(audio)) == 0
    n = whisper.whisper_full_n_segments(ctx)
    for i in range(n):
        assert isinstance(whisper.whisper_full_get_segment_text(ctx, i), str)
        assert whisper.whisper_full_get_segment_t0(ctx, i) >= 0


def test_system_info():
    assert "jax" in whisper.whisper_print_system_info()
