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


# -- full-surface introspection (whisper.h parity) ----------------------------

def test_every_whisper_api_symbol_resolves():
    """Every WHISPER_API function in the reference header exists in compat."""
    import re
    from pathlib import Path
    hdr = Path("/root/reference/include/whisper.h")
    if not hdr.exists():
        pytest.skip("reference header not available")
    text = hdr.read_text()
    syms = sorted(set(re.findall(r"WHISPER_API[^(;]*?\b(whisper_\w+)\s*\(",
                                 text)))
    assert len(syms) >= 119, f"header parse suspect: only {len(syms)} syms"
    missing = [s for s in syms if not callable(getattr(whisper, s, None))]
    assert not missing, f"compat missing {len(missing)}: {missing}"


# -- state family -------------------------------------------------------------

def test_pcm_to_mel_encode_decode_get_logits(ctx):
    pcm = (np.random.default_rng(3).standard_normal(16000) * 0.1
           ).astype(np.float32)
    assert whisper.whisper_pcm_to_mel(ctx, pcm, len(pcm)) == 0
    assert whisper.whisper_n_len(ctx) > 0
    assert whisper.whisper_encode(ctx, 0) == 0
    sot = whisper.whisper_token_sot(ctx)
    assert whisper.whisper_decode(ctx, [sot], 1, 0) == 0
    logits = whisper.whisper_get_logits(ctx)
    assert logits.shape == (1, whisper.whisper_n_vocab(ctx))
    # continue through the KV cache
    assert whisper.whisper_decode(ctx, [400], 1, 1) == 0
    assert whisper.whisper_get_logits(ctx).shape[1] == 51864


def test_set_mel_roundtrip(ctx):
    state = whisper.whisper_init_state(ctx)
    pcm = (np.random.default_rng(4).standard_normal(16000) * 0.1
           ).astype(np.float32)
    whisper.whisper_pcm_to_mel_with_state(ctx, state, pcm, len(pcm))
    n_len = whisper.whisper_n_len_from_state(state)
    ref_layout = state.mel.ref_layout().reshape(-1)
    state2 = whisper.whisper_init_state(ctx)
    assert whisper.whisper_set_mel_with_state(
        ctx, state2, ref_layout, n_len, whisper.whisper_model_n_mels(ctx)) == 0
    np.testing.assert_allclose(np.asarray(state2.mel.data[:n_len]),
                               np.asarray(state.mel.data[:n_len]), atol=1e-6)
    # wrong n_mel rejected
    assert whisper.whisper_set_mel_with_state(ctx, state2, ref_layout,
                                              n_len, 3) == -1


def test_full_with_state_and_from_state_accessors(ctx):
    state = whisper.whisper_init_state(ctx)
    pcm = (np.random.default_rng(5).standard_normal(32000) * 0.1
           ).astype(np.float32)
    p = whisper.whisper_full_default_params()
    assert whisper.whisper_full_with_state(ctx, state, p, pcm, len(pcm)) == 0
    n = whisper.whisper_full_n_segments_from_state(state)
    assert n == whisper.whisper_full_n_segments_from_state(state)
    for i in range(n):
        t0 = whisper.whisper_full_get_segment_t0_from_state(state, i)
        t1 = whisper.whisper_full_get_segment_t1_from_state(state, i)
        assert t1 >= t0
        whisper.whisper_full_get_segment_text_from_state(state, i)
        for j in range(whisper.whisper_full_n_tokens_from_state(state, i)):
            whisper.whisper_full_get_token_id_from_state(state, i, j)
    whisper.whisper_free_state(state)
    assert whisper.whisper_full_n_segments_from_state(state) == 0


def test_init_from_buffer(ref_models):
    buf = (ref_models / "for-tests-ggml-tiny.en.bin").read_bytes()
    c = whisper.whisper_init_from_buffer_with_params(
        buf, whisper.WhisperContextParams(dtype=jnp.float32))
    assert whisper.whisper_n_vocab(c) == 51864
    c2 = whisper.whisper_init_from_file_with_params_no_state(
        str(ref_models / "for-tests-ggml-tiny.en.bin"))
    assert c2.state is None
    with pytest.raises(ValueError):
        whisper.whisper_pcm_to_mel(c2, np.zeros(160, np.float32))


def test_model_accessors(ctx):
    assert whisper.whisper_model_n_vocab(ctx) == 51864
    assert whisper.whisper_model_n_audio_state(ctx) == 384
    assert whisper.whisper_model_n_audio_layer(ctx) == 4
    assert whisper.whisper_model_n_text_layer(ctx) == 4
    assert whisper.whisper_model_n_mels(ctx) == 80
    assert whisper.whisper_model_type(ctx) == 1          # e_model tiny
    assert whisper.whisper_model_ftype(ctx) in (0, 1)
    assert whisper.whisper_version().startswith("1.8")
    t = whisper.whisper_get_timings(ctx)
    assert t.encode_ms >= 0.0


def test_openvino_stub_returns_failure(ctx):
    assert whisper.whisper_ctx_init_openvino_encoder(ctx) == 1


# -- VAD C surface ------------------------------------------------------------

@pytest.fixture(scope="module")
def vad_ctx(ref_models):
    path = ref_models / "for-tests-silero-v6.2.0-ggml.bin"
    if not path.exists():
        pytest.skip("silero fixture not available")
    return whisper.whisper_vad_init_from_file_with_params(
        str(path), whisper.whisper_vad_default_context_params())


def test_vad_surface(vad_ctx):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 0.02).astype(np.float32)
    assert whisper.whisper_vad_detect_speech(vad_ctx, pcm, len(pcm))
    n = whisper.whisper_vad_n_probs(vad_ctx)
    assert n == len(pcm) // 512 + (1 if len(pcm) % 512 else 0)
    probs = whisper.whisper_vad_probs(vad_ctx)
    assert probs.shape == (n,) and (0 <= probs).all() and (probs <= 1).all()
    segs = whisper.whisper_vad_segments_from_probs(
        vad_ctx, whisper.whisper_vad_default_params())
    for i in range(whisper.whisper_vad_segments_n_segments(segs)):
        assert (whisper.whisper_vad_segments_get_segment_t1(segs, i)
                >= whisper.whisper_vad_segments_get_segment_t0(segs, i))
    whisper.whisper_vad_free_segments(segs)


def test_vad_stateful_appends(vad_ctx):
    whisper.whisper_vad_reset_state(vad_ctx)
    pcm = (np.random.default_rng(1).standard_normal(5120) * 0.02
           ).astype(np.float32)
    whisper.whisper_vad_detect_speech_stateful(vad_ctx, pcm)
    n1 = whisper.whisper_vad_n_probs(vad_ctx)
    whisper.whisper_vad_detect_speech_stateful(vad_ctx, pcm)
    assert whisper.whisper_vad_n_probs(vad_ctx) == 2 * n1
    # stateless call replaces the buffer
    whisper.whisper_vad_detect_speech(vad_ctx, pcm)
    assert whisper.whisper_vad_n_probs(vad_ctx) == n1
    # from a buffer loader too
    segs = whisper.whisper_vad_segments_from_samples(
        vad_ctx, whisper.whisper_vad_default_params(), pcm)
    assert whisper.whisper_vad_segments_n_segments(segs) >= 0


def test_bench_strings():
    s = whisper.whisper_bench_memcpy_str()
    assert "GB/s" in s
    s2 = whisper.whisper_bench_ggml_mul_mat_str(sizes=(256,), reps=2)
    assert "GFLOPS" in s2
