"""HF-transformers converter + independent model oracle.

Builds a tiny *random* transformers WhisperForConditionalGeneration, converts
it with tools/convert_hf_to_ggml.py, loads it through our ggml reader, and
checks our encoder/decoder forward against the HF implementation — a fully
independent reference implementation of the architecture.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import convert_hf_to_ggml as C  # noqa: E402

from open_whisper_kit_tpu.io import ggml_whisper  # noqa: E402
from open_whisper_kit_tpu.models.whisper import model as M  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    cfg = WhisperConfig(
        vocab_size=51864, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=64, max_target_positions=32,
        activation_function="gelu_new",  # tanh-approx, like ggml
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("hf") / "hf-tiny.bin"
    C.convert(hf_model, None, str(path), use_f16=False)
    return path


def test_name_mapping():
    assert C.map_hf_name("model.encoder.conv1.weight") == "encoder.conv1.weight"
    assert (C.map_hf_name("model.encoder.layers.3.self_attn.q_proj.weight")
            == "encoder.blocks.3.attn.query.weight")
    assert (C.map_hf_name("model.decoder.layers.0.encoder_attn.out_proj.bias")
            == "decoder.blocks.0.cross_attn.out.bias")
    assert (C.map_hf_name("model.decoder.layers.1.fc1.weight")
            == "decoder.blocks.1.mlp.0.weight")
    assert C.map_hf_name("proj_out.weight") is None


def test_checkpoint_header(converted):
    ck = ggml_whisper.load_checkpoint(converted)
    assert ck.hparams.n_audio_state == 64
    assert ck.hparams.n_audio_layer == 2
    assert ck.hparams.n_mels == 80
    # no key bias in the format: HF has one but the reference format drops it
    assert "encoder.blocks.0.attn.key.weight" in ck.tensors
    assert ck.n_loaded > 40


def test_encoder_matches_hf(hf_model, converted):
    ck = ggml_whisper.load_checkpoint(converted)
    cfg = M.WhisperConfig.from_hparams(ck.hparams)
    params = M.params_from_checkpoint(ck, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32)

    ours = np.asarray(M.encode(cfg, params["encoder"], jnp.asarray(mel)))
    with torch.no_grad():
        hf = hf_model.model.encoder(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    assert ours.shape == hf.shape
    np.testing.assert_allclose(ours, hf, atol=5e-4)


def test_decoder_logits_match_hf(hf_model, converted):
    ck = ggml_whisper.load_checkpoint(converted)
    cfg = M.WhisperConfig.from_hparams(ck.hparams)
    params = M.params_from_checkpoint(ck, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32)
    tokens = rng.integers(0, cfg.n_vocab, size=(1, 5)).astype(np.int32)

    enc = M.encode(cfg, params["encoder"], jnp.asarray(mel))
    xk, xv = M.cross_kv(cfg, params["decoder"], enc)
    kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.float32)
    logits, _, _, _ = M.decode(cfg, params["decoder"], jnp.asarray(tokens),
                               kv_k, kv_v, jnp.int32(0), xk, xv)
    ours = np.asarray(logits)[0]

    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()[0]

    # HF has a k_proj bias (zero-init in fresh models is NOT guaranteed;
    # whisper the architecture uses none and HF zeroes it) — tolerance covers
    # accumulation differences only if that bias is zero
    kb = hf_model.model.decoder.layers[0].self_attn.k_proj.bias
    if kb is not None and float(kb.abs().max()) > 1e-6:
        pytest.skip("HF model has a non-zero key bias; format drops it")
    np.testing.assert_allclose(ours, out, atol=2e-3)


def test_vocab_byte_decoder():
    class FakeTok:
        def get_vocab(self):
            return {"Ġhello": 1, "a": 0, "<|endoftext|>": 2}

    toks = C.hf_vocab_bytes(FakeTok(), 10)
    assert toks[0] == b"a"
    assert toks[1] == b" hello"   # Ġ -> space
