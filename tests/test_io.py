"""Tests for the ggml-bin / GGUF readers and block dequantization."""

import numpy as np
import pytest

from open_whisper_kit_tpu.io import ggml_silero, ggml_whisper, quant


class TestQuantRoundTrip:
    def test_q8_0(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(32 * 17).astype(np.float32)
        blob = quant.quantize_q8_0(x)
        y = quant.dequantize(blob, quant.GGML_TYPE_Q8_0, x.size)
        assert np.abs(x - y).max() < 0.05

    def test_q5_0(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(32 * 9).astype(np.float32)
        blob = quant.quantize_q5_0(x)
        y = quant.dequantize(blob, quant.GGML_TYPE_Q5_0, x.size)
        assert np.abs(x - y).max() < 0.3

    def test_f16(self):
        x = np.arange(-8, 8, 0.5, dtype=np.float16)
        y = quant.dequantize(x.tobytes(), quant.GGML_TYPE_F16, x.size)
        np.testing.assert_allclose(y, x.astype(np.float32))

    def test_bf16(self):
        x = np.array([1.0, -2.5, 0.125, 3.0], np.float32)
        bf = (x.view(np.uint32) >> 16).astype(np.uint16)
        y = quant.dequantize(bf.tobytes(), quant.GGML_TYPE_BF16, x.size)
        np.testing.assert_allclose(y, x)

    def test_block_sizes(self):
        # byte sizes must match the ggml block layouts
        assert quant.nbytes_for(quant.GGML_TYPE_Q4_0, 32) == 18
        assert quant.nbytes_for(quant.GGML_TYPE_Q5_0, 32) == 22
        assert quant.nbytes_for(quant.GGML_TYPE_Q8_0, 32) == 34
        assert quant.nbytes_for(quant.GGML_TYPE_Q4_K, 256) == 144
        assert quant.nbytes_for(quant.GGML_TYPE_Q5_K, 256) == 176
        assert quant.nbytes_for(quant.GGML_TYPE_Q6_K, 256) == 210


class TestWhisperCheckpoint:
    @pytest.mark.parametrize("name,exp_type,exp_vocab", [
        ("for-tests-ggml-tiny.en.bin", "tiny", 51864),
        ("for-tests-ggml-tiny.bin", "tiny", 51865),
        ("for-tests-ggml-base.bin", "base", 51865),
        ("for-tests-ggml-large.bin", "large", 51865),
    ])
    def test_stub_headers(self, ref_models, name, exp_type, exp_vocab):
        ck = ggml_whisper.load_checkpoint(ref_models / name)
        assert ck.hparams.model_type.startswith(exp_type)
        assert ck.hparams.n_vocab == exp_vocab
        assert ck.mel_filters.shape == (ck.hparams.n_mels, 201)
        assert len(ck.tokens) > 50000
        # stub models carry no weights (the reference fake-model trick,
        # src/whisper.cpp:7426-7431)
        assert ck.n_loaded == 0

    def test_multilingual_flags(self, ref_models):
        en = ggml_whisper.load_checkpoint(ref_models / "for-tests-ggml-tiny.en.bin")
        ml = ggml_whisper.load_checkpoint(ref_models / "for-tests-ggml-tiny.bin")
        assert not en.hparams.is_multilingual
        assert ml.hparams.is_multilingual
        assert ml.hparams.num_languages == 99

    def test_filters_are_mel_like(self, ref_models):
        ck = ggml_whisper.load_checkpoint(ref_models / "for-tests-ggml-tiny.en.bin")
        f = ck.mel_filters
        assert (f >= 0).all()
        assert f.max() < 1.0
        # every mel bin integrates to something positive
        assert (f.sum(axis=1) > 0).all()


class TestSileroCheckpoint:
    def test_real_fixture(self, ref_models):
        ck = ggml_silero.load_silero(ref_models / "for-tests-silero-v6.2.0-ggml.bin")
        hp = ck.hparams
        assert hp.model_type == "silero-16k"
        assert hp.window_size == 512 and hp.context_size == 64
        assert hp.encoder_dims == ((129, 128, 3), (128, 64, 3), (64, 64, 3), (64, 128, 3))
        w = ck.to_float("_model.encoder.0.reparam_conv.weight")
        assert w.shape == (128, 129, 3)
        assert np.isfinite(w).all() and np.abs(w).max() > 0
        stft = ck.to_float("_model.stft.forward_basis_buffer")
        assert stft.shape == (258, 1, 256)
        lstm = ck.to_float("_model.decoder.rnn.weight_ih")
        assert lstm.shape == (512, 128)
