"""Checkpoint write/read/quantize round-trip: the BASELINE config #3 path
(quantized ggml-bin inference)."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.decode import full as F
from open_whisper_kit_tpu.decode.params import FullParams
from open_whisper_kit_tpu.io import ggml_whisper, quant
from open_whisper_kit_tpu.io.ggml_writer import requantize, write_checkpoint
from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.models.whisper.export import tensors_from_params

CFG = M.WhisperConfig(
    n_vocab=51864, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
    n_text_layer=2, n_mels=80)

HP = ggml_whisper.WhisperHParams(
    n_vocab=51864, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
    n_text_layer=2, n_mels=80, ftype=1, qntvr=0)


@pytest.fixture(scope="module")
def ckpt_f16(tmp_path_factory, ref_models):
    """Tiny random model written as a real f16 ggml-bin with the real vocab."""
    real = ggml_whisper.load_checkpoint(
        ref_models / "for-tests-ggml-tiny.en.bin", load_tensors=False)
    params = M.init_params(CFG, seed=0, dtype=jnp.float32)
    tensors = tensors_from_params(CFG, params)
    path = tmp_path_factory.mktemp("ck") / "tiny-rand-f16.bin"
    write_checkpoint(path, HP, real.mel_filters, real.tokens, tensors,
                     wtype=quant.GGML_TYPE_F16)
    return path


def _transcribe(path, audio):
    ctx = F.WhisperContext.from_file(str(path), dtype=jnp.float32)
    assert ctx.n_loaded > 0
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    return ctx, F.whisper_full(ctx, p, audio)


def test_roundtrip_f16(ckpt_f16):
    ck = ggml_whisper.load_checkpoint(ckpt_f16)
    assert ck.hparams.n_audio_state == 64
    assert ck.n_loaded > 40
    w = ck.to_float("encoder.blocks.0.attn.query.weight")
    assert w.shape == (64, 64)
    # loads into a working model
    params = M.params_from_checkpoint(ck, dtype=jnp.float32)
    assert params["decoder"]["te"].shape == (51864, 64)


@pytest.mark.parametrize("qtype", ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"])
def test_quantized_checkpoint_loads(ckpt_f16, tmp_path, qtype):
    qpath = tmp_path / f"tiny-rand-{qtype}.bin"
    requantize(ckpt_f16, qpath, qtype)
    assert qpath.stat().st_size < ckpt_f16.stat().st_size
    ck = ggml_whisper.load_checkpoint(qpath)
    assert ck.hparams.ftype == {"q4_0": 2, "q4_1": 3, "q5_0": 8,
                                "q5_1": 9, "q8_0": 7}[qtype]
    # dequantized weights close to the f16 originals
    ref = ggml_whisper.load_checkpoint(ckpt_f16)
    name = "decoder.blocks.0.mlp.0.weight"
    w_ref = ref.to_float(name)
    w_q = ck.to_float(name)
    err = np.abs(w_ref - w_q).max() / (np.abs(w_ref).max() + 1e-9)
    assert err < {"q4_0": 0.2, "q4_1": 0.12, "q5_0": 0.1,
                  "q5_1": 0.06, "q8_0": 0.02}[qtype]


def test_q8_transcription_matches_f16(ckpt_f16, tmp_path):
    """Full pipeline on a quantized checkpoint produces near-identical
    token sequences to the f16 one."""
    qpath = tmp_path / "tiny-rand-q8.bin"
    requantize(ckpt_f16, qpath, "q8_0")
    audio = (np.random.default_rng(0).standard_normal(16000)
             .astype(np.float32) * 0.1)
    _, res16 = _transcribe(ckpt_f16, audio)
    _, resq8 = _transcribe(qpath, audio)
    # with a 2-layer random model + q8 noise the decoded ids may differ in
    # the tail; pipelines must at least both run and start identically
    t16 = [t.id for s in res16.segments for t in s.tokens]
    tq8 = [t.id for s in resq8.segments for t in s.tokens]
    if t16 and tq8:
        n = min(3, len(t16), len(tq8))
        assert t16[:n] == tq8[:n]


def test_quantize_cli(ckpt_f16, tmp_path, capsys):
    from open_whisper_kit_tpu.cli.quantize import main
    out = tmp_path / "out.bin"
    assert main([str(ckpt_f16), str(out), "q5_0"]) == 0
    assert out.exists()
    assert main([str(ckpt_f16), str(out), "zzz"]) == 1


CFG256 = M.WhisperConfig(
    n_vocab=1024, n_audio_ctx=64, n_audio_state=256, n_audio_head=4,
    n_audio_layer=1, n_text_ctx=32, n_text_state=256, n_text_head=4,
    n_text_layer=1, n_mels=80)


@pytest.fixture(scope="module")
def ckpt_f16_256(tmp_path_factory, ref_models):
    """256-state random model: rows divisible by QK_K so the K-quants
    actually engage (the writer falls back to f16 per-row otherwise,
    matching the reference runtime's ne[0] %% 256 layout requirement)."""
    real = ggml_whisper.load_checkpoint(
        ref_models / "for-tests-ggml-tiny.en.bin", load_tensors=False)
    hp = ggml_whisper.WhisperHParams(
        n_vocab=1024, n_audio_ctx=64, n_audio_state=256, n_audio_head=4,
        n_audio_layer=1, n_text_ctx=32, n_text_state=256, n_text_head=4,
        n_text_layer=1, n_mels=80, ftype=1, qntvr=0)
    params = M.init_params(CFG256, seed=0, dtype=jnp.float32)
    tensors = tensors_from_params(CFG256, params)
    path = tmp_path_factory.mktemp("ck256") / "rand256-f16.bin"
    write_checkpoint(path, hp, real.mel_filters, real.tokens[:1024], tensors,
                     wtype=quant.GGML_TYPE_F16)
    return path


@pytest.mark.parametrize("qtype", ["q2_k", "q3_k", "q4_k", "q5_k", "q6_k"])
def test_kquant_checkpoint_loads(ckpt_f16_256, tmp_path, qtype):
    ckpt_f16 = ckpt_f16_256
    qpath = tmp_path / f"rand256-{qtype}.bin"
    requantize(ckpt_f16, qpath, qtype)
    assert qpath.stat().st_size < ckpt_f16.stat().st_size
    ck = ggml_whisper.load_checkpoint(qpath)
    assert ck.hparams.ftype == {"q2_k": 10, "q3_k": 11, "q4_k": 12,
                                "q5_k": 13, "q6_k": 14}[qtype]
    # the K-quant must actually engage on the 256-row weights
    name = "decoder.blocks.0.mlp.0.weight"
    assert quant.type_name(ck.tensors[name].ggml_type) == qtype.replace("k", "K")
    ref = ggml_whisper.load_checkpoint(ckpt_f16)
    name = "decoder.blocks.0.mlp.0.weight"
    w_ref, w_q = ref.to_float(name), ck.to_float(name)
    err = np.abs(w_ref - w_q).max() / (np.abs(w_ref).max() + 1e-9)
    assert err < {"q2_k": 0.6, "q3_k": 0.3, "q4_k": 0.15, "q5_k": 0.08,
                  "q6_k": 0.04}[qtype]
    # loads into a working model
    params = M.params_from_checkpoint(ck, dtype=jnp.float32)
    assert np.isfinite(np.asarray(params["decoder"]["te"], np.float32)).all()


@pytest.mark.parametrize("enc,t,thr", [
    (quant.quantize_q2_K, quant.GGML_TYPE_Q2_K, 0.45),
    (quant.quantize_q3_K, quant.GGML_TYPE_Q3_K, 0.25),
    (quant.quantize_q4_K, quant.GGML_TYPE_Q4_K, 0.11),
    (quant.quantize_q5_K, quant.GGML_TYPE_Q5_K, 0.06),
    (quant.quantize_q6_K, quant.GGML_TYPE_Q6_K, 0.03),
])
def test_kquant_encoder_roundtrip(enc, t, thr):
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(256 * 16) * (0.2 + rng.random(256 * 16))
         ).astype(np.float32)
    blob = enc(x)
    assert len(blob) == quant.nbytes_for(t, x.size)
    y = quant.dequantize(blob, t, x.size)
    rel = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x ** 2))
    assert rel < thr
    # degenerate inputs stay finite and zero blocks stay zero
    z = quant.dequantize(enc(np.zeros(256, np.float32)), t, 256)
    assert np.all(z == 0)
    c = quant.dequantize(enc(np.full(256, -2.5, np.float32)), t, 256)
    assert np.isfinite(c).all() and abs(float(c.mean()) + 2.5) < 0.1
