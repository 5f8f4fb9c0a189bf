"""W8A8 int8 encoder: kernel exactness + end-to-end numerics envelope.

The encoder analog of the decoder's quantized-path tests
(test_quant_matmul.py): the reference itself benches quantized encoders
(scripts/bench-all-gg.txt:137 q5_0 rows), so int8 encode must stay within
a q8_0-class error envelope of the bf16 encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.ops import encoder_int8 as E8


def test_w8a8_mm_matches_reference_formula():
    rng = np.random.default_rng(0)
    M_, K, N = 24, 64, 96
    x = jnp.asarray(rng.standard_normal((M_, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    wq, ws = E8.quantize_w_cols(w)
    out = E8.w8a8_matmul(x, wq, ws, interpret=True)

    xq, xs = E8.quantize_act_rows(x)
    ref = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
           ).astype(np.float32) * np.asarray(xs) * np.asarray(ws)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=1e-2, atol=1e-2)  # bf16 output rounding


def test_w8a8_mm_quantization_error_envelope():
    rng = np.random.default_rng(1)
    M_, K, N = 40, 256, 128
    x = jnp.asarray(rng.standard_normal((M_, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * K ** -0.5, jnp.float32)
    wq, ws = E8.quantize_w_cols(w)
    out = np.asarray(E8.w8a8_matmul(x, wq, ws, interpret=True), np.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel   # both tensors int8: ~sqrt(2)*0.4% typical


def test_w8a8_mm_wide_k_bf16_stream_matches_formula():
    """K > 2048 streams activation blocks as bf16 (VMEM cap at batch 16);
    host quantize_act_rows(pre_bf16=True) mirrors it bit-for-bit."""
    rng = np.random.default_rng(7)
    M_, K, N = 16, 2176, 64
    x = jnp.asarray(rng.standard_normal((M_, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)) * K ** -0.5, jnp.float32)
    wq, ws = E8.quantize_w_cols(w)
    out = E8.w8a8_matmul(x, wq, ws, interpret=True)

    xq, xs = E8.quantize_act_rows(x, pre_bf16=True)
    ref = (np.asarray(xq, np.int32) @ np.asarray(wq, np.int32)
           ).astype(np.float32) * np.asarray(xs) * np.asarray(ws)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=1e-2, atol=1e-2)


def test_w8a8_mm_padding_paths():
    # M not a multiple of 8, N not a multiple of the tile
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((13, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 72)), jnp.float32)
    wq, ws = E8.quantize_w_cols(w)
    out = E8.w8a8_matmul(x, wq, ws, interpret=True)
    assert out.shape == (13, 72)
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.linalg.norm(np.asarray(out, np.float32) - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


@pytest.mark.parametrize("preset", ["tiny"])
def test_encode_int8_matches_bf16_envelope(preset):
    cfg = M.PRESETS[preset]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))

    ref = np.asarray(M.encode(cfg, params["encoder"], mel), np.float32)
    enc8 = E8.prepare_encoder_int8(cfg, params["encoder"])
    out = np.asarray(E8.encode_int8(cfg, enc8, mel, interpret=True),
                     np.float32)

    assert out.shape == ref.shape
    # per-position cosine similarity: the decoder consumes directions
    num = (out * ref).sum(-1)
    den = np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    cos = num / np.maximum(den, 1e-9)
    assert cos.min() > 0.98, cos.min()
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.1, rel


def test_whisper_full_with_int8_encoder_runs():
    """Wiring check: encoder_int8 context through the whole pipeline
    (M.encode dispatches on the plane pytree inside the fused loop)."""
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams

    ctx = F.WhisperContext.from_preset("tiny", dtype=jnp.float32,
                                       encoder_int8=True)
    assert "qkv_q" in ctx.params["encoder"]["blocks"]
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    audio = np.random.default_rng(0).standard_normal(
        16000 * 2).astype(np.float32) * 0.1
    res = F.whisper_full(ctx, p, audio)
    assert isinstance(res.segments, list)  # mechanics: no crash, structured


def test_encoder_int8_greedy_tokens_match_bf16():
    """Same greedy token trajectory through a short decode: the encoder
    quantization error must not flip the decoder's argmax on a clearly
    peaked input (random-weight logits are near-tie, so compare the
    encoder OUTPUTS' top-activation agreement instead of tokens)."""
    cfg = M.PRESETS["tiny"]
    params = M.init_params(cfg, seed=3, dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    ref = np.asarray(M.encode(cfg, params["encoder"], mel), np.float32)
    from open_whisper_kit_tpu.ops.encoder_int8 import prepare_encoder_int8
    enc8 = prepare_encoder_int8(cfg, params["encoder"])
    out = np.asarray(M.encode(cfg, enc8, mel), np.float32)  # dispatch path
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_conv1d_mm_matches_lax_conv():
    """The im2col conv front-end == lax.conv_general_dilated (NWC/WIO,
    pad 1, kernel 3) at both encoder strides."""
    rng = np.random.default_rng(0)
    for stride, T, Ci, Co in ((1, 64, 12, 16), (2, 64, 12, 16),
                              (1, 17, 5, 7), (2, 17, 5, 7)):
        x = jnp.asarray(rng.standard_normal((2, T, Ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, Ci, Co)) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (stride,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        got = M.conv1d_mm(x, w, stride)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_prepare_encoder_int8_keeps_front_end_dense():
    cfg = M.PRESETS["tiny"]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    enc8 = E8.prepare_encoder_int8(cfg, params["encoder"])
    assert enc8["conv1_w"].dtype == jnp.bfloat16
    assert enc8["blocks"]["qkv_q"].dtype == jnp.int8
    assert enc8["blocks"]["qkv_q"].shape == (
        cfg.n_audio_layer, cfg.n_audio_state, 3 * cfg.n_audio_state)
    assert enc8["blocks"]["mlp0_s"].dtype == jnp.float32
