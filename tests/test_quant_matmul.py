"""Fused dequant-matmul kernel: repack + numerics vs dense dequant."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.io import quant as Q
from open_whisper_kit_tpu.io.ggml_writer import _encode_tensor
from open_whisper_kit_tpu.ops import quant_matmul as QM


def _make_weight(out_f, in_f, qtype, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
    blob = _encode_tensor(w, qtype)
    return w, blob


@pytest.mark.parametrize("qtype", [Q.GGML_TYPE_Q8_0, Q.GGML_TYPE_Q5_0,
                                   Q.GGML_TYPE_Q4_0])
def test_repack_matches_dequantize(qtype):
    out_f, in_f = 48, 64
    w, blob = _make_weight(out_f, in_f, qtype)
    ql = QM.repack(blob, qtype, out_f, in_f)
    assert ql is not None
    assert ql.shape == (in_f, out_f)          # logical width
    assert ql.qs.shape[1] % 512 == 0           # planes pre-padded to _BN
    assert ql.scales.shape == (in_f // 32, ql.qs.shape[1])
    dense = np.asarray(QM.dequantize_dense(ql, jnp.float32))
    ref = Q.dequantize(blob, qtype, out_f * in_f).reshape(out_f, in_f).T
    np.testing.assert_allclose(dense, ref, atol=1e-6)


def test_affine_types_return_none():
    out_f, in_f = 32, 64
    _, blob = _make_weight(out_f, in_f, Q.GGML_TYPE_Q5_1)
    assert QM.repack(blob, Q.GGML_TYPE_Q5_1, out_f, in_f) is None


@pytest.mark.parametrize("m", [1, 5, 8, 17])
def test_qmatmul_matches_dense(m):
    out_f, in_f = 96, 64
    w, blob = _make_weight(out_f, in_f, Q.GGML_TYPE_Q8_0, seed=1)
    ql = QM.repack(blob, Q.GGML_TYPE_Q8_0, out_f, in_f)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, in_f)).astype(np.float32)
    got = np.asarray(QM.qmatmul(jnp.asarray(x, jnp.bfloat16), ql))

    dense = np.asarray(QM.dequantize_dense(ql, jnp.float32))
    want = x.astype(np.float32) @ dense
    # bf16 activations dominate the error budget
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_qmatmul_batched_leading_dims():
    out_f, in_f = 64, 64
    _, blob = _make_weight(out_f, in_f, Q.GGML_TYPE_Q5_0, seed=3)
    ql = QM.repack(blob, Q.GGML_TYPE_Q5_0, out_f, in_f)
    x = np.random.default_rng(4).standard_normal((2, 3, in_f)).astype(np.float32)
    y = QM.qmatmul(jnp.asarray(x), ql)
    assert y.shape == (2, 3, out_f)
    flat = QM.qmatmul(jnp.asarray(x.reshape(6, in_f)), ql)
    np.testing.assert_allclose(np.asarray(y).reshape(6, out_f),
                               np.asarray(flat), atol=1e-5)


def test_quantize_linear_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 100)).astype(np.float32) * 0.1
    ql = QM.quantize_linear(jnp.asarray(w))
    assert ql.shape == (64, 100) and ql.qs.shape[1] == 512
    dense = np.asarray(QM.dequantize_dense(ql, jnp.float32))
    assert dense.shape == (64, 100)
    np.testing.assert_allclose(dense, w, atol=np.abs(w).max() / 100)
    # matmul path agrees with dense within quant error
    x = rng.standard_normal((3, 64)).astype(np.float32)
    y = np.asarray(QM.qmatmul(jnp.asarray(x), ql))
    np.testing.assert_allclose(y, x @ w, rtol=0.05, atol=0.05)


def test_concat_quant_drops_padding():
    rng = np.random.default_rng(4)
    parts = [jnp.asarray(rng.standard_normal((64, n)).astype(np.float32))
             for n in (100, 30, 60)]
    qc = QM.concat_quant([QM.quantize_linear(p) for p in parts])
    assert qc.shape == (64, 190)
    dense = np.asarray(QM.dequantize_dense(qc, jnp.float32))
    ref = np.concatenate([np.asarray(QM.dequantize_dense(QM.quantize_linear(p),
                                                         jnp.float32))
                          for p in parts], axis=1)
    np.testing.assert_allclose(dense, ref, atol=1e-6)


def test_quantize_decoder_int8_logits_parity():
    from open_whisper_kit_tpu.models.whisper import model as M
    cfg = M.WhisperConfig(512, 16, 64, 2, 2, 16, 64, 2, 2, 80)
    params = M.init_params(cfg, seed=0, dtype=jnp.float32)
    dec = M.prepare_decoder(params["decoder"])
    dec8 = M.quantize_decoder_int8(dec, scope="logits")
    assert "te_logits" in dec8
    assert not any(isinstance(v, QM.QuantLinear)
                   for v in dec8["blocks"].values())
    dec8all = M.quantize_decoder_int8(dec, scope="all")
    assert isinstance(dec8all["blocks"]["qkv_w"], QM.QuantLinear)

    kv_k, kv_v = M.init_kv_cache(cfg, 1, jnp.float32)
    xk = jnp.zeros((2, 1, 2, 16, 32), jnp.float32)
    tok = jnp.array([[5, 9]], jnp.int32)
    ref, _, _, _ = M.decode_impl(cfg, dec, tok, kv_k, kv_v, 0, xk, xk)
    for d in (dec8, dec8all):
        got, _, _, _ = M.decode_impl(cfg, d, tok,
                                     jnp.zeros_like(kv_k), jnp.zeros_like(kv_v),
                                     0, xk, xk)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=scale * 0.05)


def test_quantize_linear4_roundtrip():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((64, 100)).astype(np.float32) * 0.1
    q4 = QM.quantize_linear4(jnp.asarray(w))
    assert q4.shape == (64, 100) and q4.qs.shape == (32, 512)
    dense = np.asarray(QM.dequantize_dense(q4, jnp.float32))
    assert dense.shape == (64, 100)
    np.testing.assert_allclose(dense, w, atol=np.abs(w).max() / 12)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    y = np.asarray(QM.qmatmul(jnp.asarray(x), q4))
    ref = x @ dense
    np.testing.assert_allclose(y, ref, rtol=0.02, atol=0.02)


def test_int4_logits_decode_parity():
    from open_whisper_kit_tpu.models.whisper import model as M
    cfg = M.WhisperConfig(512, 16, 64, 2, 2, 16, 64, 2, 2, 80)
    params = M.init_params(cfg, seed=0, dtype=jnp.float32)
    dec = M.prepare_decoder(params["decoder"])
    dec4 = M.quantize_decoder_int8(dec, logits_bits=4)
    assert isinstance(dec4["te_logits"], QM.QuantLinear4)
    kv_k, kv_v = M.init_kv_cache(cfg, 1, jnp.float32)
    xk = jnp.zeros((2, 1, 2, 16, 32), jnp.float32)
    tok = jnp.array([[5, 9]], jnp.int32)
    ref, _, _, _ = M.decode_impl(cfg, dec, tok, kv_k, kv_v, 0, xk, xk)
    got, _, _, _ = M.decode_impl(cfg, dec4, tok, jnp.zeros_like(kv_k),
                                 jnp.zeros_like(kv_v), 0, xk, xk)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=scale * 0.15)   # 4-bit quant noise


def test_fused_ffn_int8_matches_dense():
    rng = np.random.default_rng(6)
    K, FF = 64, 256
    w0 = rng.standard_normal((K, FF)).astype(np.float32) * 0.1
    b0 = rng.standard_normal(FF).astype(np.float32) * 0.05
    w1 = rng.standard_normal((FF, 50)).astype(np.float32) * 0.1
    q0 = QM.quantize_linear(jnp.asarray(w0), pad=False)
    q1 = QM.quantize_linear(jnp.asarray(w1))
    x = rng.standard_normal((3, K)).astype(np.float32)
    got = np.asarray(QM.fused_ffn_int8(jnp.asarray(x), q0,
                                       jnp.asarray(b0), q1))
    import jax
    h = np.asarray(jax.nn.gelu(jnp.asarray(x @ w0 + b0), approximate=True))
    ref = h @ w1
    assert got.shape == (3, 50)
    np.testing.assert_allclose(got, ref, rtol=0.05,
                               atol=0.05 * np.abs(ref).max())


def test_quantize_decoder_int8_mlp_scope_parity():
    from open_whisper_kit_tpu.models.whisper import model as M
    cfg = M.WhisperConfig(512, 16, 64, 2, 2, 16, 64, 2, 2, 80)
    params = M.init_params(cfg, seed=0, dtype=jnp.float32)
    dec = M.prepare_decoder(params["decoder"])
    dec_m = M.quantize_decoder_int8(dec, scope="mlp")
    assert isinstance(dec_m["blocks"]["mlp0_w"], QM.QuantLinear)
    assert (dec_m["blocks"]["mlp0_w"].qs.shape[-1]
            == dec_m["blocks"]["mlp0_w"].n_out)     # unpadded for fused FFN
    kv_k, kv_v = M.init_kv_cache(cfg, 1, jnp.float32)
    xk = jnp.zeros((2, 1, 2, 16, 32), jnp.float32)
    tok = jnp.array([[5, 9]], jnp.int32)
    ref, _, _, _ = M.decode_impl(cfg, dec, tok, kv_k, kv_v, 0, xk, xk)
    got, _, _, _ = M.decode_impl(cfg, dec_m, tok, jnp.zeros_like(kv_k),
                                 jnp.zeros_like(kv_v), 0, xk, xk)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=scale * 0.05)
