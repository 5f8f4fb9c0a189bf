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
    assert ql.qs.shape == (in_f, out_f)
    assert ql.scales.shape == (in_f // 32, out_f)
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
