"""Block-quantized tensor decoding (ggml quant formats) in pure numpy.

The ggml family stores quantized tensors as contiguous arrays of fixed-size
blocks.  Layouts re-derived from the public format documentation mirrored in
the reference (ggml/src/ggml-common.h; type ids ggml/include/ggml.h:389-430).
Dequantization here is the *host-side* path used at checkpoint load time; the
fused dequant-matmul TPU path lives in `ops/quant_matmul.py` and consumes the
raw block bytes re-packed into TPU-friendly planes (see `unpack_planes`).

Supported: q4_0, q4_1, q5_0, q5_1, q8_0, q4_K, q5_K, q6_K (the formats used
by whisper.cpp `quantize` and streaming-sortformer GGUF files).
"""

from __future__ import annotations

import numpy as np

# ggml_type ids (ggml/include/ggml.h:389-430)
GGML_TYPE_F32 = 0
GGML_TYPE_F16 = 1
GGML_TYPE_Q4_0 = 2
GGML_TYPE_Q4_1 = 3
GGML_TYPE_Q5_0 = 6
GGML_TYPE_Q5_1 = 7
GGML_TYPE_Q8_0 = 8
GGML_TYPE_Q2_K = 10
GGML_TYPE_Q3_K = 11
GGML_TYPE_Q4_K = 12
GGML_TYPE_Q5_K = 13
GGML_TYPE_Q6_K = 14
GGML_TYPE_Q8_K = 15
GGML_TYPE_I8 = 24
GGML_TYPE_I16 = 25
GGML_TYPE_I32 = 26
GGML_TYPE_I64 = 27
GGML_TYPE_F64 = 28
GGML_TYPE_BF16 = 30

QK = 32       # simple-quant block size
QK_K = 256    # K-quant super-block size

TYPE_NAMES = {
    GGML_TYPE_F32: "f32", GGML_TYPE_F16: "f16", GGML_TYPE_BF16: "bf16",
    GGML_TYPE_Q4_0: "q4_0", GGML_TYPE_Q4_1: "q4_1", GGML_TYPE_Q5_0: "q5_0",
    GGML_TYPE_Q5_1: "q5_1", GGML_TYPE_Q8_0: "q8_0",
    GGML_TYPE_Q2_K: "q2_K", GGML_TYPE_Q3_K: "q3_K", GGML_TYPE_Q4_K: "q4_K",
    GGML_TYPE_Q5_K: "q5_K", GGML_TYPE_Q6_K: "q6_K", GGML_TYPE_Q8_K: "q8_K",
    GGML_TYPE_I8: "i8", GGML_TYPE_I16: "i16", GGML_TYPE_I32: "i32",
    GGML_TYPE_I64: "i64", GGML_TYPE_F64: "f64",
}

# (block_size_elems, block_size_bytes)
_BLOCK_INFO = {
    GGML_TYPE_F32: (1, 4),
    GGML_TYPE_F16: (1, 2),
    GGML_TYPE_BF16: (1, 2),
    GGML_TYPE_F64: (1, 8),
    GGML_TYPE_I8: (1, 1),
    GGML_TYPE_I16: (1, 2),
    GGML_TYPE_I32: (1, 4),
    GGML_TYPE_I64: (1, 8),
    GGML_TYPE_Q4_0: (QK, 2 + QK // 2),            # fp16 d + 16B nibbles
    GGML_TYPE_Q4_1: (QK, 4 + QK // 2),            # fp16 d,m + 16B nibbles
    GGML_TYPE_Q5_0: (QK, 2 + 4 + QK // 2),        # fp16 d + u32 qh + 16B ql
    GGML_TYPE_Q5_1: (QK, 4 + 4 + QK // 2),        # fp16 d,m + u32 qh + 16B ql
    GGML_TYPE_Q8_0: (QK, 2 + QK),                 # fp16 d + 32 int8
    GGML_TYPE_Q2_K: (QK_K, QK_K // 16 + QK_K // 4 + 4),
    GGML_TYPE_Q3_K: (QK_K, QK_K // 8 + QK_K // 4 + 12 + 2),
    GGML_TYPE_Q4_K: (QK_K, 4 + 12 + QK_K // 2),
    GGML_TYPE_Q5_K: (QK_K, 4 + 12 + QK_K // 8 + QK_K // 2),
    GGML_TYPE_Q6_K: (QK_K, QK_K // 2 + QK_K // 4 + QK_K // 16 + 2),
    GGML_TYPE_Q8_K: (QK_K, 4 + QK_K + QK_K // 16 * 2),
}

QUANTIZED_TYPES = frozenset(
    t for t, (bs, _) in _BLOCK_INFO.items() if bs > 1
)


def type_name(t: int) -> str:
    return TYPE_NAMES.get(t, f"type{t}")


def block_info(t: int) -> tuple[int, int]:
    return _BLOCK_INFO[t]


def nbytes_for(t: int, n_elems: int) -> int:
    bs, bb = _BLOCK_INFO[t]
    assert n_elems % bs == 0, (type_name(t), n_elems, bs)
    return n_elems // bs * bb


def _f16(u16: np.ndarray) -> np.ndarray:
    return u16.view(np.float16).astype(np.float32)


def dequantize(raw: bytes | np.ndarray, ggml_type: int, n_elems: int) -> np.ndarray:
    """Decode `n_elems` values of `ggml_type` from raw bytes → float32 1-D array."""
    buf = np.frombuffer(raw, dtype=np.uint8, count=nbytes_for(ggml_type, n_elems))
    t = ggml_type
    if t == GGML_TYPE_F32:
        return buf.view(np.float32).copy()
    if t == GGML_TYPE_F16:
        return buf.view(np.float16).astype(np.float32)
    if t == GGML_TYPE_BF16:
        return (buf.view(np.uint16).astype(np.uint32) << 16).view(np.float32).copy()
    if t == GGML_TYPE_F64:
        return buf.view(np.float64).astype(np.float32)
    if t in (GGML_TYPE_I8, GGML_TYPE_I16, GGML_TYPE_I32, GGML_TYPE_I64):
        dt = {GGML_TYPE_I8: np.int8, GGML_TYPE_I16: np.int16,
              GGML_TYPE_I32: np.int32, GGML_TYPE_I64: np.int64}[t]
        return buf.view(dt).astype(np.float32)

    bs, bb = _BLOCK_INFO[t]
    nb = n_elems // bs
    blocks = buf.reshape(nb, bb)

    if t == GGML_TYPE_Q4_0:
        d = _f16(blocks[:, :2].copy().view(np.uint16))            # (nb,1)
        q = blocks[:, 2:]
        lo = (q & 0x0F).astype(np.int8) - 8
        hi = (q >> 4).astype(np.int8) - 8
        vals = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (nb,32)
        return (vals * d).reshape(-1)

    if t == GGML_TYPE_Q4_1:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16))
        m = _f16(blocks[:, 2:4].copy().view(np.uint16))
        q = blocks[:, 4:]
        lo = (q & 0x0F).astype(np.float32)
        hi = (q >> 4).astype(np.float32)
        vals = np.concatenate([lo, hi], axis=1)
        return (vals * d + m).reshape(-1)

    if t == GGML_TYPE_Q5_0:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16))
        qh = blocks[:, 2:6].copy().view(np.uint32)                # (nb,1)
        ql = blocks[:, 6:]
        sh = np.arange(32, dtype=np.uint32)
        hbits = ((qh >> sh) & 1).astype(np.uint8)                 # (nb,32)
        lo = (ql & 0x0F)
        hi = (ql >> 4)
        q4 = np.concatenate([lo, hi], axis=1)                     # (nb,32)
        vals = (q4 | (hbits << 4)).astype(np.int16) - 16
        return (vals.astype(np.float32) * d).reshape(-1)

    if t == GGML_TYPE_Q5_1:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16))
        m = _f16(blocks[:, 2:4].copy().view(np.uint16))
        qh = blocks[:, 4:8].copy().view(np.uint32)
        ql = blocks[:, 8:]
        sh = np.arange(32, dtype=np.uint32)
        hbits = ((qh >> sh) & 1).astype(np.uint8)
        q4 = np.concatenate([ql & 0x0F, ql >> 4], axis=1)
        vals = (q4 | (hbits << 4)).astype(np.float32)
        return (vals * d + m).reshape(-1)

    if t == GGML_TYPE_Q8_0:
        d = _f16(blocks[:, 0:2].copy().view(np.uint16))
        q = blocks[:, 2:].copy().view(np.int8).astype(np.float32)
        return (q * d).reshape(-1)

    if t == GGML_TYPE_Q4_K:
        return _dequant_q4_k(blocks)
    if t == GGML_TYPE_Q5_K:
        return _dequant_q5_k(blocks)
    if t == GGML_TYPE_Q6_K:
        return _dequant_q6_k(blocks)

    raise NotImplementedError(f"dequantize: unsupported ggml type {type_name(t)}")


def _kquant_scales_mins(sc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode the 12-byte packed 6-bit scales/mins of q4_K/q5_K → (nb,8),(nb,8)."""
    sc = sc.astype(np.uint8)
    scales = np.empty(sc.shape[:1] + (8,), np.uint8)
    mins = np.empty_like(scales)
    for j in range(8):
        if j < 4:
            scales[:, j] = sc[:, j] & 63
            mins[:, j] = sc[:, j + 4] & 63
        else:
            scales[:, j] = (sc[:, j + 4] & 0x0F) | ((sc[:, j - 4] >> 6) << 4)
            mins[:, j] = (sc[:, j + 4] >> 4) | ((sc[:, j] >> 6) << 4)
    return scales, mins


def _dequant_q4_k(blocks: np.ndarray) -> np.ndarray:
    nb = blocks.shape[0]
    d = _f16(blocks[:, 0:2].copy().view(np.uint16))       # super-block scale
    dmin = _f16(blocks[:, 2:4].copy().view(np.uint16))
    scales, mins = _kquant_scales_mins(blocks[:, 4:16])
    qs = blocks[:, 16:]                                   # 128 bytes
    out = np.empty((nb, QK_K), np.float32)
    # 4 chunks of 32B nibbles; each chunk yields 2 groups of 32 (low then high)
    for chunk in range(4):
        q = qs[:, chunk * 32:(chunk + 1) * 32]
        for half, qv in ((0, q & 0x0F), (1, q >> 4)):
            g = chunk * 2 + half
            dl = d[:, 0] * scales[:, g].astype(np.float32)
            ml = dmin[:, 0] * mins[:, g].astype(np.float32)
            out[:, g * 32:(g + 1) * 32] = qv.astype(np.float32) * dl[:, None] - ml[:, None]
    return out.reshape(-1)


def _dequant_q5_k(blocks: np.ndarray) -> np.ndarray:
    nb = blocks.shape[0]
    d = _f16(blocks[:, 0:2].copy().view(np.uint16))
    dmin = _f16(blocks[:, 2:4].copy().view(np.uint16))
    scales, mins = _kquant_scales_mins(blocks[:, 4:16])
    qh = blocks[:, 16:48]                                 # 32 bytes of high bits
    qs = blocks[:, 48:]                                   # 128 bytes nibbles
    out = np.empty((nb, QK_K), np.float32)
    u = np.uint8(1)
    for chunk in range(4):
        q = qs[:, chunk * 32:(chunk + 1) * 32]
        for half, qv in ((0, q & 0x0F), (1, q >> 4)):
            g = chunk * 2 + half
            hbit = ((qh >> np.uint8(g)) & u).astype(np.uint8)
            qfull = qv.astype(np.float32) + hbit.astype(np.float32) * 16.0
            dl = d[:, 0] * scales[:, g].astype(np.float32)
            ml = dmin[:, 0] * mins[:, g].astype(np.float32)
            out[:, g * 32:(g + 1) * 32] = qfull * dl[:, None] - ml[:, None]
    return out.reshape(-1)


def _dequant_q6_k(blocks: np.ndarray) -> np.ndarray:
    nb = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    sc = blocks[:, 192:208].copy().view(np.int8)          # 16 int8 scales
    d = _f16(blocks[:, 208:210].copy().view(np.uint16))   # (nb,1)
    out = np.empty((nb, QK_K), np.float32)
    for half in range(2):  # two 128-element halves
        ql_h = ql[:, half * 64:half * 64 + 64]
        qh_h = qh[:, half * 32:half * 32 + 32]
        base = half * 128
        q1 = ((ql_h[:, :32] & 0x0F) | ((qh_h & 0x03) << 4)).astype(np.int16) - 32
        q2 = ((ql_h[:, 32:] & 0x0F) | (((qh_h >> 2) & 0x03) << 4)).astype(np.int16) - 32
        q3 = ((ql_h[:, :32] >> 4) | (((qh_h >> 4) & 0x03) << 4)).astype(np.int16) - 32
        q4 = ((ql_h[:, 32:] >> 4) | (((qh_h >> 6) & 0x03) << 4)).astype(np.int16) - 32
        for i, q in enumerate((q1, q2, q3, q4)):
            # scale index: group of 16 within the 256-block
            g0 = base + i * 32
            s_idx = (g0 // 16) + (np.arange(32) // 16)
            s = sc[np.arange(nb)[:, None], s_idx[None, :]].astype(np.float32)
            out[:, g0:g0 + 32] = d * s * q.astype(np.float32)
    return out.reshape(-1)


def quantize_q8_0(x: np.ndarray) -> bytes:
    """Encode float array (size % 32 == 0) as q8_0 blocks (for tests/tools)."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.round(x * inv[:, None]).astype(np.int8)
    out = bytearray()
    d16 = d.astype(np.float16)
    for i in range(x.shape[0]):
        out += d16[i].tobytes() + q[i].tobytes()
    return bytes(out)


def quantize_q5_0(x: np.ndarray) -> bytes:
    """Encode float array as q5_0 blocks (round-trip testing of the decoder)."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK)
    amax_i = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), amax_i]
    d = (maxv / -16.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(x * inv[:, None]) + 16, 0, 31).astype(np.uint8)
    out = bytearray()
    for i in range(x.shape[0]):
        d16 = np.float16(d[i]).tobytes()
        lo = (q[i, :16] & 0x0F) | ((q[i, 16:] & 0x0F) << 4)
        qh = np.uint32(0)
        for j in range(16):
            qh |= np.uint32(q[i, j] >> 4) << np.uint32(j)
            qh |= np.uint32(q[i, j + 16] >> 4) << np.uint32(j + 16)
        out += d16 + qh.tobytes() + lo.tobytes()
    return bytes(out)
