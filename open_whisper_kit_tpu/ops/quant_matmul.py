"""Fused dequantize-matmul for block-quantized weights (Pallas).

The reference reaches quantized speed through per-arch CPU/GPU dequant
kernels (ggml-cuda/convert.cu etc.). Here symmetric ggml formats
(q4_0/q5_0/q8_0) are repacked at load into TPU-friendly planes —
an int8 value plane (K, N) plus per-32-block scales (K/32, N) — and a
Pallas kernel dequantizes tiles in VMEM and feeds the MXU directly, so HBM
sees 1 byte/weight instead of 2. This is the decode-path bandwidth lever for
q5_0/q8_0 checkpoints (whisper.cpp's Dec. column speedup, BASELINE.md).

Affine formats (q4_1/q5_1, K-quants) currently dequantize to bf16 at load.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io import quant as Q

QK = 32          # ggml simple-quant block size
_BN = 256        # output-tile width
_M_PAD = 8       # sublane padding for the activation tile


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    """Weight for y = x @ w, stored quantized: qs (K, N) int8 values,
    scales (K//32, N) f32."""
    qs: jnp.ndarray
    scales: jnp.ndarray

    @property
    def shape(self):
        return (self.qs.shape[0], self.qs.shape[1])

    @property
    def dtype(self):
        return jnp.bfloat16


def repack(raw: bytes | np.ndarray, ggml_type: int,
           out_features: int, in_features: int) -> QuantLinear | None:
    """ggml blocks for a (out, in) weight -> transposed planes for x @ w.

    Returns None if the type has no symmetric int8 representation.
    """
    n = out_features * in_features
    buf = np.frombuffer(raw, np.uint8, count=Q.nbytes_for(ggml_type, n))
    bs, bb = Q.block_info(ggml_type)
    if bs != QK:
        return None
    blocks = buf.reshape(-1, bb)

    if ggml_type == Q.GGML_TYPE_Q8_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        vals = blocks[:, 2:].copy().view(np.int8)
    elif ggml_type == Q.GGML_TYPE_Q5_0:
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        qh = blocks[:, 2:6].copy().view(np.uint32)
        ql = blocks[:, 6:]
        sh = np.arange(32, dtype=np.uint32)
        hbits = ((qh >> sh) & 1).astype(np.uint8)
        q4 = np.concatenate([ql & 0x0F, ql >> 4], axis=1)
        vals = ((q4 | (hbits << 4)).astype(np.int16) - 16).astype(np.int8)
    elif ggml_type == Q.GGML_TYPE_Q4_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        q = blocks[:, 2:]
        vals = np.concatenate([(q & 0x0F).astype(np.int8) - 8,
                               (q >> 4).astype(np.int8) - 8], axis=1)
    else:
        return None

    # blocks are row-major over the (out, in) weight: out*in//32 blocks
    vals = vals.reshape(out_features, in_features)         # (N, K)
    d = d.reshape(out_features, in_features // QK)         # (N, K/32)
    return QuantLinear(qs=jnp.asarray(np.ascontiguousarray(vals.T)),
                       scales=jnp.asarray(np.ascontiguousarray(d.T)))


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref):
    K = q_ref.shape[0]
    BN = q_ref.shape[1]
    w = q_ref[:].astype(jnp.float32)
    s = s_ref[:]                                  # (K//32, BN)
    w = (w.reshape(K // QK, QK, BN) * s[:, None, :]).reshape(K, BN)
    o_ref[:] = jnp.dot(x_ref[:], w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm(x: jnp.ndarray, qs: jnp.ndarray, scales: jnp.ndarray,
         interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = qs.shape[1]
    Mp = -(-M // _M_PAD) * _M_PAD
    Np = -(-N // _BN) * _BN
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        qs = jnp.pad(qs, ((0, 0), (0, Np - N)))
        scales = jnp.pad(scales, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _qmm_kernel,
        grid=(Np // _BN,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _BN), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // QK, _BN), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, _BN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qs, scales)
    return out[:M, :N]


@functools.cache
def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def qmatmul(x: jnp.ndarray, w: QuantLinear) -> jnp.ndarray:
    """y = x @ w for quantized w; x (..., K) -> (..., N), f32 accumulate."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = _qmm(x2, w.qs, w.scales, interpret=not _on_tpu())
    return out.reshape(*lead, w.qs.shape[1])


def dequantize_dense(w: QuantLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Expand to a dense (K, N) array (fallback path / testing)."""
    K, N = w.qs.shape
    s = jnp.repeat(w.scales, QK, axis=0)
    return (w.qs.astype(jnp.float32) * s).astype(dtype)
