"""W8A8 int8 encoder path: MXU s8 x s8 matmuls for the transformer stack.

The encoder is compute-bound (~2.3 TFLOP / 30 s window, ~57% bf16 MFU at
20.5 ms on v5e) and became the bottleneck under every serving headline
(VERDICT r4 #3). The v5e MXU's int8 peak is ~2x bf16, but XLA's s8
dot_general never hits it (round-3 probe: no speedup) — this module routes
the QKV/O/MLP matmuls of every encoder block through a Pallas kernel whose
inner op is a plain s8 x s8 -> s32 `dot_general`, which Mosaic lowers to
the native int8 MXU path.

Scheme (standard W8A8, q8_0-class error):
* weights: symmetric int8 per OUTPUT channel (one f32 scale per column),
* activations: symmetric int8 per ROW (one f32 scale per token), computed
  after each layernorm / gelu — XLA fuses the quantize into the producer,
* accumulate s32, epilogue `acc * row_scale * col_scale` -> bf16 in VMEM.

The conv front-end, positional add, layernorms, attention itself
(ops/attention._mha_packed) and residual stream stay bf16/f32 — they hold
a small fraction of the FLOPs and all of the numerical risk.

Reference parity note: the reference benches quantized ENCODERS too
(q5_0 encode, scripts/bench-all-gg.txt:137); whisper.cpp dequantizes to
f16/f32 for the encoder matmuls (ggml vec_dot over quantized rows), i.e.
weight-only. W8A8 here is the TPU-native equivalent lever: on MXU
hardware the win comes from the 2x int8 systolic rate, not bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BM = 512     # activation-row tile
_BN = 1280    # output-column tile (quant amortizes over N/_BN cells)
_M_PAD = 8


def _on_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# quantizers
# ---------------------------------------------------------------------------

def quantize_w_cols(w: jnp.ndarray):
    """(K, N) float weight -> (int8 (K,N), f32 (1,N)) per-column symmetric."""
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    s = amax / 127.0
    q = jnp.clip(jnp.round(w32 / jnp.where(s == 0, 1.0, s)), -127, 127)
    return q.astype(jnp.int8), s


def quantize_act_rows(x: jnp.ndarray, pre_bf16: bool = False):
    """(M, K) float activation -> (int8 (M,K), f32 (M,1)) per-row symmetric.

    Uses the reciprocal form round(x * 127/amax) — the exact formula the
    kernel applies in VMEM, so host- and kernel-side quantization agree
    bit-for-bit. `pre_bf16` mirrors the kernel's wide-K mode (K > 2048),
    where activation blocks stream as bf16 to halve VMEM pressure."""
    if pre_bf16:
        x = x.astype(jnp.bfloat16)
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    r = jnp.where(amax == 0, 0.0, 127.0 / amax)
    q = jnp.clip(jnp.round(x32 * r), -127, 127)
    return q.astype(jnp.int8), amax * (1.0 / 127.0)


# ---------------------------------------------------------------------------
# the W8A8 kernel
# ---------------------------------------------------------------------------

def _w8a8_kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, xs_ref):
    """Quantize the activation row-block ONCE (at j==0) into VMEM scratch,
    then s8 x s8 -> s32 MXU dot per column tile.

    Measured on v5e (512-deep dependent chain, relay RTT subtracted):
    raw s8 dot 630 T/s vs bf16 220; a separate XLA-side quantize step drags
    the combined op back to ~214 T/s (the quantize materializes an (M,K)
    round trip per matmul), while this in-kernel scratch form holds
    ~350-370 T/s and amortizes the quantize across all N/_BN tiles."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        r = jnp.where(amax == 0, 0.0, 127.0 / amax)
        xq_ref[:] = jnp.clip(jnp.round(x * r), -127, 127).astype(jnp.int8)
        xs_ref[:] = amax * (1.0 / 127.0)

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
                ).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_mm(x: jnp.ndarray, wq: jnp.ndarray,
             ws: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (M,K) float, wq (K,N) int8, ws (1,N) f32
    -> bf16 (M,N) = (quantize_rows(x) @ wq) * xs * ws."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = wq.shape[1]
    Mp = -(-M // _M_PAD) * _M_PAD
    # cap the activation block at ~3.4 MB bf16 (wide-K MLP2 blocks blew
    # VMEM at batch 16: (512, 5120) f32 x double-buffering)
    bm = min(_BM if K <= 2048 else _BM // 2, Mp)
    Mp = -(-Mp // bm) * bm
    bn = min(_BN, N)
    Np = -(-N // bn) * bn
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Np != N:
        wq = jnp.pad(wq, ((0, 0), (0, Np - N)))
        ws = jnp.pad(ws, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        interpret=interpret,
    )(x, wq, ws)
    return out[:M, :N]


def w8a8_matmul(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                interpret: bool | None = None) -> jnp.ndarray:
    """y = quantize_rows(x) @ wq, rescaled to bf16. x (..., K) float.
    Activation quantization happens inside the kernel (VMEM scratch)."""
    lead = x.shape[:-1]
    if interpret is None:
        interpret = _on_cpu()
    K = x.shape[-1]
    # wide-K blocks (MLP2) stream as bf16: a (bm, 5120) f32 block x
    # double-buffering blew VMEM at batch 16; int8 quantization needs
    # ~7 mantissa bits so the bf16 pre-cast is within the W8A8 envelope
    blk_dtype = jnp.bfloat16 if K > 2048 else jnp.float32
    out = _w8a8_mm(x.reshape(-1, K).astype(blk_dtype),
                   wq, ws, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


# ---------------------------------------------------------------------------
# encoder params + forward
# ---------------------------------------------------------------------------

def prepare_encoder_int8(cfg, enc) -> dict:
    """Dense encoder params -> W8A8 pytree. QKV fuses into one (S, 3S)
    plane per block (the K projection has no bias: a zero segment keeps
    the fused bias exact, whisper.cpp:2125). Conv/pos/LN stay dense."""
    from ..ops.quant_matmul import QuantLinear, QuantLinear4, dequantize_dense

    def dense(w):
        if isinstance(w, (QuantLinear, QuantLinear4)):
            return dequantize_dense(w, jnp.float32)
        return jnp.asarray(w, jnp.float32)

    def qblock(b):
        qkv = jnp.concatenate(
            [dense(b["q_w"]), dense(b["k_w"]), dense(b["v_w"])], axis=-1)
        qkv_q, qkv_s = quantize_w_cols(qkv)
        o_q, o_s = quantize_w_cols(dense(b["o_w"]))
        m0_q, m0_s = quantize_w_cols(dense(b["mlp0_w"]))
        m1_q, m1_s = quantize_w_cols(dense(b["mlp1_w"]))
        zeros_k = jnp.zeros_like(b["q_b"])
        return {
            "attn_ln_w": b["attn_ln_w"], "attn_ln_b": b["attn_ln_b"],
            "qkv_q": qkv_q, "qkv_s": qkv_s,
            "qkv_b": jnp.concatenate([b["q_b"], zeros_k, b["v_b"]], -1),
            "o_q": o_q, "o_s": o_s, "o_b": b["o_b"],
            "mlp_ln_w": b["mlp_ln_w"], "mlp_ln_b": b["mlp_ln_b"],
            "mlp0_q": m0_q, "mlp0_s": m0_s, "mlp0_b": b["mlp0_b"],
            "mlp1_q": m1_q, "mlp1_s": m1_s, "mlp1_b": b["mlp1_b"],
        }

    blocks = enc["blocks"]
    n_layer = cfg.n_audio_layer
    per_layer = [qblock(jax.tree.map(lambda x: x[i], blocks))
                 for i in range(n_layer)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    return {
        "conv1_w": enc["conv1_w"], "conv1_b": enc["conv1_b"],
        "conv2_w": enc["conv2_w"], "conv2_b": enc["conv2_b"],
        "pos": enc["pos"],
        "blocks": stacked,
        "ln_post_w": enc["ln_post_w"], "ln_post_b": enc["ln_post_b"],
    }


def _encoder_block_int8(cfg, p, x, n_valid, interpret):
    from ..ops.attention import mha_full, mha_full_xla
    from ..ops.layers import layer_norm as _ln

    S = cfg.n_audio_state
    dtype = x.dtype
    scale = 1.0 / np.sqrt(cfg.d_audio_head)
    h = _ln(x, p["attn_ln_w"], p["attn_ln_b"], cfg.eps)
    qkv = (w8a8_matmul(h, p["qkv_q"], p["qkv_s"], interpret)
           + p["qkv_b"]).astype(dtype)
    q, k, v = qkv[..., :S], qkv[..., S:2 * S], qkv[..., 2 * S:]
    attn = mha_full_xla if interpret else mha_full
    a = attn(q, k, v, cfg.n_audio_head, scale, kv_valid=n_valid)
    x = (x + w8a8_matmul(a, p["o_q"], p["o_s"], interpret)
         + p["o_b"]).astype(dtype)
    h = _ln(x, p["mlp_ln_w"], p["mlp_ln_b"], cfg.eps)
    h = jax.nn.gelu(
        w8a8_matmul(h, p["mlp0_q"], p["mlp0_s"], interpret).astype(
            jnp.float32) + p["mlp0_b"], approximate=True)
    return (x + w8a8_matmul(h, p["mlp1_q"], p["mlp1_s"], interpret)
            + p["mlp1_b"]).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def encode_int8(cfg, enc8, mel: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """W8A8 analog of models.whisper.model.encode (same conv front-end,
    pad-once masking, pre-LN stack, final layernorm; see that docstring
    for the reference graph mapping, src/whisper.cpp:1976-2269)."""
    from ..models.whisper.model import _ENC_PAD_MIN_T
    from ..ops.layers import layer_norm as _ln

    from ..models.whisper.model import conv1d_mm

    dtype = jnp.bfloat16
    x = mel.astype(dtype)
    x = conv1d_mm(x, enc8["conv1_w"].astype(dtype), 1)
    x = jax.nn.gelu(x + enc8["conv1_b"].astype(jnp.float32),
                    approximate=True).astype(dtype)
    x = conv1d_mm(x, enc8["conv2_w"].astype(dtype), 2)
    x = jax.nn.gelu(x + enc8["conv2_b"].astype(jnp.float32),
                    approximate=True).astype(dtype)

    n_ctx = x.shape[1]
    x = x + enc8["pos"][:n_ctx].astype(dtype)
    n_pad = -n_ctx % 128 if n_ctx >= _ENC_PAD_MIN_T else 0
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

    def body(h, bp):
        return _encoder_block_int8(cfg, bp, h,
                                   n_valid=n_ctx if n_pad else None,
                                   interpret=interpret), None

    x, _ = jax.lax.scan(body, x, enc8["blocks"])
    if n_pad:
        x = x[:, :n_ctx]
    return _ln(x, enc8["ln_post_w"], enc8["ln_post_b"], cfg.eps)
