"""Whisper encoder-decoder as pure JAX functions over a params pytree.

Faithful re-derivation of the reference compute graphs
(src/whisper.cpp:1976-2269 conv+encoder, :2272-2346 cross-KV,
:2458-2836 decoder) in TPU-idiomatic form:

* params are nested dicts of jnp arrays; per-layer weights are stacked on a
  leading layer axis (lax.scan over encoder blocks, Python loop for the
  decoder so XLA can alias in-place KV-cache updates),
* attention uses einsum with f32 accumulation on the MXU; the decoder
  self-attn K cache and the cross-attention K are pre-scaled by
  d_head**-0.25 exactly like the reference (whisper.cpp:2505,2548,2308),
* the KV cache is a static-shape [n_layer, B, n_ctx, n_state] pair written
  with lax.dynamic_update_slice; beam reorder is a batched gather
  (jnp.take) instead of the reference's cell-surgery seq_cp,
* matmuls run in `compute_dtype` (bfloat16 by default) with float32
  layernorm/softmax/logits.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...io.ggml_whisper import WhisperCheckpoint, WhisperHParams

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    n_mels: int
    eps: float = 1e-5

    @classmethod
    def from_hparams(cls, hp: WhisperHParams) -> "WhisperConfig":
        return cls(hp.n_vocab, hp.n_audio_ctx, hp.n_audio_state, hp.n_audio_head,
                   hp.n_audio_layer, hp.n_text_ctx, hp.n_text_state,
                   hp.n_text_head, hp.n_text_layer, hp.n_mels)

    @property
    def d_audio_head(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def d_text_head(self) -> int:
        return self.n_text_state // self.n_text_head


# presets matching the OpenAI model family (for random init / benches)
PRESETS: dict[str, WhisperConfig] = {
    "tiny": WhisperConfig(51865, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "tiny.en": WhisperConfig(51864, 1500, 384, 6, 4, 448, 384, 6, 4, 80),
    "base": WhisperConfig(51865, 1500, 512, 8, 6, 448, 512, 8, 6, 80),
    "small": WhisperConfig(51865, 1500, 768, 12, 12, 448, 768, 12, 12, 80),
    "medium": WhisperConfig(51865, 1500, 1024, 16, 24, 448, 1024, 16, 24, 80),
    "large-v2": WhisperConfig(51865, 1500, 1280, 20, 32, 448, 1280, 20, 32, 80),
    "large-v3": WhisperConfig(51866, 1500, 1280, 20, 32, 448, 1280, 20, 32, 128),
    "large-v3-turbo": WhisperConfig(51866, 1500, 1280, 20, 32, 448, 1280, 20, 4, 128),
}


# ---------------------------------------------------------------------------
# Param construction
# ---------------------------------------------------------------------------

from ...ops.layers import layer_norm as _ln  # noqa: E402


def init_params(cfg: WhisperConfig, seed: int = 0,
                dtype: jnp.dtype = jnp.bfloat16,
                device: bool | None = None) -> Params:
    """Random-init params with the real model shapes (bench / shape tests).

    `device=True` (or OWK_DEVICE_INIT=1 with a non-CPU backend) generates
    the tree ON DEVICE in one jitted builder instead of host numpy +
    upload: a turbo-sized tree is ~600 MB of bf16, minutes through a
    degraded tunnel, one compile + milliseconds on device. Values differ
    from the host path (different RNG); shapes and scales are identical.
    """
    if device is None:
        import os as _os
        device = (bool(_os.environ.get("OWK_DEVICE_INIT"))
                  and jax.devices()[0].platform != "cpu")
    if device:
        return _init_params_device(cfg, seed, dtype)
    rng = np.random.default_rng(seed)
    s, v = cfg.n_audio_state, cfg.n_vocab

    def w(*shape, scale=None):
        scale = scale if scale is not None else (shape[-2] if len(shape) > 1 else 1) ** -0.5
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    def enc_block():
        return {
            "attn_ln_w": w(s, scale=1.0) * 0 + 1, "attn_ln_b": w(s, scale=0.02),
            "q_w": w(s, s), "q_b": w(s, scale=0.02), "k_w": w(s, s),
            "v_w": w(s, s), "v_b": w(s, scale=0.02),
            "o_w": w(s, s), "o_b": w(s, scale=0.02),
            "mlp_ln_w": w(s, scale=1.0) * 0 + 1, "mlp_ln_b": w(s, scale=0.02),
            "mlp0_w": w(s, 4 * s), "mlp0_b": w(4 * s, scale=0.02),
            "mlp1_w": w(4 * s, s), "mlp1_b": w(s, scale=0.02),
        }

    def dec_block():
        d = enc_block()
        d.update({
            "cross_ln_w": w(s, scale=1.0) * 0 + 1, "cross_ln_b": w(s, scale=0.02),
            "cq_w": w(s, s), "cq_b": w(s, scale=0.02), "ck_w": w(s, s),
            "cv_w": w(s, s), "cv_b": w(s, scale=0.02),
            "co_w": w(s, s), "co_b": w(s, scale=0.02),
        })
        return d

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    enc = {
        "conv1_w": w(3, cfg.n_mels, s, scale=(3 * cfg.n_mels) ** -0.5),
        "conv1_b": w(s, scale=0.02),
        "conv2_w": w(3, s, s, scale=(3 * s) ** -0.5),
        "conv2_b": w(s, scale=0.02),
        "pos": w(cfg.n_audio_ctx, s, scale=0.02),
        "blocks": stack([enc_block() for _ in range(cfg.n_audio_layer)]),
        "ln_post_w": w(s, scale=1.0) * 0 + 1, "ln_post_b": w(s, scale=0.02),
    }
    dec = {
        "te": w(v, s, scale=0.02),
        "pe": w(cfg.n_text_ctx, s, scale=0.02),
        "blocks": stack([dec_block() for _ in range(cfg.n_text_layer)]),
        "ln_w": w(s, scale=1.0) * 0 + 1, "ln_b": w(s, scale=0.02),
    }
    return {"encoder": enc, "decoder": dec}


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _init_params_device(cfg: WhisperConfig, seed, dtype) -> Params:
    """Device-side analog of init_params: same shapes/scales, jax.random
    values (one compile per cfg, no host->device weight upload)."""
    s, v = cfg.n_audio_state, cfg.n_vocab
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def w(*shape, scale=None):
        scale = scale if scale is not None else (
            shape[-2] if len(shape) > 1 else 1) ** -0.5
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def enc_block():
        return {
            "attn_ln_w": w(s, scale=1.0) * 0 + 1, "attn_ln_b": w(s, scale=0.02),
            "q_w": w(s, s), "q_b": w(s, scale=0.02), "k_w": w(s, s),
            "v_w": w(s, s), "v_b": w(s, scale=0.02),
            "o_w": w(s, s), "o_b": w(s, scale=0.02),
            "mlp_ln_w": w(s, scale=1.0) * 0 + 1, "mlp_ln_b": w(s, scale=0.02),
            "mlp0_w": w(s, 4 * s), "mlp0_b": w(4 * s, scale=0.02),
            "mlp1_w": w(4 * s, s), "mlp1_b": w(s, scale=0.02),
        }

    def dec_block():
        d = enc_block()
        d.update({
            "cross_ln_w": w(s, scale=1.0) * 0 + 1, "cross_ln_b": w(s, scale=0.02),
            "cq_w": w(s, s), "cq_b": w(s, scale=0.02), "ck_w": w(s, s),
            "cv_w": w(s, s), "cv_b": w(s, scale=0.02),
            "co_w": w(s, s), "co_b": w(s, scale=0.02),
        })
        return d

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    enc = {
        "conv1_w": w(3, cfg.n_mels, s, scale=(3 * cfg.n_mels) ** -0.5),
        "conv1_b": w(s, scale=0.02),
        "conv2_w": w(3, s, s, scale=(3 * s) ** -0.5),
        "conv2_b": w(s, scale=0.02),
        "pos": w(cfg.n_audio_ctx, s, scale=0.02),
        "blocks": stack([enc_block() for _ in range(cfg.n_audio_layer)]),
        "ln_post_w": w(s, scale=1.0) * 0 + 1, "ln_post_b": w(s, scale=0.02),
    }
    dec = {
        "te": w(v, s, scale=0.02),
        "pe": w(cfg.n_text_ctx, s, scale=0.02),
        "blocks": stack([dec_block() for _ in range(cfg.n_text_layer)]),
        "ln_w": w(s, scale=1.0) * 0 + 1, "ln_b": w(s, scale=0.02),
    }
    return {"encoder": enc, "decoder": dec}


def params_from_checkpoint(ck: WhisperCheckpoint,
                           dtype: jnp.dtype = jnp.bfloat16,
                           keep_quant: bool = True) -> Params:
    """Build the params pytree from a parsed ggml-bin checkpoint.

    Tensor names follow the reference table (src/whisper-arch.h:42-141).
    2-D ggml weights are stored (out,in); we keep them transposed (in,out)
    so forward matmuls are plain x @ W. With `keep_quant`, symmetric
    block-quantized matmul weights stay quantized as QuantLinear planes fed
    to the fused dequant-matmul kernel (ops/quant_matmul.py).
    """
    from ...ops.quant_matmul import repack

    cfg = WhisperConfig.from_hparams(ck.hparams)

    def get(name, transpose=False, cast=True):
        raw = ck.tensors[name]
        if keep_quant and transpose and len(raw.shape) == 2:
            ql = repack(raw.data, raw.ggml_type, raw.shape[0], raw.shape[1])
            if ql is not None:
                return ql
        t = raw.to_float()
        if transpose:
            t = t.T
        a = jnp.asarray(t)
        return a.astype(dtype) if cast else a

    def enc_block(i):
        p = f"encoder.blocks.{i}"
        return {
            "attn_ln_w": get(f"{p}.attn_ln.weight"), "attn_ln_b": get(f"{p}.attn_ln.bias"),
            "q_w": get(f"{p}.attn.query.weight", True), "q_b": get(f"{p}.attn.query.bias"),
            "k_w": get(f"{p}.attn.key.weight", True),
            "v_w": get(f"{p}.attn.value.weight", True), "v_b": get(f"{p}.attn.value.bias"),
            "o_w": get(f"{p}.attn.out.weight", True), "o_b": get(f"{p}.attn.out.bias"),
            "mlp_ln_w": get(f"{p}.mlp_ln.weight"), "mlp_ln_b": get(f"{p}.mlp_ln.bias"),
            "mlp0_w": get(f"{p}.mlp.0.weight", True), "mlp0_b": get(f"{p}.mlp.0.bias"),
            "mlp1_w": get(f"{p}.mlp.2.weight", True), "mlp1_b": get(f"{p}.mlp.2.bias"),
        }

    def dec_block(i):
        p = f"decoder.blocks.{i}"
        return {
            "attn_ln_w": get(f"{p}.attn_ln.weight"), "attn_ln_b": get(f"{p}.attn_ln.bias"),
            "q_w": get(f"{p}.attn.query.weight", True), "q_b": get(f"{p}.attn.query.bias"),
            "k_w": get(f"{p}.attn.key.weight", True),
            "v_w": get(f"{p}.attn.value.weight", True), "v_b": get(f"{p}.attn.value.bias"),
            "o_w": get(f"{p}.attn.out.weight", True), "o_b": get(f"{p}.attn.out.bias"),
            "cross_ln_w": get(f"{p}.cross_attn_ln.weight"), "cross_ln_b": get(f"{p}.cross_attn_ln.bias"),
            "cq_w": get(f"{p}.cross_attn.query.weight", True), "cq_b": get(f"{p}.cross_attn.query.bias"),
            "ck_w": get(f"{p}.cross_attn.key.weight", True),
            "cv_w": get(f"{p}.cross_attn.value.weight", True), "cv_b": get(f"{p}.cross_attn.value.bias"),
            "co_w": get(f"{p}.cross_attn.out.weight", True), "co_b": get(f"{p}.cross_attn.out.bias"),
            "mlp_ln_w": get(f"{p}.mlp_ln.weight"), "mlp_ln_b": get(f"{p}.mlp_ln.bias"),
            "mlp0_w": get(f"{p}.mlp.0.weight", True), "mlp0_b": get(f"{p}.mlp.0.bias"),
            "mlp1_w": get(f"{p}.mlp.2.weight", True), "mlp1_b": get(f"{p}.mlp.2.bias"),
        }

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    # conv weights: ggml/torch (out, in, k) -> jax WIO (k, in, out)
    c1 = ck.to_float("encoder.conv1.weight").transpose(2, 1, 0)
    c2 = ck.to_float("encoder.conv2.weight").transpose(2, 1, 0)
    enc = {
        "conv1_w": jnp.asarray(c1, dtype),
        "conv1_b": get("encoder.conv1.bias").reshape(-1),
        "conv2_w": jnp.asarray(c2, dtype),
        "conv2_b": get("encoder.conv2.bias").reshape(-1),
        "pos": get("encoder.positional_embedding"),
        "blocks": stack([enc_block(i) for i in range(cfg.n_audio_layer)]),
        "ln_post_w": get("encoder.ln_post.weight"), "ln_post_b": get("encoder.ln_post.bias"),
    }
    dec = {
        "te": get("decoder.token_embedding.weight"),
        "pe": get("decoder.positional_embedding"),
        "blocks": stack([dec_block(i) for i in range(cfg.n_text_layer)]),
        "ln_w": get("decoder.ln.weight"), "ln_b": get("decoder.ln.bias"),
    }
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _mm(x: jnp.ndarray, w) -> jnp.ndarray:
    from ...ops.quant_matmul import QuantLinear, qmatmul
    if isinstance(w, QuantLinear):
        return qmatmul(x, w).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _attention(q, k, v, n_head, scale, mask=None):
    """q (B,Tq,S), k (B,Tk,S), v (B,Tk,S) -> (B,Tq,S); softmax in f32.

    `scale` multiplies the score matrix (the reference applies it inside
    soft_max_ext, whisper.cpp:2180/2624).
    """
    B, Tq, S = q.shape
    Tk = k.shape[1]
    d = S // n_head
    qh = q.reshape(B, Tq, n_head, d)
    kh = k.reshape(B, Tk, n_head, d)
    vh = v.reshape(B, Tk, n_head, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, Tq, S), probs


def _attention_hm(q, kh, vh, n_head, scale, mask=None):
    """Head-major attention: q (B,Tq,S), kh/vh (B,H,Tk,dh) -> (B,Tq,S)."""
    B, Tq, S = q.shape
    d = S // n_head
    qh = q.reshape(B, Tq, n_head, d).transpose(0, 2, 1, 3)   # (B,H,Tq,dh)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, S), probs


_ENC_PAD_MIN_T = 256   # pad-once threshold (= ops.attention._MIN_FLASH_T)


def conv1d_mm(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """1-D conv (kernel 3, pad 1) as an im2col MXU matmul, f32 accumulate.

    x (B, T, Cin), w (3, Cin, Cout) -> (B, T_out, Cout), identical math to
    lax.conv_general_dilated NWC/WIO (the encoder front-end,
    whisper.cpp:1976-2030): XLA's TPU conv lowering for these long-skinny
    shapes costs several ms while the equivalent (T, 3*Cin) @ (3*Cin, Cout)
    matmul is MXU-shaped. The k-shifted views are strided slices (no
    gather)."""
    B, T, Ci = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    To = (T - 1) // stride + 1
    taps = [jax.lax.slice(xp, (0, k, 0), (B, k + 1 + (To - 1) * stride, Ci),
                          (1, stride, 1)) for k in range(3)]
    # tap order [t-1 | t | t+1] matches w's (3, Ci, Co) row-major flatten
    xw = jnp.concatenate(taps, axis=-1)            # (B, To, 3*Ci)
    return jnp.dot(xw, w.reshape(3 * Ci, Co),
                   preferred_element_type=jnp.float32)


def _encoder_block(cfg: WhisperConfig, p: Params, x: jnp.ndarray,
                   n_valid: int | None = None,
                   flash: bool = True, mesh=None) -> jnp.ndarray:
    from ...ops.attention import mha_full, mha_full_tp, mha_full_xla

    scale = 1.0 / np.sqrt(cfg.d_audio_head)
    h = _ln(x, p["attn_ln_w"], p["attn_ln_b"], cfg.eps)
    q = _mm(h, p["q_w"]) + p["q_b"]
    k = _mm(h, p["k_w"])  # no key bias (whisper.cpp:2125)
    v = _mm(h, p["v_w"]) + p["v_b"]
    if mesh is not None:
        # head-sharded fused attention: keeps the pallas fast path legal
        # under GSPMD (VERDICT r3 ask #3) instead of dropping to plain XLA
        a = mha_full_tp(q, k, v, cfg.n_audio_head, scale, mesh,
                        kv_valid=n_valid)
    else:
        attn = mha_full if flash else mha_full_xla
        a = attn(q, k, v, cfg.n_audio_head, scale, kv_valid=n_valid)
    x = x + _mm(a, p["o_w"]) + p["o_b"]
    h = _ln(x, p["mlp_ln_w"], p["mlp_ln_b"], cfg.eps)
    h = jax.nn.gelu(_mm(h, p["mlp0_w"]) + p["mlp0_b"], approximate=True)
    return x + _mm(h, p["mlp1_w"]) + p["mlp1_b"]


@functools.partial(jax.jit, static_argnames=("cfg", "flash", "mesh"))
def encode(cfg: WhisperConfig, enc: Params, mel: jnp.ndarray,
           flash: bool = True, mesh=None) -> jnp.ndarray:
    """mel (B, 2*n_ctx, n_mels) -> encoder output (B, n_ctx, n_state).

    Mirrors whisper_build_graph_conv + whisper_build_graph_encoder
    (src/whisper.cpp:1976-2269): conv1(s1)+gelu, conv2(s2)+gelu, +pos-embed
    slice, pre-LN transformer stack, final layernorm.

    `flash=False` keeps every op XLA-native (no opaque pallas calls) so
    GSPMD can partition the whole program — the mesh / multi-chip path.

    W8A8 encoder params (prepare_encoder_int8 pytrees, detected by their
    int8 qkv planes) route to ops.encoder_int8.encode_int8 — same graph,
    MXU s8 matmuls. Not mesh-partitionable; mesh mode keeps dense params.
    """
    if "qkv_q" in enc["blocks"]:
        from ...ops.encoder_int8 import encode_int8
        assert mesh is None, "int8 encoder is single-chip (mesh keeps dense)"
        return encode_int8(cfg, enc, mel,
                           interpret=jax.devices()[0].platform == "cpu")
    dtype = enc["conv1_w"].dtype
    x = mel.astype(dtype)
    x = conv1d_mm(x, enc["conv1_w"], 1)
    x = jax.nn.gelu((x + enc["conv1_b"].astype(jnp.float32)), approximate=True).astype(dtype)
    x = conv1d_mm(x, enc["conv2_w"], 2)
    x = jax.nn.gelu((x + enc["conv2_b"].astype(jnp.float32)), approximate=True).astype(dtype)

    n_ctx = x.shape[1]
    x = x + enc["pos"][:n_ctx].astype(dtype)

    # pad ONCE to the flash-attention block multiple instead of pad/slice
    # copies of q/k/v in every layer (~12 ms of pure data movement for
    # large-v3-turbo on v5e); pad keys are masked in the kernel, pad-query
    # outputs never feed back into live positions and are sliced off below
    n_pad = -n_ctx % 128 if n_ctx >= _ENC_PAD_MIN_T else 0
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

    def body(h, bp):
        return _encoder_block(cfg, bp, h,
                              n_valid=n_ctx if n_pad else None,
                              flash=flash, mesh=mesh), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    if n_pad:
        x = x[:, :n_ctx]
    return _ln(x, enc["ln_post_w"], enc["ln_post_b"], cfg.eps)


@functools.partial(jax.jit, static_argnames=("cfg",))
def cross_kv(cfg: WhisperConfig, dec: Params, enc_out: jnp.ndarray):
    """enc_out (B,Ta,S) -> (xk, xv) each (L,B,H,Ta,dh), head-major layout;
    xk pre-scaled d**-0.25.

    Mirrors whisper_build_graph_cross (src/whisper.cpp:2272-2346).
    """
    kscale = float(cfg.d_text_head) ** -0.25
    blocks = dec["blocks"]

    def body(_, bp):
        B, Ta, _S = enc_out.shape
        H, dh = cfg.n_text_head, cfg.d_text_head
        k = (_mm(enc_out, bp["ck_w"]) * kscale)
        v = _mm(enc_out, bp["cv_w"]) + bp["cv_b"]
        # head-major (B, H, Ta, dh): 3x faster per-token reads at batch
        k = k.reshape(B, Ta, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Ta, H, dh).transpose(0, 2, 1, 3)
        return None, (k, v)

    _, (xk, xv) = jax.lax.scan(body, None, blocks)
    return xk, xv


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class QuantKV(NamedTuple):
    """Int8 cross-KV with per-position scales: qs (L,B,H,Ta,dh) int8,
    scale (L,B,H,Ta) f32. Halves the dominant HBM traffic of batched
    decoding; XLA fuses the int8->bf16 convert into the attention dots."""
    qs: jnp.ndarray
    scale: jnp.ndarray


@jax.jit
def quantize_cross_kv(x: jnp.ndarray) -> QuantKV:
    """(L,B,H,Ta,dh) float -> QuantKV (symmetric per-position int8)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
    qs = jnp.clip(jnp.round(x32 * inv[..., None]), -127, 127).astype(jnp.int8)
    return QuantKV(qs=qs, scale=scale)


@jax.tree_util.register_pytree_node_class
class QuantKVNat:
    """Int8 cross-KV in NATURAL layout for the fused Pallas batched
    cross-attention (ops/attention.cross_attention_q8_nat): qs
    (L,B,Tap,S) int8 slabs (full-lane DMA rows), scale (L,B,Hs,Tap) f32
    per-(position, head) with heads on sublanes. ta_valid (STATIC pytree
    aux — the pallas kernel masks with it at trace time) marks the live
    prefix before the 32-row pad."""

    def __init__(self, qs, scale, ta_valid: int):
        self.qs = qs
        self.scale = scale
        self.ta_valid = ta_valid

    def tree_flatten(self):
        return (self.qs, self.scale), self.ta_valid

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


@jax.jit
def _quantize_cross_kv_nat_jit(x: jnp.ndarray):
    L, B, H, Ta, dh = x.shape
    Tap = -(-Ta // 32) * 32
    Hs = -(-H // 8) * 8
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)                  # (L,B,H,Ta)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
    q = jnp.clip(jnp.round(x32 * inv[..., None]), -127, 127).astype(jnp.int8)
    # natural (L,B,Ta,S) slabs
    qs = jnp.transpose(q, (0, 1, 3, 2, 4)).reshape(L, B, Ta, H * dh)
    qs = jnp.pad(qs, ((0, 0), (0, 0), (0, Tap - Ta), (0, 0)))
    # scales transposed: heads on sublanes, positions on lanes
    sc = jnp.pad(scale, ((0, 0), (0, 0), (0, Hs - H), (0, Tap - Ta)))
    return qs, sc


def quantize_cross_kv_nat(x: jnp.ndarray) -> QuantKVNat:
    """(L,B,H,Ta,dh) float -> QuantKVNat (numerics == quantize_cross_kv:
    symmetric per-(position, head) int8)."""
    qs, sc = _quantize_cross_kv_nat_jit(x)
    return QuantKVNat(qs=qs, scale=sc, ta_valid=int(x.shape[3]))


def _attention_hm_q(q, kq, ks, vq, vs, n_head, scale, mask=None):
    """Head-major attention over int8 K/V planes; scales fold into the
    scores / probabilities so dequantized K/V never materialize in HBM.
    `mask` (additive, broadcastable to (B,H,Tq,Tk)): the causal-with-cache
    mask when the int8 planes are the SELF cache."""
    B, Tq, S = q.shape
    d = S // n_head
    qh = q.reshape(B, Tq, n_head, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kq.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :] * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    pv = (probs * vs[:, :, None, :]).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", pv, vq.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, S), probs


def init_kv_cache(cfg: WhisperConfig, n_beams: int, dtype=jnp.bfloat16,
                  width: int | None = None):
    """Static self-attention cache, head-major (L, B, H, width, dh).

    `width` defaults to the full n_text_ctx (448). Decode paths that never
    carry a prompt past position `width` may allocate narrower: attention
    reads the whole cache each step, so a no-context batched decode
    (result capped at n_text_ctx/2 - 4 tokens) only ever needs 256 columns
    — the masked tail contributes exact zeros to the softmax, so narrower
    is bit-identical and reads ~43% less self-KV HBM per step."""
    shape = (cfg.n_text_layer, n_beams, cfg.n_text_head,
             width or cfg.n_text_ctx, cfg.d_text_head)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def widen_kv_cache(kv: jnp.ndarray, width: int) -> jnp.ndarray:
    """Zero-pad a (L,B,H,C,dh) cache on the position axis to `width`
    (bit-exact stage transition for staged-width decode loops)."""
    C = kv.shape[3]
    if C >= width:
        return kv
    return jnp.pad(kv, ((0, 0), (0, 0), (0, 0), (0, width - C), (0, 0)))


def init_kv_cache_q8(cfg: WhisperConfig, n_beams: int):
    """Int8 self-attention cache (QuantKV pair): halves the dominant
    per-step self-KV read of batched serving (q8_0-level error — each
    row quantized per (batch, head, position) over dh)."""
    shape = (cfg.n_text_layer, n_beams, cfg.n_text_head, cfg.n_text_ctx,
             cfg.d_text_head)
    z = lambda: QuantKV(qs=jnp.zeros(shape, jnp.int8),
                        scale=jnp.zeros(shape[:-1], jnp.float32))
    return z(), z()


def _quantize_rows(x: jnp.ndarray):
    """(..., dh) float -> (int8 rows, f32 scales) symmetric per-row."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1.0, scale), 0.0)
    qs = jnp.clip(jnp.round(x32 * inv[..., None]), -127, 127).astype(jnp.int8)
    return qs, scale


def _layer_params(blocks: Params, il: int) -> Params:
    return jax.tree.map(lambda x: x[il], blocks)


def decode_impl(cfg: WhisperConfig, dec: Params, tokens: jnp.ndarray,
                kv_k: jnp.ndarray, kv_v: jnp.ndarray, kv_head: jnp.ndarray,
                xk: jnp.ndarray, xv: jnp.ndarray,
                collect_cross_qk: bool = False, logits_pos=None):
    """One decoder forward over `tokens` (B,T) starting at cache slot kv_head.

    Returns (logits (B,T,n_vocab) f32, kv_k, kv_v, cross_qk).
    cross_qk is (L,B,H,T,Ta) softmax cross-attention probabilities (the
    DTW timestamp signal, whisper.cpp:2720-2736) or None.

    `logits_pos` (traced i32): compute logits only for that token position
    (shape (B,1,V)). Prompt ingest only reads the last position's logits
    (whisper.cpp gathers rows with batch.logits[i]==1, :2934-2956); skipping
    the rest saves a T x n_vocab matmul + HBM write per window.

    Mirrors whisper_build_graph_decoder (src/whisper.cpp:2458-2836):
    Q and K of self-attention pre-scaled by d**-0.25 (K stored scaled in the
    cache); cross-attention scores scaled by d**-0.25 against the pre-scaled
    cross K.
    """
    quant_self = isinstance(kv_k, QuantKV)
    dtype = dec["te"].dtype if quant_self else kv_k.dtype
    B, T = tokens.shape
    if isinstance(xk, QuantKVNat):
        assert T == 1 and not collect_cross_qk, \
            "QuantKVNat drives the single-token serving step only"
    C = (kv_k.qs if quant_self else kv_k).shape[3]
    H, dh = cfg.n_text_head, cfg.d_text_head
    kqscale = float(cfg.d_text_head) ** -0.25
    positions = kv_head + jnp.arange(T)

    x = dec["te"][tokens].astype(dtype) + dec["pe"][positions][None, :, :].astype(dtype)

    # causal-with-cache mask: token at global pos p attends kv cols <= p
    col = jnp.arange(C)[None, None, None, :]
    pos = positions[None, None, :, None]
    mask = jnp.where(col <= pos, 0.0, -jnp.inf).astype(jnp.float32)

    cross_probs = []
    for il in range(cfg.n_text_layer):
        p = _layer_params(dec["blocks"], il)

        h = _ln(x, p["attn_ln_w"], p["attn_ln_b"], cfg.eps)
        if "qkv_w" in p:   # fused projection (prepare_decoder)
            qkv = _mm(h, p["qkv_w"]) + p["qkv_b"]
            S = cfg.n_text_state
            q = qkv[..., :S] * kqscale
            k = qkv[..., S:2 * S] * kqscale
            v = qkv[..., 2 * S:]
        else:
            q = (_mm(h, p["q_w"]) + p["q_b"]) * kqscale
            k = _mm(h, p["k_w"]) * kqscale
            v = _mm(h, p["v_w"]) + p["v_b"]

        # write head-major (B,H,T,dh) slabs at slot kv_head
        k_hm = k.reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        v_hm = v.reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        if quant_self:
            kq8, ksc = _quantize_rows(k_hm)
            vq8, vsc = _quantize_rows(v_hm)
            kv_k = QuantKV(
                jax.lax.dynamic_update_slice(
                    kv_k.qs, kq8[None], (il, 0, 0, kv_head, 0)),
                jax.lax.dynamic_update_slice(
                    kv_k.scale, ksc[None], (il, 0, 0, kv_head)))
            kv_v = QuantKV(
                jax.lax.dynamic_update_slice(
                    kv_v.qs, vq8[None], (il, 0, 0, kv_head, 0)),
                jax.lax.dynamic_update_slice(
                    kv_v.scale, vsc[None], (il, 0, 0, kv_head)))
            a, _ = _attention_hm_q(q, kv_k.qs[il], kv_k.scale[il],
                                   kv_v.qs[il], kv_v.scale[il],
                                   cfg.n_text_head, 1.0, mask)
        else:
            kv_k = jax.lax.dynamic_update_slice(
                kv_k, k_hm[None].astype(dtype), (il, 0, 0, kv_head, 0))
            kv_v = jax.lax.dynamic_update_slice(
                kv_v, v_hm[None].astype(dtype), (il, 0, 0, kv_head, 0))
            a, _ = _attention_hm(q, kv_k[il], kv_v[il], cfg.n_text_head,
                                 1.0, mask)
        x = x + _mm(a, p["o_w"]) + p["o_b"]

        h = _ln(x, p["cross_ln_w"], p["cross_ln_b"], cfg.eps)
        cq = _mm(h, p["cq_w"]) + p["cq_b"]
        if isinstance(xk, QuantKVNat):
            # fused Pallas batched cross-attention: int8 slabs DMA at
            # full lane width, dequant in VMEM (the serving lever)
            from ...ops.experiments import cross_attention_q8_nat
            probs = None
            ca = cross_attention_q8_nat(
                cq, xk.qs[il], xk.scale[il], xv.qs[il], xv.scale[il],
                cfg.n_text_head, kqscale, ta_valid=xk.ta_valid,
                interpret=jax.devices()[0].platform == "cpu").astype(x.dtype)
        elif isinstance(xk, QuantKV):
            ca, probs = _attention_hm_q(cq, xk.qs[il], xk.scale[il],
                                        xv.qs[il], xv.scale[il],
                                        cfg.n_text_head, kqscale)
        else:
            ca, probs = _attention_hm(cq, xk[il], xv[il], cfg.n_text_head, kqscale)
        if collect_cross_qk:
            cross_probs.append(probs)
        x = x + _mm(ca, p["co_w"]) + p["co_b"]

        h = _ln(x, p["mlp_ln_w"], p["mlp_ln_b"], cfg.eps)
        from ...ops.quant_matmul import QuantLinear as _QL, fused_ffn_int8
        if (isinstance(p["mlp0_w"], _QL) and isinstance(p["mlp1_w"], _QL)
                and p["mlp0_w"].qs.shape[-1] == p["mlp0_w"].n_out):
            x = x + fused_ffn_int8(h, p["mlp0_w"], p["mlp0_b"],
                                   p["mlp1_w"]).astype(x.dtype) + p["mlp1_b"]
        else:
            h = jax.nn.gelu(_mm(h, p["mlp0_w"]) + p["mlp0_b"], approximate=True)
            x = x + _mm(h, p["mlp1_w"]) + p["mlp1_b"]

    x = _ln(x, dec["ln_w"], dec["ln_b"], cfg.eps)
    if logits_pos is not None:
        x = jax.lax.dynamic_slice_in_dim(x, logits_pos, 1, axis=1)
    if "te_logits" in dec:   # int8 planes of te.T (quantize_decoder_int8)
        from ...ops.quant_matmul import qmatmul
        logits = qmatmul(x, dec["te_logits"])
    else:
        logits = jnp.dot(x, dec["te"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    cross_qk = jnp.stack(cross_probs) if collect_cross_qk else None
    return logits, kv_k, kv_v, cross_qk


decode = functools.partial(jax.jit, static_argnames=("cfg", "collect_cross_qk"),
                           donate_argnames=("kv_k", "kv_v"))(decode_impl)


def prepare_decoder(dec: Params) -> Params:
    """Fuse the self-attention q/k/v projections into one matmul per layer
    (fewer small ops on the per-token path). Quantized weights fuse by
    concatenating their int8/scale planes. Returns a new decoder pytree;
    the original param names are dropped for the fused ones."""
    from ...ops.quant_matmul import QuantLinear, concat_quant

    blocks = dict(dec["blocks"])
    q_w, k_w, v_w = blocks.pop("q_w"), blocks.pop("k_w"), blocks.pop("v_w")
    q_b, v_b = blocks.pop("q_b"), blocks.pop("v_b")
    if isinstance(q_w, QuantLinear):
        qkv_w = concat_quant([q_w, k_w, v_w])
    else:
        qkv_w = jnp.concatenate([q_w, k_w, v_w], axis=-1)
    zeros_k = jnp.zeros_like(q_b)
    blocks["qkv_w"] = qkv_w
    blocks["qkv_b"] = jnp.concatenate([q_b, zeros_k, v_b], axis=-1)
    out = dict(dec)
    out["blocks"] = blocks
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "flash", "mesh"))
def encode_with_cross_kv(cfg: WhisperConfig, enc: Params, dec: Params,
                         mel: jnp.ndarray, flash: bool = True, mesh=None):
    """encode + cross-KV precompute in ONE dispatch (each separate dispatch
    costs a full round trip on a remote-device link)."""
    enc_out = encode(cfg, enc, mel, flash=flash, mesh=mesh)
    xk, xv = cross_kv(cfg, dec, enc_out)
    return enc_out, xk, xv


# weights on the per-token decode path; ck/cv (per-window cross-KV build)
# and the encoder stay dense — they are compute-bound, not stream-bound.
_INT8_DECODE_WEIGHTS = ("qkv_w", "q_w", "k_w", "v_w", "o_w", "cq_w", "co_w",
                        "mlp0_w", "mlp1_w")


def quantize_decoder_int8(dec: Params, scope: str = "logits",
                          logits_bits: int = 8) -> Params:
    """Runtime W8: repack decoder matmul weights into int8 QuantLinear
    planes for the fused Pallas dequant-matvec (q8_0-level error, ~0.4%
    relative). The token-embedding gather keeps the dense `te`. Apply AFTER
    prepare_decoder.

    scope="logits" (default) quantizes only the vocab projection — the one
    plane big enough (133 MB for large-v3-turbo) that halved HBM traffic
    clearly wins: 0.56 -> 0.48 ms/step on v5e. scope="mlp" additionally
    routes the MLP pair through the single fused_ffn_int8 kernel: 22 vs
    35 us per layer in ISOLATION, but in the full decode step it measures
    SLOWER (0.60 ms) — the opaque pallas call defeats XLA's cross-op
    prefetch overlap that the dense matmuls enjoy; kept as a
    memory-halving option. scope="all" also covers the attention matmuls
    (same in-situ loss, max memory saving). Numbers:
    docs/PERFORMANCE.md."""
    from ...ops.quant_matmul import (QuantLinear, quantize_linear,
                                     quantize_linear4)

    out = dict(dec)
    if scope in ("all", "mlp"):
        blocks = dict(dec["blocks"])
        names = (_INT8_DECODE_WEIGHTS if scope == "all"
                 else ("mlp0_w", "mlp1_w"))
        for name in names:
            w = blocks.get(name)
            if w is None or isinstance(w, QuantLinear):
                continue
            if w.shape[-2] % 32 or w.shape[-1] % 32:
                continue   # not block-divisible (tiny test configs)
            # mlp0 feeds the fused FFN kernel: unpadded logical width
            blocks[name] = quantize_linear(w, pad=(name != "mlp0_w"))
        out["blocks"] = blocks
    te = dec["te"]
    if te.shape[-1] % 32 == 0 and "te_logits" not in dec:
        # logits_bits=4 halves the logits stream again (q4_0-level error on
        # the vocab projection only; the reference ships whole q4_0 models)
        q = quantize_linear4 if logits_bits == 4 else quantize_linear
        out["te_logits"] = q(te.T)
    return out


@functools.partial(jax.jit, donate_argnames=("kv_k", "kv_v"))
def reorder_kv(kv_k: jnp.ndarray, kv_v: jnp.ndarray, src: jnp.ndarray):
    """Beam shuffle: new cache row b = old row src[b] (replaces the
    reference's kv_seq_cp cell surgery, whisper.cpp:7301-7352)."""
    return jnp.take(kv_k, src, axis=1), jnp.take(kv_v, src, axis=1)
