"""Streaming SortFormer diarization model (NVIDIA, 117 M params) in JAX.

Re-derivation of the reference engine's compute pipeline
(streaming-sortformer/src/sortformer.cpp):

* NeMo mel front-end (:779-894) — preemphasis 0.97, constant pad 256,
  400-tap Hann centered in 512-point frames, log(x + 2^-24), frames beyond
  seq_len zeroed, padded to a multiple of 16,
* pre-encoder (:900-1049) — conv2d(1->256,k3,s2) + 2x depthwise-separable
  conv2d subsampling (8x), flatten (C,F)-major, linear to d_model=512,
* 17-layer Conformer (:1100-1345) — macaron FFN halves (SiLU), rel-pos
  multi-head attention with pos_bias_u/v and the Transformer-XL rel-shift,
  GLU + depthwise-conv(k=9, BN-fused) module, per-layer final LN,
* 512->192 projection, 18-layer post-LN Transformer (:1412-1560),
* prediction head (:1566-1650) — ReLU, linear, ReLU, linear(192->4), sigmoid.

All stages are jitted, batched, layer-stacked (lax.scan), with the MXU doing
the heavy lifting; the reference builds one ggml graph per chunk per stage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...io.gguf import GGUFFile

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SortformerConfig:
    n_mels: int = 128
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    sample_rate: int = 16000
    preemph: float = 0.97
    log_guard: float = 2.0 ** -24
    pad_to: int = 16

    d_model: int = 512
    n_layers: int = 17
    n_heads: int = 8
    conv_kernel: int = 9
    ff_expansion: int = 4
    subsampling: int = 8
    subsampling_channels: int = 256

    tf_layers: int = 18
    tf_d_model: int = 192
    tf_heads: int = 8
    tf_ff: int = 768

    n_spk: int = 4
    eps: float = 1e-5

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads

    @property
    def tf_d_head(self) -> int:
        return self.tf_d_model // self.tf_heads

    @classmethod
    def from_gguf(cls, g: GGUFFile) -> "SortformerConfig":
        md = g.metadata
        def u(key, default):
            return int(md.get(key, default))
        return cls(
            n_mels=u("sortformer.mel.n_mels", 128),
            n_fft=u("sortformer.mel.n_fft", 512),
            hop_length=u("sortformer.mel.hop_length", 160),
            win_length=u("sortformer.mel.win_length", 400),
            sample_rate=u("sortformer.mel.sample_rate", 16000),
            d_model=u("sortformer.encoder.d_model", 512),
            n_layers=u("sortformer.encoder.n_layers", 17),
            n_heads=u("sortformer.encoder.n_heads", 8),
            conv_kernel=u("sortformer.encoder.conv_kernel_size", 9),
            ff_expansion=u("sortformer.encoder.ff_expansion", 4),
            subsampling=u("sortformer.encoder.subsampling_factor", 8),
            subsampling_channels=u("sortformer.encoder.subsampling_conv_channels", 256),
            tf_layers=u("sortformer.transformer.n_layers", 18),
            tf_d_model=u("sortformer.transformer.d_model", 192),
            tf_heads=u("sortformer.transformer.n_heads", 8),
            tf_ff=u("sortformer.transformer.ff_inner", 768),
            n_spk=u("sortformer.n_speakers", 4),
        )


def params_from_gguf(g: GGUFFile, dtype=jnp.float32) -> tuple[SortformerConfig, Params]:
    cfg = SortformerConfig.from_gguf(g)

    def t(name, transpose=False):
        a = g.to_float(name)
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype)

    def conf_layer(i):
        p = f"encoder.layers.{i}"
        return {
            "norm_ff1_w": t(f"{p}.norm_feed_forward1.weight"),
            "norm_ff1_b": t(f"{p}.norm_feed_forward1.bias"),
            "ff1_up_w": t(f"{p}.feed_forward1.linear1.weight", True),
            "ff1_up_b": t(f"{p}.feed_forward1.linear1.bias"),
            "ff1_down_w": t(f"{p}.feed_forward1.linear2.weight", True),
            "ff1_down_b": t(f"{p}.feed_forward1.linear2.bias"),
            "norm_sa_w": t(f"{p}.norm_self_att.weight"),
            "norm_sa_b": t(f"{p}.norm_self_att.bias"),
            "q_w": t(f"{p}.self_attn.linear_q.weight", True),
            "q_b": t(f"{p}.self_attn.linear_q.bias"),
            "k_w": t(f"{p}.self_attn.linear_k.weight", True),
            "k_b": t(f"{p}.self_attn.linear_k.bias"),
            "v_w": t(f"{p}.self_attn.linear_v.weight", True),
            "v_b": t(f"{p}.self_attn.linear_v.bias"),
            "out_w": t(f"{p}.self_attn.linear_out.weight", True),
            "out_b": t(f"{p}.self_attn.linear_out.bias"),
            "pos_w": t(f"{p}.self_attn.linear_pos.weight", True),
            "pos_bias_u": t(f"{p}.self_attn.pos_bias_u"),   # (H, d_head)
            "pos_bias_v": t(f"{p}.self_attn.pos_bias_v"),
            "norm_conv_w": t(f"{p}.norm_conv.weight"),
            "norm_conv_b": t(f"{p}.norm_conv.bias"),
            # pointwise convs stored (out, in, 1) -> (in, out) matmul form
            "pw1_w": jnp.asarray(g.to_float(f"{p}.conv.pointwise_conv1.weight")
                                 .reshape(2 * cfg.d_model, cfg.d_model).T, dtype),
            "pw1_b": t(f"{p}.conv.pointwise_conv1.bias"),
            # depthwise (512, 1, 9) -> (9, 512) kernel-major
            "dw_w": jnp.asarray(g.to_float(f"{p}.conv.depthwise_conv.weight")
                                .reshape(cfg.d_model, cfg.conv_kernel).T, dtype),
            "dw_b": t(f"{p}.conv.depthwise_conv.bias"),
            "pw2_w": jnp.asarray(g.to_float(f"{p}.conv.pointwise_conv2.weight")
                                 .reshape(cfg.d_model, cfg.d_model).T, dtype),
            "pw2_b": t(f"{p}.conv.pointwise_conv2.bias"),
            "norm_ff2_w": t(f"{p}.norm_feed_forward2.weight"),
            "norm_ff2_b": t(f"{p}.norm_feed_forward2.bias"),
            "ff2_up_w": t(f"{p}.feed_forward2.linear1.weight", True),
            "ff2_up_b": t(f"{p}.feed_forward2.linear1.bias"),
            "ff2_down_w": t(f"{p}.feed_forward2.linear2.weight", True),
            "ff2_down_b": t(f"{p}.feed_forward2.linear2.bias"),
            "norm_out_w": t(f"{p}.norm_out.weight"),
            "norm_out_b": t(f"{p}.norm_out.bias"),
        }

    def tf_layer(i):
        p = f"transformer_encoder.layers.{i}"
        return {
            "q_w": t(f"{p}.first_sub_layer.query_net.weight", True),
            "q_b": t(f"{p}.first_sub_layer.query_net.bias"),
            "k_w": t(f"{p}.first_sub_layer.key_net.weight", True),
            "k_b": t(f"{p}.first_sub_layer.key_net.bias"),
            "v_w": t(f"{p}.first_sub_layer.value_net.weight", True),
            "v_b": t(f"{p}.first_sub_layer.value_net.bias"),
            "out_w": t(f"{p}.first_sub_layer.out_projection.weight", True),
            "out_b": t(f"{p}.first_sub_layer.out_projection.bias"),
            "ln1_w": t(f"{p}.layer_norm_1.weight"), "ln1_b": t(f"{p}.layer_norm_1.bias"),
            "ff_up_w": t(f"{p}.second_sub_layer.dense_in.weight", True),
            "ff_up_b": t(f"{p}.second_sub_layer.dense_in.bias"),
            "ff_down_w": t(f"{p}.second_sub_layer.dense_out.weight", True),
            "ff_down_b": t(f"{p}.second_sub_layer.dense_out.bias"),
            "ln2_w": t(f"{p}.layer_norm_2.weight"), "ln2_b": t(f"{p}.layer_norm_2.bias"),
        }

    def stack(layers):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    # pre-encoder conv weights: torch (out, in, kh, kw) -> jax HWIO (kh, kw, in, out)
    def conv2d_w(name):
        return jnp.asarray(g.to_float(name).transpose(2, 3, 1, 0), dtype)

    params = {
        "mel_fb": jnp.asarray(g.to_float("preprocessor.featurizer.fb"), jnp.float32),
        "mel_window": jnp.asarray(g.to_float("preprocessor.featurizer.window"), jnp.float32),
        "preenc": {
            "conv0_w": conv2d_w("encoder.pre_encode.conv.0.weight"),
            "conv0_b": t("encoder.pre_encode.conv.0.bias"),
            "conv2_w": conv2d_w("encoder.pre_encode.conv.2.weight"),   # depthwise
            "conv2_b": t("encoder.pre_encode.conv.2.bias"),
            "conv3_w": conv2d_w("encoder.pre_encode.conv.3.weight"),   # pointwise
            "conv3_b": t("encoder.pre_encode.conv.3.bias"),
            "conv5_w": conv2d_w("encoder.pre_encode.conv.5.weight"),
            "conv5_b": t("encoder.pre_encode.conv.5.bias"),
            "conv6_w": conv2d_w("encoder.pre_encode.conv.6.weight"),
            "conv6_b": t("encoder.pre_encode.conv.6.bias"),
            "out_w": t("encoder.pre_encode.out.weight", True),
            "out_b": t("encoder.pre_encode.out.bias"),
        },
        "conformer": stack([conf_layer(i) for i in range(cfg.n_layers)]),
        "proj_w": t("sortformer_modules.encoder_proj.weight", True),
        "proj_b": t("sortformer_modules.encoder_proj.bias"),
        "transformer": stack([tf_layer(i) for i in range(cfg.tf_layers)]),
        "pred_hidden_w": t("sortformer_modules.first_hidden_to_hidden.weight", True),
        "pred_hidden_b": t("sortformer_modules.first_hidden_to_hidden.bias"),
        "pred_spk_w": t("sortformer_modules.single_hidden_to_spks.weight", True),
        "pred_spk_b": t("sortformer_modules.single_hidden_to_spks.bias"),
    }
    return cfg, params


# ---------------------------------------------------------------------------
# Mel front-end (NeMo semantics; sortformer.cpp:779-894)
# ---------------------------------------------------------------------------

def compute_mel(cfg: SortformerConfig, params: Params,
                samples: np.ndarray) -> tuple[jnp.ndarray, int]:
    """-> (mel (n_frames_out, n_mels) f32, seq_len).

    Frames beyond seq_len are zero; n_frames_out is padded to pad_to.
    """
    x = np.asarray(samples, np.float32)
    n = x.shape[0]
    y = np.empty_like(x)
    if n > 0:
        y[0] = x[0]
        y[1:] = x[1:] - cfg.preemph * x[:-1]
    pad = cfg.n_fft // 2
    padded = np.concatenate([np.zeros(pad, np.float32), y,
                             np.zeros(pad, np.float32)])
    n_stft = 1 + (padded.shape[0] - cfg.n_fft) // cfg.hop_length
    seq_len = n // cfg.hop_length
    n_out = -(-n_stft // cfg.pad_to) * cfg.pad_to
    n_compute = min(n_stft, seq_len)

    win = np.zeros(cfg.n_fft, np.float32)
    off = (cfg.n_fft - cfg.win_length) // 2
    win[off:off + cfg.win_length] = np.asarray(params["mel_window"])[:cfg.win_length]

    # fixed-size frame chunks: one compiled program for every audio length
    CHUNK = 2048
    n_chunks = max(1, -(-n_compute // CHUNK)) if n_compute > 0 else 0
    need = (n_chunks * CHUNK - 1) * cfg.hop_length + cfg.n_fft
    if padded.shape[0] < need:
        padded = np.pad(padded, (0, need - padded.shape[0]))
    win_j = jnp.asarray(win)
    parts = []
    for i in range(n_chunks):
        lo = i * CHUNK * cfg.hop_length
        hi = lo + (CHUNK - 1) * cfg.hop_length + cfg.n_fft
        parts.append(_mel_jit(jnp.asarray(padded[lo:hi]), win_j,
                              params["mel_fb"], CHUNK, cfg.n_fft,
                              cfg.hop_length, float(cfg.log_guard)))
    if parts:
        mel = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        mel = mel[:n_compute]
    else:
        mel = jnp.zeros((0, cfg.n_mels), jnp.float32)

    # zero-pad to n_out ON DEVICE: fetching the mel to host and re-uploading
    # costs a sync round trip + 2x the mel bytes on a relayed link
    out = jnp.pad(mel, ((0, n_out - mel.shape[0]), (0, 0)))
    return out, seq_len


@functools.partial(jax.jit, static_argnames=("n_frames", "n_fft", "hop"))
def _mel_jit(padded, window, fb, n_frames: int, n_fft: int, hop: int,
             log_guard: float):
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = padded[idx] * window[None, :]
    from ...audio.mel import rdft_power
    power = rdft_power(frames, n_fft)
    mel = jnp.dot(power, fb.T, preferred_element_type=jnp.float32)
    return jnp.log(mel + log_guard)


# ---------------------------------------------------------------------------
# Pre-encoder
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def preencode(cfg: SortformerConfig, params: Params,
              mel: jnp.ndarray, n_valid=None) -> jnp.ndarray:
    """mel (B, T, n_mels) -> (B, ceil3(T/8), d_model).

    `n_valid` (traced scalar) marks the live prefix when T is padded to a
    compile bucket: frames beyond it are zeroed between stages so boundary
    outputs equal the unpadded computation.
    """
    p = params["preenc"]
    dtype = p["out_w"].dtype
    # NHWC: (B, time, freq, 1)
    x = mel.astype(dtype)[..., None]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, b, stride, groups=1, pad=1):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=groups,
            preferred_element_type=jnp.float32)
        return (y + b.astype(jnp.float32)).astype(dtype)

    def zero_tail(x, n):
        if n_valid is None:
            return x
        t = jnp.arange(x.shape[1])
        return jnp.where((t < n)[None, :, None, None], x, 0)

    c = cfg.subsampling_channels
    n1 = None if n_valid is None else (n_valid - 1) // 2 + 1
    n2 = None if n1 is None else (n1 - 1) // 2 + 1
    n3 = None if n2 is None else (n2 - 1) // 2 + 1
    x = zero_tail(x, n_valid)
    x = jax.nn.relu(conv(x, p["conv0_w"], p["conv0_b"], 2))
    x = zero_tail(x, n1)
    x = conv(x, p["conv2_w"], p["conv2_b"], 2, groups=c)
    x = jax.nn.relu(conv(x, p["conv3_w"], p["conv3_b"], 1, pad=0))
    x = zero_tail(x, n2)
    x = conv(x, p["conv5_w"], p["conv5_b"], 2, groups=c)
    x = jax.nn.relu(conv(x, p["conv6_w"], p["conv6_b"], 1, pad=0))
    x = zero_tail(x, n3)

    # flatten channel-major: (B, T', F', C) -> (B, T', C, F') -> (B, T', C*F')
    B, T, F, C = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
    y = jnp.dot(x, p["out_w"], preferred_element_type=jnp.float32)
    return (y + p["out_b"].astype(jnp.float32)).astype(dtype)


def preenc_out_len(T_in: int) -> int:
    T = T_in
    for _ in range(3):
        T = (T - 1) // 2 + 1
    return T


# ---------------------------------------------------------------------------
# Conformer + projection + transformer + head
# ---------------------------------------------------------------------------

from ...ops.layers import layer_norm as _ln  # noqa: E402


def _mm(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def sinusoid_pos_emb(T: int, d_model: int) -> jnp.ndarray:
    """NeMo rel-pos table: positions T-1 .. -(T-1), interleaved sin/cos
    (sortformer.cpp:1052-1070)."""
    n_pos = 2 * T - 1
    pos = (T - 1 - jnp.arange(n_pos)).astype(jnp.float32)
    j = jnp.arange(d_model // 2, dtype=jnp.float32)
    freq = jnp.power(10000.0, -(2.0 * j) / d_model)
    angle = pos[:, None] * freq[None, :]
    pe = jnp.zeros((n_pos, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angle))
    pe = pe.at[:, 1::2].set(jnp.cos(angle))
    return pe


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift; x (B, H, T, n_pos) -> same shape
    (sortformer.cpp:1206-1222 / NeMo rel_shift)."""
    B, H, T, P = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, P + 1, T)
    x = x[:, :, 1:, :].reshape(B, H, T, P)
    return x


def _conformer_block(cfg: SortformerConfig, p: Params, x: jnp.ndarray,
                     pos: jnp.ndarray, kbias=None, valid=None) -> jnp.ndarray:
    """x (B, T, D); pos (n_pos, D) pre-computed sinusoid table.

    kbias (1,1,1,T): additive key mask (0 / -1e9) for padded frames;
    valid (1,T,1): multiplicative frame mask for the conv module."""
    B, T, D = x.shape
    H, dh = cfg.n_heads, cfg.d_head

    # FFN1 half-step
    h = _ln(x, p["norm_ff1_w"], p["norm_ff1_b"])
    h = jax.nn.silu(_mm(h, p["ff1_up_w"]) + p["ff1_up_b"])
    h = _mm(h, p["ff1_down_w"]) + p["ff1_down_b"]
    x = x + 0.5 * h

    # rel-pos self-attention
    h = _ln(x, p["norm_sa_w"], p["norm_sa_b"])
    q = (_mm(h, p["q_w"]) + p["q_b"]).reshape(B, T, H, dh)
    k = (_mm(h, p["k_w"]) + p["k_b"]).reshape(B, T, H, dh)
    v = (_mm(h, p["v_w"]) + p["v_b"]).reshape(B, T, H, dh)
    pos_p = _mm(pos.astype(h.dtype), p["pos_w"]).reshape(-1, H, dh)  # (n_pos,H,dh)

    q_u = q + p["pos_bias_u"][None, None]      # (B,T,H,dh)
    q_v = q + p["pos_bias_v"][None, None]
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bqhd,phd->bhqp", q_v, pos_p, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)[:, :, :, :T]
    scores = (ac + bd) / np.sqrt(dh)
    if kbias is not None:
        scores = scores + kbias
    attn = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(h.dtype)
    out = out.reshape(B, T, D)
    x = x + _mm(out, p["out_w"]) + p["out_b"]

    # conv module
    h = _ln(x, p["norm_conv_w"], p["norm_conv_b"])
    h = _mm(h, p["pw1_w"]) + p["pw1_b"]                    # (B,T,2D)
    a, g = h[..., :D], h[..., D:]
    h = a * jax.nn.sigmoid(g)                              # GLU
    if valid is not None:
        h = h * valid
    # depthwise conv k over time, symmetric pad
    pad = (cfg.conv_kernel - 1) // 2
    hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
    dw = p["dw_w"]                                         # (k, D)
    h = sum(hp[:, i:i + T, :] * dw[i][None, None, :]
            for i in range(cfg.conv_kernel))
    h = h + p["dw_b"]
    h = jax.nn.silu(h)
    h = _mm(h, p["pw2_w"]) + p["pw2_b"]
    x = x + h

    # FFN2 half-step
    h = _ln(x, p["norm_ff2_w"], p["norm_ff2_b"])
    h = jax.nn.silu(_mm(h, p["ff2_up_w"]) + p["ff2_up_b"])
    h = _mm(h, p["ff2_down_w"]) + p["ff2_down_b"]
    x = x + 0.5 * h

    return _ln(x, p["norm_out_w"], p["norm_out_b"])


def _transformer_block(cfg: SortformerConfig, p: Params, x: jnp.ndarray,
                       kbias=None):
    """Post-LN transformer layer (sortformer.cpp:1470-1528)."""
    B, T, D = x.shape
    H, dh = cfg.tf_heads, cfg.tf_d_head
    q = (_mm(x, p["q_w"]) + p["q_b"]).reshape(B, T, H, dh)
    k = (_mm(x, p["k_w"]) + p["k_b"]).reshape(B, T, H, dh)
    v = (_mm(x, p["v_w"]) + p["v_b"]).reshape(B, T, H, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    if kbias is not None:
        scores = scores + kbias
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, T, D)
    x = _ln(x + _mm(out, p["out_w"]) + p["out_b"], p["ln1_w"], p["ln1_b"])
    h = jax.nn.relu(_mm(x, p["ff_up_w"]) + p["ff_up_b"])
    h = _mm(h, p["ff_down_w"]) + p["ff_down_b"]
    return _ln(x + h, p["ln2_w"], p["ln2_b"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def head(cfg: SortformerConfig, params: Params, x: jnp.ndarray,
         n_valid=None) -> jnp.ndarray:
    """Conformer + projection + transformer + prediction head.

    x (B, T, d_model) pre-encoded frames -> speaker probs (B, T, n_spk).
    Equivalent to sortformer_compute_streaming_prediction
    (sortformer.cpp:1924-2266). `n_valid` masks padded frames so a padded
    call equals the exact-length one on the live prefix (compile-bucket
    support; -1e9 key bias keeps padded-query softmax finite).
    """
    T = x.shape[1]
    pos = sinusoid_pos_emb(T, cfg.d_model)
    kbias = None
    valid = None
    if n_valid is not None:
        live = jnp.arange(T) < n_valid
        kbias = jnp.where(live, 0.0, -1e9)[None, None, None, :]
        valid = live[None, :, None].astype(x.dtype)
        x = x * valid
    x = x * np.sqrt(cfg.d_model)   # xscale

    def conf_body(h, bp):
        return _conformer_block(cfg, bp, h, pos, kbias, valid), None

    x, _ = jax.lax.scan(conf_body, x, params["conformer"])

    x = _mm(x, params["proj_w"]) + params["proj_b"]

    def tf_body(h, bp):
        return _transformer_block(cfg, bp, h, kbias), None

    x, _ = jax.lax.scan(tf_body, x, params["transformer"])

    h = jax.nn.relu(x)
    h = jax.nn.relu(_mm(h, params["pred_hidden_w"]) + params["pred_hidden_b"])
    h = _mm(h, params["pred_spk_w"]) + params["pred_spk_b"]
    return jax.nn.sigmoid(h.astype(jnp.float32))


def init_params(cfg: SortformerConfig, seed: int = 0,
                dtype=jnp.float32) -> Params:
    """Random params with real shapes (tests / benches)."""
    rng = np.random.default_rng(seed)
    D, H, dh = cfg.d_model, cfg.n_heads, cfg.d_head
    ff = cfg.ff_expansion * D
    C = cfg.subsampling_channels

    def w(*shape, scale=None):
        scale = scale if scale is not None else (shape[-2] if len(shape) > 1 else 1) ** -0.5
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    def conf_layer():
        return {
            "norm_ff1_w": ones(D), "norm_ff1_b": w(D, scale=0.01),
            "ff1_up_w": w(D, ff), "ff1_up_b": w(ff, scale=0.01),
            "ff1_down_w": w(ff, D), "ff1_down_b": w(D, scale=0.01),
            "norm_sa_w": ones(D), "norm_sa_b": w(D, scale=0.01),
            "q_w": w(D, D), "q_b": w(D, scale=0.01),
            "k_w": w(D, D), "k_b": w(D, scale=0.01),
            "v_w": w(D, D), "v_b": w(D, scale=0.01),
            "out_w": w(D, D), "out_b": w(D, scale=0.01),
            "pos_w": w(D, D),
            "pos_bias_u": w(H, dh, scale=0.02), "pos_bias_v": w(H, dh, scale=0.02),
            "norm_conv_w": ones(D), "norm_conv_b": w(D, scale=0.01),
            "pw1_w": w(D, 2 * D), "pw1_b": w(2 * D, scale=0.01),
            "dw_w": w(cfg.conv_kernel, D, scale=0.2), "dw_b": w(D, scale=0.01),
            "pw2_w": w(D, D), "pw2_b": w(D, scale=0.01),
            "norm_ff2_w": ones(D), "norm_ff2_b": w(D, scale=0.01),
            "ff2_up_w": w(D, ff), "ff2_up_b": w(ff, scale=0.01),
            "ff2_down_w": w(ff, D), "ff2_down_b": w(D, scale=0.01),
            "norm_out_w": ones(D), "norm_out_b": w(D, scale=0.01),
        }

    TD, TH, Tdh, TF = cfg.tf_d_model, cfg.tf_heads, cfg.tf_d_head, cfg.tf_ff

    def tf_layer():
        return {
            "q_w": w(TD, TD), "q_b": w(TD, scale=0.01),
            "k_w": w(TD, TD), "k_b": w(TD, scale=0.01),
            "v_w": w(TD, TD), "v_b": w(TD, scale=0.01),
            "out_w": w(TD, TD), "out_b": w(TD, scale=0.01),
            "ln1_w": ones(TD), "ln1_b": w(TD, scale=0.01),
            "ff_up_w": w(TD, TF), "ff_up_b": w(TF, scale=0.01),
            "ff_down_w": w(TF, TD), "ff_down_b": w(TD, scale=0.01),
            "ln2_w": ones(TD), "ln2_b": w(TD, scale=0.01),
        }

    def stack(layers):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    F3 = cfg.n_mels
    for _ in range(3):
        F3 = (F3 - 1) // 2 + 1

    from .mel_fb import mel_filterbank

    return {
        "mel_fb": jnp.asarray(
            mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate), jnp.float32),
        "mel_window": jnp.asarray(np.hanning(cfg.win_length + 1)[:-1].astype(np.float32)
                                  if cfg.win_length > 1 else np.ones(1, np.float32)),
        "preenc": {
            "conv0_w": w(3, 3, 1, C, scale=0.2), "conv0_b": w(C, scale=0.01),
            "conv2_w": w(3, 3, 1, C, scale=0.2), "conv2_b": w(C, scale=0.01),
            "conv3_w": w(1, 1, C, C, scale=C ** -0.5), "conv3_b": w(C, scale=0.01),
            "conv5_w": w(3, 3, 1, C, scale=0.2), "conv5_b": w(C, scale=0.01),
            "conv6_w": w(1, 1, C, C, scale=C ** -0.5), "conv6_b": w(C, scale=0.01),
            "out_w": w(C * F3, D), "out_b": w(D, scale=0.01),
        },
        "conformer": stack([conf_layer() for _ in range(cfg.n_layers)]),
        "proj_w": w(D, TD), "proj_b": w(TD, scale=0.01),
        "transformer": stack([tf_layer() for _ in range(cfg.tf_layers)]),
        "pred_hidden_w": w(TD, TD), "pred_hidden_b": w(TD, scale=0.01),
        "pred_spk_w": w(TD, cfg.n_spk), "pred_spk_b": w(cfg.n_spk, scale=0.01),
    }
