"""Silero VAD model in JAX.

Re-derivation of the reference's per-chunk ggml graph
(whisper_vad_build_graph, src/whisper.cpp:4519-4653) in two TPU-friendly
phases instead of one graph launch per 512-sample chunk:

1. `features` — STFT-as-conv (reflect pad 64, basis (258,1,256), stride 128,
   magnitude over 129 bins) + the 4-conv ReLU encoder, batched over ALL
   chunks at once (everything lands on the MXU),
2. `lstm_scan` — the sequential LSTM cell + final 1x1 conv + sigmoid as a
   lax.scan over chunks with the (h, c) pytree carried explicitly
   (the serializable analog of the reference's persistent h/c tensors).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...io.ggml_silero import SileroCheckpoint

N_WINDOW = 512
_PAD = 64           # reflect pad on each side of the 512-window
_STFT_HOP = 128
_N_BINS = 129


@dataclasses.dataclass
class SileroParams:
    stft_basis: jnp.ndarray      # (256, 1, 258) WIO
    enc_w: list                   # 4 x (3, in, out)
    enc_b: list                   # 4 x (out,)
    w_ih: jnp.ndarray             # (128, 512)
    b_ih: jnp.ndarray             # (512,)
    w_hh: jnp.ndarray             # (128, 512)
    b_hh: jnp.ndarray             # (512,)
    final_w: jnp.ndarray          # (128,)
    final_b: jnp.ndarray          # ()


def params_from_checkpoint(ck: SileroCheckpoint) -> SileroParams:
    def f(name):
        return jnp.asarray(ck.to_float(name))

    # stft basis stored (258, 1, 256) [out, in, k] -> WIO (256, 1, 258)
    basis = f("_model.stft.forward_basis_buffer").transpose(2, 1, 0)
    enc_w, enc_b = [], []
    for i in range(4):
        w = f(f"_model.encoder.{i}.reparam_conv.weight")  # (out, in, 3)
        enc_w.append(w.transpose(2, 1, 0))                # WIO
        enc_b.append(f(f"_model.encoder.{i}.reparam_conv.bias"))
    return SileroParams(
        stft_basis=basis, enc_w=enc_w, enc_b=enc_b,
        w_ih=f("_model.decoder.rnn.weight_ih").T,
        b_ih=f("_model.decoder.rnn.bias_ih"),
        w_hh=f("_model.decoder.rnn.weight_hh").T,
        b_hh=f("_model.decoder.rnn.bias_hh"),
        final_w=f("_model.decoder.decoder.2.weight").reshape(-1),
        final_b=f("_model.decoder.decoder.2.bias").reshape(()))


jax.tree_util.register_dataclass(SileroParams)


def init_state(batch: int = 1):
    """(h, c) LSTM state, zeros (whisper_vad_reset_state)."""
    return (jnp.zeros((batch, 128), jnp.float32),
            jnp.zeros((batch, 128), jnp.float32))


def _features(p: SileroParams, windows: jnp.ndarray) -> jnp.ndarray:
    """(N, 512) windows -> (N, 128) per-chunk features; batched MXU path."""
    N = windows.shape[0]
    # reflect pad 64 each side (ggml_pad_reflect_1d, whisper.cpp:4523)
    x = jnp.pad(windows, ((0, 0), (_PAD, _PAD)), mode="reflect")
    x = x[:, :, None]                            # (N, 640, 1) NWC
    dn = ("NWC", "WIO", "NWC")
    stft = jax.lax.conv_general_dilated(
        x, p.stft_basis, (_STFT_HOP,), [(0, 0)], dimension_numbers=dn,
        preferred_element_type=jnp.float32)       # (N, 4, 258)
    real = stft[..., :_N_BINS]
    imag = stft[..., _N_BINS:]
    mag = jnp.sqrt(real * real + imag * imag)     # (N, 4, 129)

    h = mag
    strides = (1, 2, 2, 1)
    for w, b, s in zip(p.enc_w, p.enc_b, strides):
        h = jax.lax.conv_general_dilated(
            h, w, (s,), [(1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b)
    return h[:, 0, :]                             # (N, 128): [:, :, 0]


def _lstm_cell(p: SileroParams, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """PyTorch-gate-order LSTM cell (i,f,g,o; whisper.cpp:4574-4610)."""
    gates = x @ p.w_ih + p.b_ih + h @ p.w_hh + p.b_hh   # (B, 512)
    i_t = jax.nn.sigmoid(gates[:, 0:128])
    f_t = jax.nn.sigmoid(gates[:, 128:256])
    g_t = jnp.tanh(gates[:, 256:384])
    o_t = jax.nn.sigmoid(gates[:, 384:512])
    c_new = f_t * c + i_t * g_t
    h_new = o_t * jnp.tanh(c_new)
    return h_new, c_new


@jax.jit
def probs_scan(p: SileroParams, windows: jnp.ndarray, h: jnp.ndarray,
               c: jnp.ndarray):
    """(N, 512) -> per-chunk speech probs (N,); returns final (h, c)."""
    feats = _features(p, windows)                 # (N, 128)

    def body(carry, x):
        h, c = carry
        h, c = _lstm_cell(p, x[None], h, c)
        out = jax.nn.relu(h)
        prob = jax.nn.sigmoid(out @ p.final_w + p.final_b)
        return (h, c), prob[0]

    (h, c), probs = jax.lax.scan(body, (h, c), feats)
    return probs, h, c


class SileroVAD:
    """Stateful wrapper mirroring whisper_vad_context."""

    def __init__(self, params: SileroParams):
        self.params = params
        self.h, self.c = init_state()

    @classmethod
    def from_file(cls, path: str) -> "SileroVAD":
        from ...io.ggml_silero import load_silero
        return cls(params_from_checkpoint(load_silero(path)))

    def reset_state(self):
        self.h, self.c = init_state()

    def detect_speech(self, samples: np.ndarray, reset: bool = True) -> np.ndarray:
        """Per-512-sample-chunk speech probabilities
        (whisper_vad_detect_speech, src/whisper.cpp:5086-5185)."""
        if reset:
            self.reset_state()
        samples = np.asarray(samples, np.float32)
        n = samples.shape[0]
        n_chunks = -(-n // N_WINDOW) if n else 0
        if n_chunks == 0:
            return np.zeros(0, np.float32)
        buf = np.zeros(n_chunks * N_WINDOW, np.float32)
        buf[:n] = samples
        windows = buf.reshape(n_chunks, N_WINDOW)
        probs, self.h, self.c = probs_scan(self.params, jnp.asarray(windows),
                                           self.h, self.c)
        return np.asarray(probs)
