"""Log-mel spectrogram front-ends.

Two variants, matching the reference bit-level semantics:

* Whisper (src/whisper.cpp:3170-3260): SR 16000, n_fft 400, hop 160,
  periodic Hann, front reflect-pad 200, end zero-pad 30 s + 200,
  power-spectrum x mel filterbank (filters come from the checkpoint),
  log10(max(p, 1e-10)), clamp to global max-8, (x+4)/4.
* NeMo / SortFormer (streaming-sortformer/src/sortformer.cpp:779-894):
  preemphasis 0.97, n_fft 512, win 400, hop 160, center constant-pad 200,
  Hann padded to 512, log(x + 2^-24), frames padded to a multiple of 16.

The hot path is a single jitted function (gather frames -> Hann -> rFFT ->
|.|^2 -> matmul with the filterbank on the MXU -> log/normalize); the frame
count is bucketed so long audio reuses one compiled program.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES_CHUNK = SAMPLE_RATE * CHUNK_LENGTH   # 480000
N_FRAMES_CHUNK = N_SAMPLES_CHUNK // HOP_LENGTH  # 3000

_FRAME_BUCKET = 1024  # frames per compile bucket (~10.24 s of audio)


def hann_window(length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann as in the reference (src/whisper.cpp:3023-3031)."""
    denom = length if periodic else length - 1
    i = np.arange(length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / denom))).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rdft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices (n_fft, n_fft//2+1), f64-built, f32-stored."""
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rdft_power(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """|rFFT(frames)|^2 as two MXU matmuls.

    XLA's TPU FFT lowering is the e2e mel bottleneck (~17 ms per 1024
    frames); the same power spectrum as f32 HIGHEST-precision matmuls
    against precomputed cos/sin matrices runs at MXU speed and matches
    jnp.fft.rfft to ~1e-6 relative."""
    c, s = _rdft_mats(n_fft)
    re = jnp.dot(frames, jnp.asarray(c),
                 precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(s),
                 precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    return re * re + im * im


@dataclasses.dataclass
class Mel:
    data: jnp.ndarray    # (>= n_len, n_mel) f32, frame-major; rows beyond
                         # n_len are zero compile-bucket padding
    n_len: int           # total frames incl. the 30 s zero tail
    n_len_org: int       # frames covering the real audio (seek bound)

    @property
    def n_mel(self) -> int:
        return int(self.data.shape[1])

    def ref_layout(self) -> np.ndarray:
        """(n_mel, n_len) float32 layout used by reference debug dumps."""
        return np.asarray(self.data[:self.n_len]).T


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_frames_jit(padded: jnp.ndarray, window: jnp.ndarray,
                    filters_t: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """padded (L,) -> log10 mel (n_frames, n_mel); no normalization yet."""
    idx = (jnp.arange(n_frames)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])
    frames = padded[idx] * window[None, :]
    power = rdft_power(frames, N_FFT)
    mel = jnp.dot(power, filters_t, preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(mel, 1e-10))


@jax.jit
def _normalize_jit(logmel: jnp.ndarray, n_len: jnp.ndarray) -> jnp.ndarray:
    """Clamp to max-8 and scale; frames >= n_len zeroed (they exist only as
    compile-bucket padding; the reference's window buffer is zero there,
    whisper.cpp:2392-2399)."""
    live = jnp.arange(logmel.shape[0]) < n_len
    mmax = jnp.max(jnp.where(live[:, None], logmel, -jnp.inf)) - 8.0
    out = (jnp.maximum(logmel, mmax) + 4.0) / 4.0
    return jnp.where(live[:, None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("n_chunks", "tail_pad"))
def _mel_full_jit(padded: jnp.ndarray, window: jnp.ndarray,
                  filters_t: jnp.ndarray, n_len: jnp.ndarray,
                  n_chunks: int, tail_pad: int = 0) -> jnp.ndarray:
    """Whole-audio mel in ONE device program: scan over fixed 1024-frame
    chunks (so one upload + one dispatch per call — each extra dispatch
    costs a full round trip on a remote-device link), then normalize.

    `tail_pad`: zeros appended ON DEVICE — the 30 s whisper zero tail
    never crosses the link (halves the upload for a 30 s clip; the relay
    charges ~10 ms/MB on a bad day)."""
    if tail_pad:
        padded = jnp.pad(padded, (0, tail_pad))
    overlap = N_FFT - HOP_LENGTH
    cs = _FRAME_BUCKET * HOP_LENGTH
    idx = (jnp.arange(_FRAME_BUCKET)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])

    def chunk(_, i):
        seg = jax.lax.dynamic_slice(padded, (i * cs,), (cs + overlap,))
        frames = seg[idx] * window[None, :]
        power = rdft_power(frames, N_FFT)
        mel = jnp.dot(power, filters_t, preferred_element_type=jnp.float32)
        return None, jnp.log10(jnp.maximum(mel, 1e-10))

    _, logmel = jax.lax.scan(chunk, None, jnp.arange(n_chunks))
    logmel = logmel.reshape(n_chunks * _FRAME_BUCKET, -1)
    live = jnp.arange(logmel.shape[0]) < n_len
    mmax = jnp.max(jnp.where(live[:, None], logmel, -jnp.inf)) - 8.0
    out = (jnp.maximum(logmel, mmax) + 4.0) / 4.0
    return jnp.where(live[:, None], out, 0.0)


def _bucket_chunks(n_chunks: int) -> int:
    """Bound the number of compiled _mel_full_jit programs: exact up to 8
    chunks (<= ~82 s audio), then multiples of 8."""
    return n_chunks if n_chunks <= 8 else -(-n_chunks // 8) * 8


_MEL_CONSTS: dict[tuple, tuple] = {}


def _mel_consts(filters: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-resident (window, filters_t) per filterbank: on a relayed
    link every host->device transfer costs a round trip, so upload the
    constants once and reuse the device arrays across calls."""
    key = (filters.shape, hash(filters.tobytes()))
    c = _MEL_CONSTS.get(key)
    if c is None:
        if len(_MEL_CONSTS) >= 8:
            _MEL_CONSTS.pop(next(iter(_MEL_CONSTS)))
        window = jnp.asarray(hann_window(N_FFT))
        filters_t = jnp.asarray(
            np.ascontiguousarray(filters.T, dtype=np.float32))
        c = _MEL_CONSTS[key] = (window, filters_t)
    return c


def log_mel_spectrogram(samples: np.ndarray, filters: np.ndarray) -> Mel:
    """Whisper log-mel of 16 kHz mono float32 `samples`.

    `filters` is the (n_mel, n_fft_bins=201) filterbank from the checkpoint.
    Frames are computed in fixed 1024-frame device calls so ONE compiled
    program covers every audio length (no per-length recompiles).
    """
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    n = samples.shape[0]
    pad_half = N_FFT // 2  # 200

    n_len = (n + N_SAMPLES_CHUNK + 2 * pad_half - N_FFT) // HOP_LENGTH
    n_len_org = 1 + (n + pad_half - N_FFT) // HOP_LENGTH if n + pad_half >= N_FFT else 0

    n_chunks = _bucket_chunks(max(1, -(-n_len // _FRAME_BUCKET)))
    padded_len = n_chunks * _FRAME_BUCKET * HOP_LENGTH + (N_FFT - HOP_LENGTH)
    # upload only the live prefix (head pad + audio), bucketed to chunk
    # quanta so executables stay shared; the zero tail pads ON DEVICE
    quantum = _FRAME_BUCKET * HOP_LENGTH
    up_len = min(padded_len,
                 max(1, -(-(pad_half + n) // quantum)) * quantum)
    padded = np.zeros(up_len, dtype=np.float32)
    if n > 0:
        padded[pad_half:pad_half + n] = samples[:up_len - pad_half]
        # reflect-pad the head: padded[0:200] = samples[200:0:-1]
        m = min(pad_half, n - 1, up_len - pad_half)
        if m > 0:
            padded[pad_half - m:pad_half] = samples[m:0:-1]

    window, filters_t = _mel_consts(filters)
    data = _mel_full_jit(jnp.asarray(padded), window, filters_t,
                         jnp.int32(n_len), n_chunks,
                         tail_pad=padded_len - up_len)
    return Mel(data=data, n_len=n_len, n_len_org=n_len_org)


def log_mel_spectrogram_numpy(samples: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Plain-numpy oracle for tests; returns (n_mel, n_len)."""
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    n = samples.shape[0]
    pad_half = N_FFT // 2
    padded = np.zeros(n + N_SAMPLES_CHUNK + 2 * pad_half, dtype=np.float32)
    padded[pad_half:pad_half + n] = samples
    m = min(pad_half, n - 1)
    if m > 0:
        padded[pad_half - m:pad_half] = samples[m:0:-1]
    n_len = (padded.shape[0] - N_FFT) // HOP_LENGTH
    win = hann_window(N_FFT)
    idx = np.arange(n_len)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = padded[idx] * win[None, :]
    spec = np.fft.rfft(frames, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    mel = power @ filters.astype(np.float32).T
    logmel = np.log10(np.maximum(mel, 1e-10))
    mmax = logmel.max() - 8.0
    return (np.maximum(logmel, mmax) + 4.0).T / 4.0


# ---------------------------------------------------------------------------
# NeMo / SortFormer variant
# ---------------------------------------------------------------------------

NEMO_N_FFT = 512
NEMO_WIN = 400
NEMO_HOP = 160
NEMO_PREEMPH = 0.97
NEMO_LOG_GUARD = 2.0 ** -24


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _nemo_frames_jit(padded: jnp.ndarray, window: jnp.ndarray,
                     filters_t: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    idx = (jnp.arange(n_frames)[:, None] * NEMO_HOP
           + jnp.arange(NEMO_N_FFT)[None, :])
    frames = padded[idx] * window[None, :]
    power = rdft_power(frames, NEMO_N_FFT)
    mel = jnp.dot(power, filters_t, preferred_element_type=jnp.float32)
    return jnp.log(mel + NEMO_LOG_GUARD)


def nemo_log_mel(samples: np.ndarray, filters: np.ndarray,
                 pad_to: int = 16) -> jnp.ndarray:
    """SortFormer mel front-end -> (n_frames_padded, n_mel=128) float32.

    Mirrors streaming-sortformer/src/sortformer.cpp:779-894: preemphasis,
    center constant-pad n_fft//2... window 400 centered in 512-point frame,
    log(x + 2^-24), frames zero(log-guard)-padded to a multiple of `pad_to`.
    """
    x = np.ascontiguousarray(samples, dtype=np.float32)
    # preemphasis y[t] = x[t] - 0.97 x[t-1], y[0] = x[0]
    y = np.empty_like(x)
    if x.shape[0] > 0:
        y[0] = x[0]
        y[1:] = x[1:] - NEMO_PREEMPH * x[:-1]
    pad = NEMO_N_FFT // 2
    padded_core = np.concatenate([np.zeros(pad, np.float32), y, np.zeros(pad, np.float32)])
    n_frames = 1 + (padded_core.shape[0] - NEMO_N_FFT) // NEMO_HOP if padded_core.shape[0] >= NEMO_N_FFT else 0

    # center the 400-sample Hann in the 512-point frame (NeMo's torch.stft
    # center-pads the window symmetrically: 56 zeros either side)
    win = np.zeros(NEMO_N_FFT, np.float32)
    off = (NEMO_N_FFT - NEMO_WIN) // 2
    win[off:off + NEMO_WIN] = hann_window(NEMO_WIN, periodic=False)

    bucket = 256
    n_frames_pad = max(bucket, -(-n_frames // bucket) * bucket)
    need = (n_frames_pad - 1) * NEMO_HOP + NEMO_N_FFT
    buf = np.zeros(need, np.float32)
    buf[:padded_core.shape[0]] = padded_core

    filters_t = jnp.asarray(np.ascontiguousarray(filters.T, dtype=np.float32))
    logmel = _nemo_frames_jit(jnp.asarray(buf), jnp.asarray(win), filters_t, n_frames_pad)
    logmel = logmel[:n_frames]

    n_out = -(-n_frames // pad_to) * pad_to
    if n_out > n_frames:
        fill = jnp.full((n_out - n_frames, logmel.shape[1]),
                        float(np.log(NEMO_LOG_GUARD)), jnp.float32)
        logmel = jnp.concatenate([logmel, fill], axis=0)
    return logmel
