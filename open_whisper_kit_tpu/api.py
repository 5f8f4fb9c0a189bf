"""Public API facade.

Python mirror of the reference's two API surfaces:
* the C API include/whisper.h (init / full / segments accessors / language
  detect / timings / system info),
* the Swift SDK (Sources/OpenWhisperKit/OpenWhisperKit.swift — Transcriber
  with VAD-chunked or direct paths; SortFormerContext.swift — Diarizer;
  DiarizationAligner — align()).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .align import aligner as _aligner
from .align import rttm as _rttm
from .align.aligner import AlignmentOptions, DiarizedTranscription, WordTiming
from .align.rttm import RttmSegment
from .audio.wav import load_wav
from .decode import full as _full
from .decode.full import Segment, TokenData, TranscribeResult, WhisperContext
from .decode.params import FullParams, SamplingStrategy, VadParams
from .models.sortformer.streaming import (PRESETS, SortformerDiarizer,
                                          SortformerStream, StreamConfig)

__all__ = [
    "Transcriber", "Diarizer", "FullParams", "SamplingStrategy", "VadParams",
    "Segment", "TokenData", "TranscribeResult", "WordTiming",
    "AlignmentOptions", "DiarizedTranscription", "RttmSegment",
    "align", "load_wav",
]


class Transcriber:
    """Whisper speech-to-text (OpenWhisperKit / whisper.h analog)."""

    def __init__(self, model_path: str | Path | None = None,
                 preset: str | None = None, dtype=jnp.bfloat16,
                 decoder_int8: bool = False, encoder_int8: bool = False,
                 mesh=None,
                 draft_model_path: str | Path | None = None,
                 draft_preset: str | None = None):
        """`mesh`: a jax.sharding.Mesh with (dp, tp) axes (parallel/mesh.py
        `make_mesh()`): weights are tensor-parallel-sharded over `tp` and
        batched entry points (transcribe_batched, full_parallel) shard their
        chunk axis over `dp` — the multi-chip serving mode (the TPU-native
        role of ggml_backend_sched placement + ggml-rpc,
        ggml/include/ggml-backend.h:251-306).

        `encoder_int8`: W8A8 MXU encoder (ops/encoder_int8, q8_0-class
        error) — the quantized-encoder serving mode (the reference benches
        q5_0 encoders, scripts/bench-all-gg.txt:137).

        `draft_model_path`/`draft_preset`: attach a smaller same-vocab
        model for speculative greedy decoding (FullParams.speculative)."""
        if model_path is not None:
            self.ctx = WhisperContext.from_file(str(model_path), dtype=dtype,
                                                decoder_int8=decoder_int8,
                                                encoder_int8=encoder_int8,
                                                mesh=mesh)
        elif preset is not None:
            self.ctx = WhisperContext.from_preset(preset, dtype=dtype,
                                                  decoder_int8=decoder_int8,
                                                  encoder_int8=encoder_int8,
                                                  mesh=mesh)
        else:
            raise ValueError("model_path or preset required")
        if draft_model_path is not None:
            self.ctx.set_draft(
                WhisperContext.from_file(str(draft_model_path), dtype=dtype))
        elif draft_preset is not None:
            self.ctx.set_draft(
                WhisperContext.from_preset(draft_preset, dtype=dtype))

    # -- whisper.h-style surface -------------------------------------------

    def full(self, params: FullParams, samples: np.ndarray) -> TranscribeResult:
        """whisper_full: transcribe raw 16 kHz mono f32 samples."""
        return _full.whisper_full(self.ctx, params, samples)

    def detect_language(self, samples: np.ndarray, offset_ms: int = 0):
        """whisper_lang_auto_detect: (lang_id, probs)."""
        from .audio import mel as mel_mod
        mel = mel_mod.log_mel_spectrogram(np.asarray(samples, np.float32),
                                          self.ctx.filters)
        return _full.detect_language(self.ctx, mel, offset_ms)

    def tokenize(self, text: str) -> list[int]:
        return self.ctx.vocab.tokenize(text)

    def token_to_str(self, token_id: int) -> str:
        return self.ctx.vocab.token_to_str(token_id)

    # -- Swift-SDK-style surface -------------------------------------------

    def transcribe(self, audio: str | Path | np.ndarray,
                   params: FullParams | None = None) -> TranscribeResult:
        """OpenWhisperKit.transcribe(audioPath/samples)."""
        if isinstance(audio, (str, Path)):
            audio = load_wav(audio)
        return self.full(params or FullParams(print_progress=False), audio)

    def transcribe_paths(self, paths: list[str | Path],
                         params: FullParams | None = None,
                         batched: bool = False) -> list[TranscribeResult]:
        """OpenWhisperKit.transcribe(audioPaths:); `batched=True` decodes
        all files' windows in lockstep on-device (transcribe_batch)."""
        if batched:
            return self.transcribe_batch(list(paths), params)
        return [self.transcribe(p, params) for p in paths]

    def transcribe_batch(self, audios: list,
                         params: FullParams | None = None
                         ) -> list[TranscribeResult]:
        """Lockstep multi-FILE transcription (the Diarizer.diarize_batch
        analog): every file's windows decode in the same device program —
        batch-B matmuls on the MXU, one host round trip per multi-window
        round. Greedy-t0 serving path with per-file QA-gate fallback to
        the exact single-stream driver; params outside that envelope run
        the files sequentially with identical results."""
        p = params or FullParams(print_progress=False)
        loaded = [load_wav(a) if isinstance(a, (str, Path))
                  else np.asarray(a, np.float32) for a in audios]
        from .parallel.dp import _batch_route_eligible
        if len(loaded) > 1 and _batch_route_eligible(self.ctx, p):
            from .decode.batch import transcribe_chunks_with_timings
            segs, tms = transcribe_chunks_with_timings(self.ctx, p, loaded)
            return [TranscribeResult(segments=s, timings=t)
                    for s, t in zip(segs, tms)]
        return [self.full(p, a) for a in loaded]

    def transcribe_batched(self, audio: str | Path | np.ndarray,
                           params: FullParams | None = None,
                           n_chunks: int = 8) -> TranscribeResult:
        """Serving-throughput mode: decode n_chunks independent chunks of the
        audio in lockstep on-device (decode/batch.py)."""
        from .decode.batch import transcribe_batched
        if isinstance(audio, (str, Path)):
            audio = load_wav(audio)
        return transcribe_batched(
            self.ctx, params or FullParams(print_progress=False),
            audio, n_chunks)

    def full_parallel(self, params: FullParams, samples: np.ndarray,
                      n_processors: int) -> TranscribeResult:
        """whisper_full_parallel semantics (per-chunk mel, merged segments)."""
        from .parallel.dp import full_parallel
        return full_parallel(self.ctx, params, samples, n_processors)

    @property
    def model_type(self) -> str:
        return self.ctx.model_type

    @property
    def is_multilingual(self) -> bool:
        return self.ctx.vocab.is_multilingual


class Diarizer:
    """SortFormer speaker diarization (SortFormerContext analog).

    frame duration 0.08 s, max 4 speakers
    (Sources/OpenWhisperKit/SortFormerContext.swift:20-30).
    """

    FRAME_DURATION = 0.08
    MAX_SPEAKERS = 4

    def __init__(self, model_path: str | Path | None = None,
                 cfg=None, params=None, dtype=jnp.float32):
        if model_path is not None:
            self.engine = SortformerDiarizer.from_file(str(model_path), dtype=dtype)
        elif cfg is not None and params is not None:
            self.engine = SortformerDiarizer(cfg, params)
        else:
            raise ValueError("model_path or (cfg, params) required")

    @staticmethod
    def _auto_device_state(device_state: bool | None) -> bool:
        """Default the single-dispatch device AOSC loop on for accelerators
        (bit-exact vs the host loop; big win on high-latency links)."""
        if device_state is not None:
            return device_state
        import jax
        return jax.devices()[0].platform != "cpu"

    def diarize(self, audio: str | Path | np.ndarray,
                stream_config: StreamConfig | str | None = None,
                threshold: float = 0.5, median_win: int = 11,
                file_id: str | None = None,
                device_state: bool | None = None):
        """-> (probs (T,4), rttm segments)."""
        if isinstance(audio, (str, Path)):
            if file_id is None:
                file_id = Path(audio).stem
            audio = load_wav(audio)
        if isinstance(stream_config, str):
            stream_config = PRESETS[stream_config]
        probs = self.engine.diarize(
            audio, stream_config,
            device_state=self._auto_device_state(device_state))
        segments = _rttm.probs_to_segments(probs, threshold, median_win,
                                           file_id or "unknown")
        return probs, segments

    def diarize_batch(self, audios: list, stream_config=None,
                      threshold: float = 0.5, median_win: int = 11,
                      file_ids: list[str] | None = None,
                      device_state: bool | None = None):
        """Lockstep multi-file diarization -> list of (probs, segments)."""
        loaded = []
        ids = []
        for i, a in enumerate(audios):
            if isinstance(a, (str, Path)):
                ids.append(Path(a).stem)
                loaded.append(load_wav(a))
            else:
                ids.append(file_ids[i] if file_ids else f"file_{i}")
                loaded.append(np.asarray(a, np.float32))
        if isinstance(stream_config, str):
            stream_config = PRESETS[stream_config]
        all_probs = self.engine.diarize_batch(
            loaded, stream_config,
            device_state=self._auto_device_state(device_state))
        return [(p, _rttm.probs_to_segments(p, threshold, median_win, fid))
                for p, fid in zip(all_probs, ids)]

    def diarize_to_rttm(self, audio: str | Path | np.ndarray, **kw) -> str:
        _, segments = self.diarize(audio, **kw)
        return _rttm.to_rttm(segments)

    def stream(self, preset: str | StreamConfig = "low_latency",
               device_state: bool | None = None) -> SortformerStream:
        """True streaming session (sortformer_stream_* analog).

        `device_state=None` auto-enables the device-resident AOSC state on
        accelerators (one fused dispatch + one small fetch per chunk)."""
        return SortformerStream(self.engine, preset,
                                device_state=self._auto_device_state(device_state))


def align(words: list[WordTiming], segments: list[RttmSegment],
          options: AlignmentOptions | None = None) -> DiarizedTranscription:
    """Word <-> speaker alignment (DiarizationAligner.align)."""
    return _aligner.align(words, segments, options)


def words_from_result(result: TranscribeResult, vocab=None,
                      ctx: WhisperContext | None = None) -> list[WordTiming]:
    """Token-level timestamps -> WordTiming list for align().

    Groups tokens into words at leading-space boundaries
    (the Swift SDK's word extraction, WhisperContext.swift:110-160);
    timestamps are centiseconds -> seconds.
    """
    if vocab is None and ctx is not None:
        vocab = ctx.vocab
    words: list[WordTiming] = []
    for seg in result.segments:
        cur_text = ""
        cur_t0 = seg.t0
        cur_t1 = seg.t0
        cur_p = []
        for tk in seg.tokens:
            if vocab is not None and tk.id >= vocab.token_eot:
                continue
            s = vocab.token_to_str(tk.id) if vocab is not None else ""
            if s.startswith(" ") and cur_text:
                words.append(WordTiming(cur_text.strip(), cur_t0 / 100.0,
                                        cur_t1 / 100.0,
                                        float(np.mean(cur_p)) if cur_p else 1.0))
                cur_text = ""
                cur_p = []
            if not cur_p and tk.t0 >= 0:
                cur_t0 = tk.t0
            cur_text += s
            if tk.t1 >= 0:
                cur_t1 = tk.t1
            cur_p.append(tk.p)
        if cur_text.strip():
            words.append(WordTiming(cur_text.strip(), cur_t0 / 100.0,
                                    cur_t1 / 100.0,
                                    float(np.mean(cur_p)) if cur_p else 1.0))
    return words
