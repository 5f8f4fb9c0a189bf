"""whisper.h-compatible function surface.

1:1 name/semantics mapping of the reference C API (include/whisper.h) onto
the framework, so code written against whisper.cpp (or its go/java/ruby
bindings' shapes) ports mechanically:

    import open_whisper_kit_tpu.compat as whisper
    ctx = whisper.whisper_init_from_file("ggml-base.en.bin")
    params = whisper.whisper_full_default_params(whisper.WHISPER_SAMPLING_GREEDY)
    whisper.whisper_full(ctx, params, samples, len(samples))
    for i in range(whisper.whisper_full_n_segments(ctx)):
        print(whisper.whisper_full_get_segment_text(ctx, i))

The context object carries the last result (like whisper_state).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .decode import full as F
from .decode import tokenizer as T
from .decode.params import FullParams, SamplingStrategy
from .utils import timings as TM

WHISPER_SAMPLING_GREEDY = SamplingStrategy.GREEDY
WHISPER_SAMPLING_BEAM_SEARCH = SamplingStrategy.BEAM_SEARCH

WHISPER_SAMPLE_RATE = 16000
WHISPER_N_FFT = 400
WHISPER_HOP_LENGTH = 160
WHISPER_CHUNK_SIZE = 30


class WhisperCompatContext:
    """whisper_context + whisper_state in one handle."""

    def __init__(self, ctx: F.WhisperContext):
        self.ctx = ctx
        self.result: F.TranscribeResult = F.TranscribeResult(segments=[])


# -- init ---------------------------------------------------------------------

def whisper_init_from_file(path: str, dtype=None) -> WhisperCompatContext:
    import jax.numpy as jnp
    return WhisperCompatContext(
        F.WhisperContext.from_file(path, dtype=dtype or jnp.bfloat16))


whisper_init_from_file_with_params = whisper_init_from_file


def whisper_free(ctx: WhisperCompatContext):
    ctx.result = F.TranscribeResult(segments=[])


# -- params -------------------------------------------------------------------

def whisper_full_default_params(strategy=WHISPER_SAMPLING_GREEDY) -> FullParams:
    return FullParams(strategy=strategy)


# -- main entry points --------------------------------------------------------

def whisper_full(ctx: WhisperCompatContext, params: FullParams,
                 samples: np.ndarray, n_samples: int | None = None) -> int:
    if n_samples is not None:
        samples = np.asarray(samples, np.float32)[:n_samples]
    ctx.result = F.whisper_full(ctx.ctx, params, samples)
    return 0


def whisper_full_parallel(ctx: WhisperCompatContext, params: FullParams,
                          samples: np.ndarray, n_samples: int,
                          n_processors: int) -> int:
    from .parallel.dp import full_parallel
    ctx.result = full_parallel(ctx.ctx, params,
                               np.asarray(samples, np.float32)[:n_samples],
                               n_processors)
    return 0


def whisper_lang_auto_detect(ctx: WhisperCompatContext, offset_ms: int,
                             n_threads: int = 0,
                             lang_probs: np.ndarray | None = None,
                             samples: np.ndarray | None = None) -> int:
    from .audio import mel as mel_mod
    if samples is None:
        raise ValueError("pass samples= (no persistent mel state in compat)")
    mel = mel_mod.log_mel_spectrogram(np.asarray(samples, np.float32),
                                      ctx.ctx.filters)
    lang_id, probs = F.detect_language(ctx.ctx, mel, offset_ms)
    if lang_probs is not None:
        lang_probs[:len(probs)] = probs
    return lang_id


# -- results ------------------------------------------------------------------

def whisper_full_n_segments(ctx: WhisperCompatContext) -> int:
    return len(ctx.result.segments)


def whisper_full_get_segment_text(ctx: WhisperCompatContext, i: int) -> str:
    return ctx.result.segments[i].text


def whisper_full_get_segment_t0(ctx: WhisperCompatContext, i: int) -> int:
    return ctx.result.segments[i].t0


def whisper_full_get_segment_t1(ctx: WhisperCompatContext, i: int) -> int:
    return ctx.result.segments[i].t1


def whisper_full_get_segment_no_speech_prob(ctx, i: int) -> float:
    return ctx.result.segments[i].no_speech_prob


def whisper_full_get_segment_speaker_turn_next(ctx, i: int) -> bool:
    return ctx.result.segments[i].speaker_turn_next


def whisper_full_n_tokens(ctx: WhisperCompatContext, i: int) -> int:
    return len(ctx.result.segments[i].tokens)


def whisper_full_get_token_id(ctx, i: int, j: int) -> int:
    return ctx.result.segments[i].tokens[j].id


def whisper_full_get_token_text(ctx: WhisperCompatContext, i: int, j: int) -> str:
    return ctx.ctx.vocab.token_to_str(ctx.result.segments[i].tokens[j].id)


def whisper_full_get_token_p(ctx, i: int, j: int) -> float:
    return ctx.result.segments[i].tokens[j].p


def whisper_full_get_token_data(ctx, i: int, j: int):
    return ctx.result.segments[i].tokens[j]


def whisper_full_lang_id(ctx: WhisperCompatContext) -> int:
    return ctx.result.lang_id


# -- model info ---------------------------------------------------------------

def whisper_n_vocab(ctx) -> int:
    return ctx.ctx.cfg.n_vocab


def whisper_n_audio_ctx(ctx) -> int:
    return ctx.ctx.cfg.n_audio_ctx


def whisper_n_text_ctx(ctx) -> int:
    return ctx.ctx.cfg.n_text_ctx


def whisper_is_multilingual(ctx) -> bool:
    return ctx.ctx.vocab.is_multilingual


def whisper_model_type_readable(ctx) -> str:
    return ctx.ctx.model_type


# -- tokens -------------------------------------------------------------------

def whisper_tokenize(ctx, text: str, tokens=None, n_max_tokens=0) -> list[int]:
    return ctx.ctx.vocab.tokenize(text)


def whisper_token_to_str(ctx, token: int) -> str:
    return ctx.ctx.vocab.token_to_str(token)


def whisper_token_eot(ctx) -> int:
    return ctx.ctx.vocab.token_eot


def whisper_token_sot(ctx) -> int:
    return ctx.ctx.vocab.token_sot


def whisper_token_prev(ctx) -> int:
    return ctx.ctx.vocab.token_prev


def whisper_token_nosp(ctx) -> int:
    return ctx.ctx.vocab.token_nosp


def whisper_token_not(ctx) -> int:
    return ctx.ctx.vocab.token_not


def whisper_token_beg(ctx) -> int:
    return ctx.ctx.vocab.token_beg


def whisper_token_lang(ctx, lang_id: int) -> int:
    return ctx.ctx.vocab.token_lang(lang_id)


def whisper_token_translate(ctx) -> int:
    return ctx.ctx.vocab.token_translate


def whisper_token_transcribe(ctx) -> int:
    return ctx.ctx.vocab.token_transcribe


# -- languages ----------------------------------------------------------------

def whisper_lang_max_id() -> int:
    return len(T.LANGUAGES) - 1


def whisper_lang_id(lang: str) -> int:
    return T.lang_id(lang)


def whisper_lang_str(lang_id: int) -> str:
    return T.lang_str(lang_id)


def whisper_lang_str_full(lang_id: int) -> str:
    if 0 <= lang_id < len(T.LANGUAGES):
        return T.LANGUAGES[lang_id][1]
    return "??"


# -- misc ---------------------------------------------------------------------

def whisper_print_timings(ctx: WhisperCompatContext):
    TM.print_timings(ctx.result)


def whisper_reset_timings(ctx: WhisperCompatContext):
    ctx.result.timings = dataclasses.replace(ctx.result.timings.__class__())


def whisper_print_system_info() -> str:
    return TM.system_info()


def whisper_log_set(callback, user_data=None):
    if callback is None:
        TM.log_set(None)
    else:
        TM.log_set(lambda lvl, msg: callback(lvl, msg, user_data))
