"""Decoding parameter surface mirroring whisper_full_params.

Field set and defaults match whisper_full_default_params
(src/whisper.cpp:5928-6035; struct include/whisper.h:487-591).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable


class SamplingStrategy(enum.Enum):
    GREEDY = 0
    BEAM_SEARCH = 1


@dataclasses.dataclass
class GreedyParams:
    best_of: int = 5


@dataclasses.dataclass
class BeamSearchParams:
    beam_size: int = 5
    patience: float = -1.0


@dataclasses.dataclass
class VadParams:
    """whisper_vad_default_params (include/whisper.h:192-199)."""
    threshold: float = 0.5
    min_speech_duration_ms: int = 250
    min_silence_duration_ms: int = 100
    max_speech_duration_s: float = float("inf")
    speech_pad_ms: int = 30
    samples_overlap: float = 0.1


@dataclasses.dataclass
class FullParams:
    strategy: SamplingStrategy = SamplingStrategy.GREEDY

    n_threads: int = 4                 # kept for API parity; XLA owns threading
    n_max_text_ctx: int = 16384
    offset_ms: int = 0
    duration_ms: int = 0

    translate: bool = False
    no_context: bool = True
    no_timestamps: bool = False
    single_segment: bool = False
    print_special: bool = False
    print_progress: bool = True
    print_realtime: bool = False
    print_timestamps: bool = True

    token_timestamps: bool = False
    thold_pt: float = 0.01
    thold_ptsum: float = 0.01
    max_len: int = 0
    split_on_word: bool = False
    max_tokens: int = 0

    debug_mode: bool = False
    audio_ctx: int = 0

    tdrz_enable: bool = False

    suppress_regex: str | None = None

    initial_prompt: str | None = None
    carry_initial_prompt: bool = False
    prompt_tokens: list[int] | None = None

    language: str | None = "en"
    detect_language: bool = False

    suppress_blank: bool = True
    suppress_nst: bool = False

    temperature: float = 0.0
    max_initial_ts: float = 1.0
    length_penalty: float = -1.0

    temperature_inc: float = 0.2
    entropy_thold: float = 2.4
    logprob_thold: float = -1.0
    no_speech_thold: float = 0.6

    greedy: GreedyParams = dataclasses.field(default_factory=GreedyParams)
    beam_search: BeamSearchParams = dataclasses.field(default_factory=BeamSearchParams)

    new_segment_callback: Callable | None = None
    progress_callback: Callable | None = None
    encoder_begin_callback: Callable | None = None
    abort_callback: Callable | None = None
    logits_filter_callback: Callable | None = None

    # GBNF grammar. Small grammars flatten to a token DFA applied inside
    # the fused device loop; a grammar whose automaton exceeds the DFA
    # budget (512 states / 100k transitions, grammar.build_token_dfa)
    # falls back to the HOST-stepped loop — identical output, but one
    # device round trip per token instead of per segment (an
    # order-of-magnitude RTF cliff on relayed links; see
    # decode/full.py::_grammar_device_ops).
    grammar_rules: object | None = None
    i_start_rule: int = 0
    grammar_penalty: float = 100.0

    # Reference-parity RNG sampling: draw beam candidates (and t>0 sampled
    # tokens) from std::discrete_distribution with per-decoder mt19937
    # streams, bit-faithful to whisper.cpp:6519-6592 / 6504-6508 (decoder
    # j seeded with j, whisper.cpp:3470+6929).  Default False keeps the
    # deterministic top-k expansion (equal-or-better search quality);
    # True reproduces the reference binary's beam transcripts byte-for-
    # byte and forces the host-stepped loop for beam windows.
    ref_sampling: bool = False

    vad: bool = False
    vad_model_path: str | None = None
    vad_params: VadParams = dataclasses.field(default_factory=VadParams)

    # TPU-specific: token timestamps via DTW on cross-attention (the
    # reference selects this with whisper_context_params.dtw_token_timestamps)
    dtw_token_timestamps: bool = False

    # TPU-specific: allow the fused on-device decode loops (greedy + beam).
    # False forces the host-stepped reference-exact path.
    use_device_loops: bool = True
    # TPU-specific: speculative greedy decoding lookahead (gamma). >0 with
    # a draft model attached (WhisperContext.set_draft / Transcriber
    # draft_model_path) routes t=0 greedy windows through
    # decode/device_speculative.py: the draft proposes gamma tokens, the
    # target verifies them in ONE multi-token pass — same output as plain
    # greedy, up to gamma+1 tokens per target weight-stream. 0 = off.
    speculative: int = 0
    # TPU-specific: decode up to this many 30 s windows per device dispatch
    # (greedy t=0 path; decode/device_windows.py). 0/1 disables the fused
    # window loop and decodes one window per dispatch.
    device_windows: int = 8
    # TPU-specific: store the per-window cross-attention K/V as int8 planes
    # (symmetric per-position scales; q8_0-level error). Halves the dominant
    # HBM stream of batched/beam decoding.
    cross_kv_int8: bool = False
    # TPU-specific: single-kernel per-token decoder (ops/decode_megakernel):
    # the whole layer stack + vocab projection in one pallas_call with
    # pipelined weight DMA and inline int8 dequant. None = auto (on for
    # quantized checkpoints whose decoder weights are int8 planes — same
    # numerics as the XLA dequant path, 385 vs 466 us/token on v5e);
    # True additionally enables it for dense bf16 weights (parity);
    # "int8" runtime-quantizes every decoder weight to int8 planes
    # (q8_0-level error, the W8 serving mode); "int4" to split-half int4
    # planes (q4_0-level error, the fastest W4 serving mode); False
    # disables.
    megakernel: bool | str | None = None

    @classmethod
    def greedy_default(cls) -> "FullParams":
        return cls(strategy=SamplingStrategy.GREEDY)

    @classmethod
    def beam_default(cls) -> "FullParams":
        return cls(strategy=SamplingStrategy.BEAM_SEARCH)
