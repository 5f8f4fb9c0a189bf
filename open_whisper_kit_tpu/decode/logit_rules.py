"""Whisper decode-time logit rules + sampling, vectorized over beams.

Faithful re-derivation of whisper_process_logits (src/whisper.cpp:6177-6445)
and whisper_sample_token / _topk (:6460-6592) as pure jnp over a (B, V)
logits batch, so the whole rule-set can run inside jit (and later inside an
on-device decode loop).

Static (per-run) suppression sets are precomputed into additive masks;
dynamic rules (timestamp pairing, monotonicity, logsumexp timestamp-vs-text)
are driven by small per-beam state vectors.
"""

from __future__ import annotations

import dataclasses
import functools
import re

import jax
import jax.numpy as jnp
import numpy as np

from .tokenizer import NON_SPEECH_TOKENS, WhisperVocab

NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class RuleConfig:
    """Static rule configuration (hashable; jit static arg)."""
    n_vocab: int
    token_eot: int
    token_beg: int
    no_timestamps: bool = False


def build_static_masks(vocab: WhisperVocab, *, suppress_blank: bool = True,
                       no_timestamps: bool = False, tdrz_enable: bool = False,
                       suppress_nst: bool = False,
                       suppress_regex: str | None = None,
                       max_initial_ts: float = 1.0,
                       n_audio_ctx: int = 1500) -> tuple[np.ndarray, np.ndarray]:
    """Return (base_mask, initial_mask), each (V,) f32 of {0, -inf}.

    base_mask applies at every step; initial_mask additionally at the first
    sampled token of a segment (src/whisper.cpp:6214-6322).
    """
    V = vocab.n_vocab
    base = np.zeros(V, np.float32)
    init = np.zeros(V, np.float32)

    def sup(mask, tid):
        if 0 <= tid < V:
            mask[tid] = NEG_INF

    # blank suppression at segment start
    if suppress_blank:
        sup(init, vocab.token_eot)
        sp = vocab.token_to_id.get(b" ")
        if sp is not None:
            sup(init, sp)

    sup(base, vocab.token_not)
    if no_timestamps:
        base[vocab.token_beg:] = NEG_INF

    sup(base, vocab.token_sot)
    sup(base, vocab.token_nosp)
    if not tdrz_enable:
        sup(base, vocab.token_solm)
    sup(base, vocab.token_translate)
    sup(base, vocab.token_transcribe)
    sup(base, vocab.token_prev)

    # language tokens
    for i in range(vocab.num_languages):
        sup(base, vocab.token_lang(i))

    if suppress_regex:
        pat = re.compile(suppress_regex)
        for tok, tid in vocab.token_to_id.items():
            try:
                s = tok.decode("utf-8")
            except UnicodeDecodeError:
                continue
            if pat.fullmatch(s):
                sup(base, tid)

    if suppress_nst:
        for token in NON_SPEECH_TOKENS:
            for s in (token, " " + token):
                tid = vocab.token_to_id.get(s.encode("utf-8"))
                if tid is not None:
                    sup(base, tid)
        for s in (" -", " '"):
            tid = vocab.token_to_id.get(s.encode("utf-8"))
            if tid is not None:
                sup(base, tid)

    # initial timestamp cap (src/whisper.cpp:6317-6325); precision = 30/1500 s
    if max_initial_ts > 0:
        precision = 30.0 / n_audio_ctx
        tid0 = int(round(max_initial_ts / precision))
        init[vocab.token_beg + tid0 + 1:] = NEG_INF

    return base, init


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamState:
    """Per-beam dynamic rule inputs, all shape (B,)."""
    is_initial: jnp.ndarray       # bool: no sampled tokens yet this segment
    last_was_ts: jnp.ndarray      # bool: last sampled token >= token_beg
    penult_was_ts: jnp.ndarray    # bool: <2 tokens or tokens[-2] >= token_beg
    has_ts: jnp.ndarray           # bool: a timestamp was accepted
    ts_min: jnp.ndarray           # i32: token_beg + seek_delta/2 floor when has_ts


@functools.partial(jax.jit, static_argnames=("rc",))
def apply_rules(rc: RuleConfig, logits: jnp.ndarray, base_mask: jnp.ndarray,
                init_mask: jnp.ndarray, st: BeamState,
                temperature: jnp.ndarray,
                grammar_mask: jnp.ndarray | None = None):
    """(B,V) raw logits -> (filtered logits, logprobs, probs), f32.

    Order of operations matches whisper_process_logits exactly.
    `grammar_mask` (B,V): additive penalties applied only when the
    timestamp-force rule did not fire, with logprobs recomputed
    (whisper.cpp:6365-6388).
    """
    V = rc.n_vocab
    logits = logits.astype(jnp.float32)
    logits = jnp.where(temperature > 0.0, logits / jnp.maximum(temperature, 1e-8), logits)

    ids = jnp.arange(V)[None, :]              # (1, V)
    logits = logits + base_mask[None, :]
    logits = jnp.where(st.is_initial[:, None], logits + init_mask[None, :], logits)

    is_ts = ids >= rc.token_beg               # (1, V)
    # timestamps appear in pairs (whisper.cpp:6292-6312)
    both = (st.last_was_ts & st.penult_was_ts)[:, None]
    only_last = (st.last_was_ts & ~st.penult_was_ts)[:, None]
    logits = jnp.where(both & is_ts, NEG_INF, logits)
    logits = jnp.where(only_last & (ids < rc.token_eot), NEG_INF, logits)

    # monotonic timestamps (whisper.cpp:6327-6334)
    mono = st.has_ts[:, None] & is_ts & (ids < st.ts_min[:, None])
    logits = jnp.where(mono, NEG_INF, logits)

    logprobs = jax.nn.log_softmax(logits, axis=-1)

    # timestamp-vs-text logsumexp rule (whisper.cpp:6340-6361)
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts, logprobs, NEG_INF), axis=-1)
    max_text = jnp.max(jnp.where(is_ts, NEG_INF, logprobs), axis=-1)
    force_ts = (ts_logprob > max_text)[:, None]
    logits = jnp.where(force_ts & ~is_ts, NEG_INF, logits)
    logprobs = jnp.where(force_ts & ~is_ts, NEG_INF, logprobs)

    if grammar_mask is not None:
        g_logits = logits + jnp.where(force_ts, 0.0, grammar_mask)
        g_logprobs = jax.nn.log_softmax(g_logits, axis=-1)
        logits = g_logits
        # force_ts rows keep their unrenormalized logprobs
        logprobs = jnp.where(force_ts, logprobs, g_logprobs)

    probs = jnp.where(jnp.isneginf(logits), 0.0, jnp.exp(logprobs))
    return logits, logprobs, probs


@functools.partial(jax.jit, static_argnames=("rc",))
def ts_aggregates(rc: RuleConfig, probs: jnp.ndarray):
    """(pt, ptsum, tid) per beam (whisper_sample_token, whisper.cpp:6476-6492)."""
    p_ts = probs[:, rc.token_beg:]
    ptsum = jnp.sum(p_ts, axis=-1)
    max_ts = jnp.max(p_ts, axis=-1)
    tid = rc.token_beg + jnp.argmax(p_ts, axis=-1)
    pt = max_ts / (ptsum + 1e-10)
    return pt, ptsum, tid


@functools.partial(jax.jit, static_argnames=("rc",))
def sample_greedy(rc: RuleConfig, logits, logprobs, probs):
    """argmax sample + timestamp aggregates -> small per-beam arrays."""
    tok = jnp.argmax(probs, axis=-1)
    b = jnp.arange(tok.shape[0])
    pt, ptsum, tid = ts_aggregates(rc, probs)
    return tok, probs[b, tok], logprobs[b, tok], pt, ptsum, tid


@functools.partial(jax.jit, static_argnames=("rc",))
def sample_multinomial(rc: RuleConfig, key, logits, logprobs, probs):
    B = logits.shape[0]
    tok = jax.random.categorical(key, jnp.where(jnp.isneginf(logits), NEG_INF, logprobs))
    b = jnp.arange(B)
    pt, ptsum, tid = ts_aggregates(rc, probs)
    return tok, probs[b, tok], logprobs[b, tok], pt, ptsum, tid


@functools.partial(jax.jit, static_argnames=("rc", "k"))
def sample_topk(rc: RuleConfig, k: int, logits, logprobs, probs):
    """Deterministic top-k beam candidates per beam.

    Note: the reference's whisper_sample_token_topk (whisper.cpp:6519-6592)
    draws k *samples* from the distribution with a per-decoder mt19937; the
    deterministic top-k used here is the standard beam-search expansion and
    gives equal-or-better search quality without RNG-state parity problems.
    """
    top_lp, top_id = jax.lax.top_k(logprobs, k)
    b = jnp.arange(logits.shape[0])[:, None]
    top_p = probs[b, top_id]
    pt, ptsum, tid = ts_aggregates(rc, probs)
    return top_id, top_p, top_lp, pt, ptsum, tid


@jax.jit
def compute_no_speech_prob(logits: jnp.ndarray, token_nosp: jnp.ndarray):
    """softmax prob of the no-speech token from *unfiltered* logits
    (whisper.cpp:7187-7196); logits (V,)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return jnp.exp(lp[token_nosp])
