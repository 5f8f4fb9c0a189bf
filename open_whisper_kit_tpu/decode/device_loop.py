"""Fused on-device greedy segment decoder.

The reference pays one graph launch + a device->host logits copy per token
(whisper.cpp:7493, 2954). Here the entire t=0 greedy segment decode — prompt
ingest, no-speech probability, the full logit rule-set, argmax sampling, the
sliding-window/EOT state machine (whisper.cpp:7355-7459) — runs inside a
single jitted lax.while_loop; the host gets back one small buffer bundle per
30 s window. This is the main single-chip RTF lever on TPU.

Used for the common t=0 single-decoder path; sampled/beam fallback paths use
the host loop in decode/full.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.whisper import model as M
from . import logit_rules as LR

CHUNK_FRAMES = 3000  # 100 * WHISPER_CHUNK_SIZE


class GrammarOps(NamedTuple):
    """Device-side grammar automaton (grammar.GrammarDFA as jnp operands +
    the penalty scalar); lets grammar-constrained decode stay in the fused
    loop instead of dropping to the host-stepped path."""
    allowed: jnp.ndarray   # (n_states, A) i32, pad = n_vocab
    nxt: jnp.ndarray       # (n_states, A) i32
    cand: jnp.ndarray      # (V,) f32
    skip: jnp.ndarray      # (V,) bool
    dead: jnp.ndarray      # i32 scalar
    penalty: jnp.ndarray   # f32 scalar

    @classmethod
    def from_dfa(cls, dfa, penalty: float) -> "GrammarOps":
        return cls(allowed=jnp.asarray(dfa.allowed),
                   nxt=jnp.asarray(dfa.nxt),
                   cand=jnp.asarray(dfa.cand),
                   skip=jnp.asarray(dfa.skip),
                   dead=jnp.int32(dfa.dead),
                   penalty=jnp.float32(penalty))


def grammar_mask_row(g: "GrammarOps", state: jnp.ndarray) -> jnp.ndarray:
    """(V,) additive penalty row for automaton state `state`."""
    row = g.cand * (-g.penalty)
    return row.at[g.allowed[state]].set(0.0, mode="drop")


def grammar_step(g: "GrammarOps", state: jnp.ndarray,
                 tok: jnp.ndarray) -> jnp.ndarray:
    """Next automaton state after sampling `tok` (see GrammarDFA.step)."""
    arow = g.allowed[state]
    hit = arow == tok
    nxt = jnp.where(jnp.any(hit), g.nxt[state][jnp.argmax(hit)], g.dead)
    return jnp.where(g.skip[tok], state, nxt).astype(jnp.int32)


class MachineState(NamedTuple):
    """Per-decoder token state machine variables (whisper.cpp:7355-7459);
    all scalars. Shared by the fused greedy loop and the speculative
    decoder (device_speculative.py); device_beam.py carries the
    beam-vectorized variant of the same logic."""
    last_was_ts: jnp.ndarray
    penult_was_ts: jnp.ndarray
    has_ts: jnp.ndarray
    seek_delta: jnp.ndarray
    result_len: jnp.ndarray


def machine_init() -> MachineState:
    return MachineState(last_was_ts=jnp.bool_(False),
                        penult_was_ts=jnp.bool_(True),
                        has_ts=jnp.bool_(False),
                        seek_delta=jnp.int32(CHUNK_FRAMES),
                        result_len=jnp.int32(0))


def machine_step(ms: MachineState, tok, i, *, token_beg, token_eot,
                 seek, seek_end, n_max: int, max_tokens: int,
                 single_segment: bool, no_timestamps: bool,
                 stub: bool = False):
    """One token through the whisper.cpp:7355-7459 state machine.

    `tok` was just sampled at segment-token index `i`. Returns
    (new MachineState, completed, failed). The rule inputs the NEXT
    step's logit filtering needs (LR.BeamState) are all in the returned
    state."""
    delta_min = 10
    is_ts_tok = tok >= token_beg
    gt_beg = tok > token_beg
    sd_new = 2 * (tok - token_beg)
    ts_fail = (gt_beg & ms.has_ts & (ms.seek_delta > sd_new)
               & (ms.result_len < i))
    take_ts = gt_beg & ~ts_fail
    seek_delta = jnp.where(take_ts, sd_new, ms.seek_delta)
    result_len = jnp.where(take_ts, i + 1, ms.result_len)
    has_ts = ms.has_ts | take_ts

    end_hit = ((tok == token_eot)
               | ((max_tokens > 0) & (i >= max_tokens))
               | (has_ts & (seek + seek_delta + delta_min >= seek_end)))
    end_hit = end_hit & ~ts_fail
    at_audio_end = seek + seek_delta + delta_min >= seek_end
    rl_zero = (result_len == 0) & jnp.bool_(not no_timestamps)
    end_fail = end_hit & rl_zero & ~at_audio_end
    result_len = jnp.where(end_hit & rl_zero & at_audio_end, i + 1,
                           result_len)
    end_ok = end_hit & ~end_fail
    if single_segment or no_timestamps:
        result_len = jnp.where(end_ok, i + 1, result_len)
        seek_delta = jnp.where(end_ok, CHUNK_FRAMES, seek_delta)
    completed = end_ok
    failed = ts_fail | end_fail

    if stub:  # weightless test checkpoints (whisper.cpp:7426-7431)
        seek_delta = jnp.where(~completed & ~failed, CHUNK_FRAMES,
                               seek_delta)
        completed = jnp.where(failed, completed, jnp.bool_(True))

    # repetition-loop bail-out at the last step (whisper.cpp:7440-7445)
    rep_fail = ((i == n_max - 1) & ~completed & ~failed
                & ((result_len == 0) | (seek_delta < CHUNK_FRAMES // 2)))
    failed = failed | rep_fail

    return MachineState(
        last_was_ts=is_ts_tok,
        penult_was_ts=ms.last_was_ts | (i == 0),
        has_ts=has_ts, seek_delta=seek_delta,
        result_len=result_len), completed, failed


class SegmentResult(NamedTuple):
    tokens: jnp.ndarray      # (n_max,) i32
    p: jnp.ndarray           # (n_max,) f32
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray         # (n_max,) i32
    n_tokens: jnp.ndarray    # i32, number sampled
    result_len: jnp.ndarray  # i32
    seek_delta: jnp.ndarray  # i32
    has_ts: jnp.ndarray      # bool
    completed: jnp.ndarray   # bool
    failed: jnp.ndarray      # bool
    sum_logprobs_all: jnp.ndarray  # f32
    no_speech_prob: jnp.ndarray    # f32


class _Carry(NamedTuple):
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    kv_head: jnp.ndarray
    i: jnp.ndarray
    logits: jnp.ndarray          # (1, V) raw logits of the pending position
    tokens: jnp.ndarray
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    sum_logprobs_all: jnp.ndarray
    last_was_ts: jnp.ndarray
    penult_was_ts: jnp.ndarray
    has_ts: jnp.ndarray
    seek_delta: jnp.ndarray
    result_len: jnp.ndarray
    completed: jnp.ndarray
    failed: jnp.ndarray
    gstate: jnp.ndarray          # i32 grammar-automaton state (0 if unused)


def segment_core(cfg: M.WhisperConfig, rc: LR.RuleConfig,
                 dec: M.Params, prompt: jnp.ndarray,
                 kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                 xk, xv,
                 base_mask: jnp.ndarray, init_mask: jnp.ndarray,
                 t_real, token_nosp, seek, seek_end, *, n_max: int,
                 max_tokens: int = 0, single_segment: bool = False,
                 no_timestamps: bool = False,
                 stub: bool = False,
                 mega=None, grammar=None, mesh=None) -> tuple["_Carry", jnp.ndarray]:
    """Traceable greedy segment decode; returns (final carry, no_speech_prob).

    Shared by the one-window `decode_segment` jit below and the K-windows
    loop in decode/device_windows.py.

    `mega` (ops.decode_megakernel.MegaParams or None): when set, per-token
    steps run through the single-kernel decoder (one pallas_call per token:
    all layers + logits, weights streamed via pipelined DMA). Prompt ingest
    stays on the XLA path (M>1 is MXU-efficient there); its head-major
    cache is converted once per window to the kernel's natural (T, S)
    layout. In mega mode the incoming kv_k/kv_v must be natural-layout
    (L, n_ctx, S) buffers; their content is ignored (fresh head-major
    ingest), only the carry shape matters."""
    token_beg = rc.token_beg
    token_eot = rc.token_eot

    # ---- prompt ingest (logits only at the last real position) ----
    if mega is not None:
        from ..ops import decode_megakernel as MK
        hm_k, hm_v = M.init_kv_cache(cfg, 1, dtype=kv_k.dtype)
        logits_all, hm_k, hm_v, _ = M.decode_impl(
            cfg, dec, prompt, hm_k, hm_v, jnp.int32(0), xk, xv,
            logits_pos=t_real - 1)
        kv_k, kv_v = MK.hm_to_natural(hm_k), MK.hm_to_natural(hm_v)
        xk_nat, xv_nat = MK.hm_to_natural(xk), MK.hm_to_natural(xv)
        mega_interpret = jax.devices()[0].platform == "cpu"
    else:
        logits_all, kv_k, kv_v, _ = M.decode_impl(
            cfg, dec, prompt, kv_k, kv_v, jnp.int32(0), xk, xv,
            logits_pos=t_real - 1)
    last_logits = logits_all[:, 0]  # (1, V)
    no_speech_prob = LR.compute_no_speech_prob(last_logits[0], token_nosp)

    carry = _Carry(
        kv_k=kv_k, kv_v=kv_v, kv_head=t_real, i=jnp.int32(0),
        logits=last_logits,
        tokens=jnp.zeros((n_max,), jnp.int32),
        p=jnp.zeros((n_max,), jnp.float32),
        plog=jnp.zeros((n_max,), jnp.float32),
        pt=jnp.zeros((n_max,), jnp.float32),
        ptsum=jnp.zeros((n_max,), jnp.float32),
        tid=jnp.zeros((n_max,), jnp.int32),
        sum_logprobs_all=jnp.float32(0.0),
        last_was_ts=jnp.bool_(False), penult_was_ts=jnp.bool_(True),
        has_ts=jnp.bool_(False), seek_delta=jnp.int32(CHUNK_FRAMES),
        result_len=jnp.int32(0),
        completed=jnp.bool_(False), failed=jnp.bool_(False),
        gstate=jnp.int32(0))

    def cond(c: _Carry):
        return (~c.completed) & (~c.failed) & (c.i < n_max)

    def body(c: _Carry) -> _Carry:
        i = c.i
        st = LR.BeamState(
            is_initial=(i == 0)[None],
            last_was_ts=c.last_was_ts[None],
            penult_was_ts=c.penult_was_ts[None],
            has_ts=c.has_ts[None],
            ts_min=jnp.where(c.has_ts, token_beg + c.seek_delta // 2, 0)[None])
        gmask = (grammar_mask_row(grammar, c.gstate)[None, :]
                 if grammar is not None else None)
        f_logits, f_logprobs, f_probs = LR.apply_rules(
            rc, c.logits, base_mask, init_mask, st, jnp.float32(0.0), gmask)
        tok, p, plog, pt, ptsum, tid = LR.sample_greedy(
            rc, f_logits, f_logprobs, f_probs)
        tok0 = tok[0]
        is_ts_tok = tok0 >= token_beg
        tid0 = jnp.where(is_ts_tok, tok0, tid[0])
        pt0 = jnp.where(is_ts_tok, p[0], pt[0])

        gstate = (grammar_step(grammar, c.gstate, tok0)
                  if grammar is not None else c.gstate)
        tokens = c.tokens.at[i].set(tok0)
        p_buf = c.p.at[i].set(p[0])
        plog_buf = c.plog.at[i].set(plog[0])
        pt_buf = c.pt.at[i].set(pt0)
        ptsum_buf = c.ptsum.at[i].set(ptsum[0])
        tid_buf = c.tid.at[i].set(tid0)
        sum_lp = c.sum_logprobs_all + plog[0]

        # ---- state machine (whisper.cpp:7355-7459) ----
        ms, completed, failed = machine_step(
            MachineState(c.last_was_ts, c.penult_was_ts, c.has_ts,
                         c.seek_delta, c.result_len),
            tok0, i, token_beg=token_beg, token_eot=token_eot,
            seek=seek, seek_end=seek_end, n_max=n_max,
            max_tokens=max_tokens, single_segment=single_segment,
            no_timestamps=no_timestamps, stub=stub)

        # ---- next decode step (result unused on the final iteration) ----
        if mega is not None:
            x0 = (dec["te"][tok]
                  + dec["pe"][c.kv_head][None, :]).astype(jnp.bfloat16)
            new_logits, kv_k, kv_v = MK.mega_decode_step(
                cfg, mega, x0, c.kv_k, c.kv_v, c.kv_head, xk_nat, xv_nat,
                interpret=mega_interpret, mesh=mesh)
        else:
            step_logits, kv_k, kv_v, _ = M.decode_impl(
                cfg, dec, tok[:, None], c.kv_k, c.kv_v, c.kv_head, xk, xv)
            new_logits = step_logits[:, 0]

        return _Carry(
            kv_k=kv_k, kv_v=kv_v, kv_head=c.kv_head + 1, i=i + 1,
            logits=new_logits,
            tokens=tokens, p=p_buf, plog=plog_buf, pt=pt_buf,
            ptsum=ptsum_buf, tid=tid_buf, sum_logprobs_all=sum_lp,
            last_was_ts=ms.last_was_ts,
            penult_was_ts=ms.penult_was_ts,
            has_ts=ms.has_ts, seek_delta=ms.seek_delta,
            result_len=ms.result_len,
            completed=completed, failed=failed, gstate=gstate)

    c = jax.lax.while_loop(cond, body, carry)
    return c, no_speech_prob


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rc", "n_max", "max_tokens", "single_segment",
                     "no_timestamps", "stub", "cache_dtype", "mesh"))
def decode_segment(cfg: M.WhisperConfig, rc: LR.RuleConfig,
                   dec: M.Params, prompt: jnp.ndarray,
                   xk: jnp.ndarray, xv: jnp.ndarray,
                   base_mask: jnp.ndarray, init_mask: jnp.ndarray,
                   scalars: jnp.ndarray, *, n_max: int,
                   max_tokens: int = 0, single_segment: bool = False,
                   no_timestamps: bool = False,
                   stub: bool = False, mega=None, grammar=None,
                   cache_dtype=jnp.bfloat16, mesh=None) -> SegmentResult:
    """Greedy-decode one window. prompt (1, T_pad) i32; `scalars` packs
    (t_real, token_nosp, seek, seek_end) into one i32 upload (each separate
    scalar transfer costs a full round-trip on relayed links).

    The self-KV carry is allocated IN-TRACE (cache_dtype): the window
    always starts from an empty cache, so passing zero buffers from the
    host only created donation candidates XLA could not always alias (the
    round-2 "donated buffers were not usable" warnings). With `mega` the
    carry is natural-layout (L, n_ctx, S)."""
    if mega is not None:
        kv_k = jnp.zeros((cfg.n_text_layer, cfg.n_text_ctx,
                          cfg.n_text_state), cache_dtype)
        kv_v = kv_k
    else:
        kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=cache_dtype)
    c, no_speech_prob = segment_core(
        cfg, rc, dec, prompt, kv_k, kv_v, xk, xv, base_mask, init_mask,
        scalars[0], scalars[1], scalars[2], scalars[3], n_max=n_max,
        max_tokens=max_tokens, single_segment=single_segment,
        no_timestamps=no_timestamps, stub=stub, mega=mega, grammar=grammar,
        mesh=mesh)

    return SegmentResult(
        tokens=c.tokens, p=c.p, plog=c.plog, pt=c.pt, ptsum=c.ptsum,
        tid=c.tid, n_tokens=c.i, result_len=c.result_len,
        seek_delta=c.seek_delta, has_ts=c.has_ts, completed=c.completed,
        failed=c.failed, sum_logprobs_all=c.sum_logprobs_all,
        no_speech_prob=no_speech_prob)


@jax.jit
def pack_segment_result(res: SegmentResult) -> jnp.ndarray:
    """Flatten the result bundle into ONE f32 array so the host pays a
    single device->host transfer (all values are exactly representable)."""
    scalars = jnp.stack([
        res.n_tokens.astype(jnp.float32),
        res.result_len.astype(jnp.float32),
        res.seek_delta.astype(jnp.float32),
        res.has_ts.astype(jnp.float32),
        res.completed.astype(jnp.float32),
        res.failed.astype(jnp.float32),
        res.sum_logprobs_all,
        res.no_speech_prob,
    ])
    return jnp.concatenate([
        res.tokens.astype(jnp.float32), res.p, res.plog, res.pt, res.ptsum,
        res.tid.astype(jnp.float32), scalars])


def unpack_segment_result(flat, n_max: int):
    """Inverse of pack_segment_result -> dict of numpy arrays/scalars."""
    import numpy as np
    flat = np.asarray(flat)
    f = lambda i: flat[i * n_max:(i + 1) * n_max]
    s = flat[6 * n_max:]
    return dict(
        tokens=f(0).astype(np.int64), p=f(1), plog=f(2), pt=f(3), ptsum=f(4),
        tid=f(5).astype(np.int64), n_tokens=int(s[0]), result_len=int(s[1]),
        seek_delta=int(s[2]), has_ts=bool(s[3]), completed=bool(s[4]),
        failed=bool(s[5]), sum_logprobs_all=float(s[6]),
        no_speech_prob=float(s[7]))
