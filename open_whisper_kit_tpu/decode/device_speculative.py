"""Fused on-device speculative greedy segment decoder (draft + verify).

A TPU-only capability with no reference analog: a small DRAFT whisper
model proposes `gamma` tokens autoregressively (cheap single-token
steps), and the TARGET model scores all of them in ONE (gamma+1)-token
decoder pass — the same MXU-friendly multi-token shape as prompt ingest
(models/whisper/model.py::decode_impl). Accepted prefixes advance the
output by up to gamma+1 tokens per target pass, so the per-token cost of
the big model's weight stream (the measured decode bottleneck,
docs/PERFORMANCE.md) is amortized by the acceptance rate.

Outputs are semantically IDENTICAL to the standard greedy loop
(decode/device_loop.py): every emitted token is the target's own
rule-filtered argmax, conditioned on the accepted prefix — the draft
only chooses which positions get batched together.  (Bit-equality holds
up to XLA reduction-order ties between the T=1 and T=gamma+1 decode
shapes.)  The per-token state machine is the SAME code as the greedy
loop's (device_loop.machine_step).

Everything — the draft proposal scan, the verify pass, the acceptance
scan replaying the full logit rule-set (decode/logit_rules.py) and the
reference's sliding-window state machine — runs inside one jitted
lax.while_loop; the host sees one buffer bundle per 30 s window,
exactly like decode_segment.

Round invariant: both KV caches contain every emitted token EXCEPT the
newest (`last_tok`), which each round ingests as the first token of its
verify pass (and of the draft scan).  After a round that accepted m
draft tokens and emitted m+1 (the +1 is the correction on mismatch, or
the free bonus token from the verify pass's last logits row on full
acceptance), both kv_heads advance by exactly the emission count.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.whisper import model as M
from . import logit_rules as LR
from .device_loop import (MachineState, SegmentResult, machine_init,
                          machine_step)


def _beam_state(ms: MachineState, token_beg, is_initial):
    return LR.BeamState(
        is_initial=is_initial[None],
        last_was_ts=ms.last_was_ts[None],
        penult_was_ts=ms.penult_was_ts[None],
        has_ts=ms.has_ts[None],
        ts_min=jnp.where(ms.has_ts, token_beg + ms.seek_delta // 2, 0)[None])


class _Carry(NamedTuple):
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    dkv_k: jnp.ndarray
    dkv_v: jnp.ndarray
    kv_head: jnp.ndarray      # shared by target and draft (same history)
    i: jnp.ndarray            # emitted tokens
    last_tok: jnp.ndarray     # newest emitted token, not yet ingested
    tokens: jnp.ndarray
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    sum_logprobs_all: jnp.ndarray
    ms: MachineState
    completed: jnp.ndarray
    failed: jnp.ndarray
    n_accepted: jnp.ndarray   # diagnostics: accepted draft tokens total
    n_rounds: jnp.ndarray     # target verify passes (for Timings.n_decode)


def _choose(rc, logits_row, base_mask, init_mask, st):
    """Greedy pick from one (V,) raw-logits row under the full rule-set."""
    f_logits, f_logprobs, f_probs = LR.apply_rules(
        rc, logits_row[None], base_mask, init_mask, st, jnp.float32(0.0),
        None)
    tok, p, plog, pt, ptsum, tid = LR.sample_greedy(
        rc, f_logits, f_logprobs, f_probs)
    return tok[0], p[0], plog[0], pt[0], ptsum[0], tid[0]


def speculative_core(
        cfg: M.WhisperConfig, dcfg: M.WhisperConfig, rc: LR.RuleConfig,
        dec: M.Params, ddec: M.Params, prompt: jnp.ndarray,
        xk, xv, dxk, dxv,
        base_mask: jnp.ndarray, init_mask: jnp.ndarray,
        t_real, token_nosp, seek, seek_end, *, n_max: int, gamma: int = 4,
        max_tokens: int = 0, single_segment: bool = False,
        no_timestamps: bool = False,
        cache_dtype=jnp.bfloat16, dmega=None, tmega=None
) -> tuple["_Carry", jnp.ndarray]:
    """Traceable speculative greedy decode of one window; returns
    (final _Carry, no_speech_prob).  Shared by the one-window
    `decode_segment_speculative` jit below and the K-windows loop in
    decode/device_windows.py (segment_core's speculative sibling).
    dec/ddec are the target/draft decoder params; xk/xv and dxk/dxv
    their cross-KV for this window.  Both models' KV caches are
    allocated IN-TRACE (fresh per window; the greedy decode_segment's
    donation lesson).

    `dmega` (ops.decode_megakernel.MegaParams or None): when set, the
    draft's single-token proposal steps run through the megakernel (one
    pallas_call per step, weights streamed once) instead of the XLA
    decoder — the dominant dispatch count of a round is the gamma+1
    draft steps, so this is where the kernel's weight-stream win lands.
    Draft numerics CANNOT change the transcript (every emitted token is
    the target's own argmax); a quantized dmega only shifts the
    acceptance rate.

    `tmega` (MegaParams or None): when set, the TARGET's (gamma+1)-token
    verify pass also runs through the megakernel — the gamma+1 rows ride
    the M=8 sublane rows with per-row causal masking, so each row's math
    is BIT-IDENTICAL to the single-token kernel at that position (the
    fused greedy loop's step): verify logits match mega greedy exactly,
    a stronger guarantee than the XLA T=1-vs-T=gamma+1 tie envelope.
    Without tmega the verify stays on XLA, whose (gamma+1)-token shape
    already amortizes the target weight stream.  Requires
    gamma + 1 <= 8 (the caller gates)."""
    token_beg = rc.token_beg

    step = functools.partial(
        machine_step, token_beg=token_beg, token_eot=rc.token_eot,
        seek=seek, seek_end=seek_end, n_max=n_max, max_tokens=max_tokens,
        single_segment=single_segment, no_timestamps=no_timestamps)

    pad = gamma + 4  # verify may ingest up to gamma+1 past the final token

    def _cache(c: M.WhisperConfig):
        shape = (c.n_text_layer, 1, c.n_text_head, c.n_text_ctx + pad,
                 c.d_text_head)
        return jnp.zeros(shape, cache_dtype), jnp.zeros(shape, cache_dtype)

    kv_k, kv_v = _cache(cfg)
    dkv_k, dkv_v = _cache(dcfg)

    # ---- prompt ingest, both models ----
    logits_all, kv_k, kv_v, _ = M.decode_impl(
        cfg, dec, prompt, kv_k, kv_v, jnp.int32(0), xk, xv,
        logits_pos=t_real - 1)
    last_logits = logits_all[0, 0]                       # (V,)
    no_speech_prob = LR.compute_no_speech_prob(last_logits, token_nosp)
    dlogits_all, dkv_k, dkv_v, _ = M.decode_impl(
        dcfg, ddec, prompt, dkv_k, dkv_v, jnp.int32(0), dxk, dxv,
        logits_pos=t_real - 1)
    del dlogits_all

    # megakernel layouts: converted ONCE per window, outside the loop —
    # the carries then stay in kernel layout end-to-end (reshapes inside
    # the loop would break the pallas_call's donation aliasing). Self-KV
    # carries are 16-row padded (DMA slabs; masked by n_valid); cross-KV
    # is NOT (the kernel pads internally with the true ta_valid mask —
    # operand zero-padding would leak phantom columns into the softmax).
    if dmega is not None or tmega is not None:
        from ..ops import decode_megakernel as MK
        mega_interpret = jax.devices()[0].platform == "cpu"
    if dmega is not None:
        dkv_k = MK.hm_to_natural(dkv_k, pad16=True)
        dkv_v = MK.hm_to_natural(dkv_v, pad16=True)
        dxk_n, dxv_n = MK.hm_to_natural(dxk), MK.hm_to_natural(dxv)
    if tmega is not None:
        kv_k = MK.hm_to_natural(kv_k, pad16=True)
        kv_v = MK.hm_to_natural(kv_v, pad16=True)
        xk_n, xv_n = MK.hm_to_natural(xk), MK.hm_to_natural(xv)

    # ---- prologue: the first token comes straight from the prompt logits
    ms0 = machine_init()
    st0 = _beam_state(ms0, token_beg, jnp.bool_(True))
    tok0, p0, plog0, pt0, ptsum0, tid0 = _choose(
        rc, last_logits, base_mask, init_mask, st0)
    is_ts0 = tok0 >= token_beg
    tid0 = jnp.where(is_ts0, tok0, tid0)
    pt0 = jnp.where(is_ts0, p0, pt0)
    ms1, completed0, failed0 = step(ms0, tok0, jnp.int32(0))

    nb = lambda: jnp.zeros((n_max,), jnp.float32)
    carry = _Carry(
        kv_k=kv_k, kv_v=kv_v, dkv_k=dkv_k, dkv_v=dkv_v, kv_head=t_real,
        i=jnp.int32(1), last_tok=tok0,
        tokens=jnp.zeros((n_max,), jnp.int32).at[0].set(tok0),
        p=nb().at[0].set(p0), plog=nb().at[0].set(plog0),
        pt=nb().at[0].set(pt0), ptsum=nb().at[0].set(ptsum0),
        tid=jnp.zeros((n_max,), jnp.int32).at[0].set(tid0),
        sum_logprobs_all=plog0, ms=ms1,
        completed=completed0, failed=failed0, n_accepted=jnp.int32(0),
        n_rounds=jnp.int32(0))

    def cond(c: _Carry):
        return (~c.completed) & (~c.failed) & (c.i < n_max)

    def body(c: _Carry) -> _Carry:
        # ---- draft proposal scan: gamma+1 single-token steps; the last
        # step only ingests g_{gamma-1} (its proposal is discarded) so the
        # draft cache always holds every proposed token ----
        def dstep(dc, _):
            dkv_k, dkv_v, head, tok_in, ms, idx = dc
            if dmega is not None:
                x0 = (ddec["te"][tok_in[None]]
                      + ddec["pe"][head][None, :]).astype(jnp.bfloat16)
                row, dkv_k, dkv_v = MK.mega_decode_step(
                    dcfg, dmega, x0, dkv_k, dkv_v, head, dxk_n, dxv_n,
                    interpret=mega_interpret)
                lg_row = row[0]
            else:
                lg, dkv_k, dkv_v, _ = M.decode_impl(
                    dcfg, ddec, tok_in[None, None], dkv_k, dkv_v, head,
                    dxk, dxv)
                lg_row = lg[0, 0]
            st = _beam_state(ms, token_beg, jnp.bool_(False))
            g, _, _, _, _, _ = _choose(rc, lg_row, base_mask, init_mask,
                                       st)
            ms2, _, _ = step(ms, g, idx)   # rule-input evolution only
            return (dkv_k, dkv_v, head + 1, g, ms2, idx + 1), g

        (dkv_k, dkv_v, dhead, dtok, _, _), gs = jax.lax.scan(
            dstep, (c.dkv_k, c.dkv_v, c.kv_head, c.last_tok, c.ms, c.i),
            None, length=gamma)                     # proposals g_0..g_{γ-1}
        # final draft step is INGEST-ONLY (its proposal would be
        # discarded): write g_{γ-1}'s K/V without the full-vocab rule
        # pass + argmax a proposing step would pay
        if dmega is not None:
            x0 = (ddec["te"][dtok[None]]
                  + ddec["pe"][dhead][None, :]).astype(jnp.bfloat16)
            _, dkv_k, dkv_v = MK.mega_decode_step(
                dcfg, dmega, x0, dkv_k, dkv_v, dhead, dxk_n, dxv_n,
                interpret=mega_interpret)
        else:
            _, dkv_k, dkv_v, _ = M.decode_impl(
                dcfg, ddec, dtok[None, None], dkv_k, dkv_v, dhead,
                dxk, dxv)

        # ---- target verify: ONE (gamma+1)-token pass ----
        vseq = jnp.concatenate([c.last_tok[None], gs])          # (γ+1,)
        if tmega is not None:
            x0 = (dec["te"][vseq]
                  + dec["pe"][c.kv_head + jnp.arange(gamma + 1)]
                  ).astype(jnp.bfloat16)                        # (γ+1, S)
            vrows, kv_k, kv_v = MK.mega_decode_step(
                cfg, tmega, x0, c.kv_k, c.kv_v, c.kv_head, xk_n, xv_n,
                interpret=mega_interpret)                       # (γ+1, V)
        else:
            vlogits, kv_k, kv_v, _ = M.decode_impl(
                cfg, dec, vseq[None], c.kv_k, c.kv_v, c.kv_head, xk, xv)
            vrows = vlogits[0]                      # (γ+1, V) f32

        # ---- acceptance scan: slot j emits index c.i+j from V_j ----
        def aslot(ac, inp):
            (active, ms, completed, failed, last_tok, n_emit, n_acc,
             bufs, sum_lp) = ac
            row, g, j = inp
            idx = c.i + j
            st = _beam_state(ms, token_beg, jnp.bool_(False))
            t, p, plog, pt, ptsum, tid = _choose(rc, row, base_mask,
                                                 init_mask, st)
            is_ts = t >= token_beg
            tid = jnp.where(is_ts, t, tid)
            pt = jnp.where(is_ts, p, pt)
            emit = active
            w = lambda b, v: jnp.where(
                emit, b.at[idx].set(v, mode="drop"), b)
            tokens_b, p_b, plog_b, pt_b, ptsum_b, tid_b = bufs
            bufs = (w(tokens_b, t), w(p_b, p), w(plog_b, plog),
                    w(pt_b, pt), w(ptsum_b, ptsum), w(tid_b, tid))
            ms2, comp_j, fail_j = step(ms, t, idx)
            match = (j < gamma) & (t == g)
            cont = emit & match & ~comp_j & ~fail_j & (idx + 1 < n_max)
            return ((cont,
                     jax.tree.map(lambda a, b: jnp.where(emit, b, a), ms,
                                  ms2),
                     completed | (emit & comp_j), failed | (emit & fail_j),
                     jnp.where(emit, t, last_tok),
                     n_emit + emit.astype(jnp.int32),
                     # accepted = draft proposal emitted verbatim — even
                     # when that token also ends the segment
                     n_acc + (emit & match).astype(jnp.int32),
                     bufs, sum_lp + jnp.where(emit, plog, 0.0)), None)

        bufs0 = (c.tokens, c.p, c.plog, c.pt, c.ptsum, c.tid)
        (_, ms, completed, failed, last_tok, n_emit, n_acc, bufs,
         sum_lp), _ = jax.lax.scan(
            aslot,
            (jnp.bool_(True), c.ms, jnp.bool_(False), jnp.bool_(False),
             c.last_tok, jnp.int32(0), jnp.int32(0), bufs0,
             c.sum_logprobs_all),
            (vrows, jnp.concatenate([gs, gs[-1:]]),
             jnp.arange(gamma + 1)))

        tokens_b, p_b, plog_b, pt_b, ptsum_b, tid_b = bufs
        return _Carry(
            kv_k=kv_k, kv_v=kv_v, dkv_k=dkv_k, dkv_v=dkv_v,
            kv_head=c.kv_head + n_emit, i=c.i + n_emit, last_tok=last_tok,
            tokens=tokens_b, p=p_b, plog=plog_b, pt=pt_b, ptsum=ptsum_b,
            tid=tid_b, sum_logprobs_all=sum_lp, ms=ms,
            completed=completed, failed=failed,
            n_accepted=c.n_accepted + n_acc,
            n_rounds=c.n_rounds + 1)

    c = jax.lax.while_loop(cond, body, carry)
    return c, no_speech_prob


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "rc", "n_max", "gamma", "max_tokens",
                     "single_segment", "no_timestamps", "cache_dtype"))
def decode_segment_speculative(
        cfg: M.WhisperConfig, dcfg: M.WhisperConfig, rc: LR.RuleConfig,
        dec: M.Params, ddec: M.Params, prompt: jnp.ndarray,
        xk, xv, dxk, dxv,
        base_mask: jnp.ndarray, init_mask: jnp.ndarray,
        scalars: jnp.ndarray, *, n_max: int, gamma: int = 4,
        max_tokens: int = 0, single_segment: bool = False,
        no_timestamps: bool = False,
        cache_dtype=jnp.bfloat16, dmega=None, tmega=None
) -> tuple[SegmentResult, jnp.ndarray, jnp.ndarray]:
    """Speculative greedy decode of one window; returns
    (SegmentResult, n_accepted, n_rounds).  `scalars` packs (t_real,
    token_nosp, seek, seek_end) like decode_segment.  See
    speculative_core for the algorithm and the dmega/tmega knobs."""
    c, no_speech_prob = speculative_core(
        cfg, dcfg, rc, dec, ddec, prompt, xk, xv, dxk, dxv,
        base_mask, init_mask, scalars[0], scalars[1], scalars[2],
        scalars[3], n_max=n_max, gamma=gamma, max_tokens=max_tokens,
        single_segment=single_segment, no_timestamps=no_timestamps,
        cache_dtype=cache_dtype, dmega=dmega, tmega=tmega)

    res = SegmentResult(
        tokens=c.tokens, p=c.p, plog=c.plog, pt=c.pt, ptsum=c.ptsum,
        tid=c.tid, n_tokens=c.i, result_len=c.ms.result_len,
        seek_delta=c.ms.seek_delta, has_ts=c.ms.has_ts,
        completed=c.completed, failed=c.failed,
        sum_logprobs_all=c.sum_logprobs_all,
        no_speech_prob=no_speech_prob)
    return res, c.n_accepted, c.n_rounds
