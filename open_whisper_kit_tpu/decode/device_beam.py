"""Fused on-device beam-search segment decoder.

Device counterpart of the reference's beam loop (whisper.cpp:7301-7352 merge
+ :7355-7459 state machine): every token step expands each live beam into
`beam_size` top-k candidates, multi-key-sorts the pool by (sum_logprobs
desc, source-beam asc), assigns winners to the live beam slots skipping
duplicate sequences, and gathers KV/state by source beam — all inside one
jitted lax.while_loop.

Duplicate detection uses a per-beam rolling hash of the token sequence (two
31-bit mixes) instead of the reference's exact token-by-token comparison:
collisions are ~2^-60, and candidate expansion is deterministic top-k (see
logit_rules.sample_topk for the sampling-vs-top-k note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.whisper import model as M
from . import logit_rules as LR

CHUNK_FRAMES = 3000
DELTA_MIN = 10
_H1, _H2 = 1000003, 0x9E3779B1


class BeamSegmentResult(NamedTuple):
    tokens: jnp.ndarray       # (B, n_max)
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    n_tokens: jnp.ndarray     # scalar: steps taken
    sum_lp: jnp.ndarray       # (B,) sum_logprobs_all
    result_len: jnp.ndarray   # (B,)
    n_valid: jnp.ndarray      # (B,) tokens appended before the beam ended --
                              # a FAILED beam's full sequence (the reference
                              # only resizes to result_len for non-failed
                              # decoders, whisper.cpp:7556; a failed best
                              # decoder emits its whole stream, :7615)
    seek_delta: jnp.ndarray
    has_ts: jnp.ndarray
    completed: jnp.ndarray
    failed: jnp.ndarray
    no_speech_prob: jnp.ndarray


class _Carry(NamedTuple):
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    origin: jnp.ndarray       # (B, n_ctx) KV lineage table (mega path)
    i: jnp.ndarray
    logits: jnp.ndarray       # (B, V)
    tokens: jnp.ndarray       # (B, n_max)
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    seq_hash1: jnp.ndarray    # (B,) rolling sequence hashes
    seq_hash2: jnp.ndarray
    sum_lp: jnp.ndarray
    last_was_ts: jnp.ndarray
    penult_was_ts: jnp.ndarray
    has_ts: jnp.ndarray
    seek_delta: jnp.ndarray
    result_len: jnp.ndarray
    n_valid: jnp.ndarray
    completed: jnp.ndarray
    failed: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rc", "beam_size", "n_max", "max_tokens",
                     "single_segment", "no_timestamps", "stub",
                     "cache_dtype", "mesh"))
def decode_segment_beam(cfg: M.WhisperConfig, rc: LR.RuleConfig,
                        dec: M.Params, prompt: jnp.ndarray,
                        xk, xv,
                        base_mask, init_mask, scalars,
                        *, beam_size: int, n_max: int, max_tokens: int = 0,
                        single_segment: bool = False,
                        no_timestamps: bool = False,
                        stub: bool = False, mega=None,
                        cache_dtype=jnp.bfloat16, mesh=None) -> BeamSegmentResult:
    """Beam-search one window. prompt (1, Tp);
    xk/xv (L, B, H, Ta, dh) with identical rows (broadcast cross-KV).
    `scalars` packs (t_real, token_nosp, seek, seek_end) i32.

    The per-beam self-KV carries are allocated IN-TRACE (cache_dtype) so
    the while-loop carry updates in place with no host-side buffer whose
    donation XLA could fail to use (the round-2 "donated buffers were not
    usable" warnings).

    `mega` (ops.decode_megakernel.MegaParams or None): when set, the
    per-token step runs all B beams through ONE megakernel launch (one
    weight stream for the whole beam set; cross-KV shared in-kernel, so
    xk/xv beam broadcast is skipped); the carry is then flat time-major
    (L, n_ctx*B, S)."""
    t_real, token_nosp, seek, seek_end = (scalars[0], scalars[1],
                                          scalars[2], scalars[3])
    B = beam_size
    token_beg, token_eot = rc.token_beg, rc.token_eot

    # ---- prompt ingest ----
    Tp = prompt.shape[1]
    if mega is not None:
        from ..ops import decode_megakernel as MK
        S = cfg.n_text_state
        L = cfg.n_text_layer
        n_ctx = cfg.n_text_ctx

        def to_nat_b(a):      # (L, B, H, T, dh) head-major -> (L, B, T, S)
            return jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(
                L, a.shape[1], a.shape[3], S)

        def to_tm(a):         # (L, B, H, T, dh) -> TIME-MAJOR (L, T, B, S)
            return jnp.transpose(a, (0, 3, 1, 2, 4)).reshape(
                L, a.shape[3], a.shape[1], S)

        # The origin table lets every beam attend cache SLOT 0's prompt
        # rows, so the prompt is ingested ONCE (B=1), not per beam, and
        # the per-beam caches start as zero-filled slots 1..B-1
        hm_k, hm_v = M.init_kv_cache(cfg, 1, dtype=cache_dtype)
        logits1, hm_k, hm_v, _ = M.decode_impl(
            cfg, dec, prompt, hm_k, hm_v,
            jnp.int32(0), xk[:, :1], xv[:, :1], logits_pos=t_real - 1)
        tm1_k, tm1_v = to_tm(hm_k), to_tm(hm_v)       # (L, n_ctx, 1, S)
        # flat (L, n_ctx*B, S): row t*B + b (one reshape per WINDOW; the
        # per-step carry then aliases with no reshape)
        kv_k = jnp.pad(tm1_k, ((0, 0), (0, 0), (0, B - 1), (0, 0))
                       ).reshape(L, n_ctx * B, S)
        kv_v = jnp.pad(tm1_v, ((0, 0), (0, 0), (0, B - 1), (0, 0))
                       ).reshape(L, n_ctx * B, S)
        origin0 = jnp.where(
            jnp.arange(n_ctx)[None, :] < t_real, jnp.int32(0),
            jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                             (B, n_ctx)))
        logits_all = jnp.broadcast_to(logits1, (B,) + logits1.shape[1:])
        xk_nat = to_nat_b(xk[:, 0:1])[:, 0]     # shared cross (L, Ta, S)
        xv_nat = to_nat_b(xv[:, 0:1])[:, 0]
        mega_interpret = jax.devices()[0].platform == "cpu"
    else:
        kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=cache_dtype)
        logits_all, kv_k, kv_v, _ = M.decode_impl(
            cfg, dec, jnp.broadcast_to(prompt, (B, Tp)), kv_k, kv_v,
            jnp.int32(0), xk, xv, logits_pos=t_real - 1)
        origin0 = jnp.zeros((1, 1), jnp.int32)  # unused off the mega path
    last_logits = logits_all[:, 0]    # (B, V)
    nsp = LR.compute_no_speech_prob(last_logits[0], token_nosp)

    carry = _Carry(
        kv_k=kv_k, kv_v=kv_v, origin=origin0, i=jnp.int32(0),
        logits=last_logits,
        tokens=jnp.zeros((B, n_max), jnp.int32),
        p=jnp.zeros((B, n_max), jnp.float32),
        plog=jnp.zeros((B, n_max), jnp.float32),
        pt=jnp.zeros((B, n_max), jnp.float32),
        ptsum=jnp.zeros((B, n_max), jnp.float32),
        tid=jnp.zeros((B, n_max), jnp.int32),
        seq_hash1=jnp.zeros((B,), jnp.uint32),
        seq_hash2=jnp.zeros((B,), jnp.uint32),
        sum_lp=jnp.zeros((B,), jnp.float32),
        last_was_ts=jnp.zeros((B,), bool),
        penult_was_ts=jnp.ones((B,), bool),
        has_ts=jnp.zeros((B,), bool),
        seek_delta=jnp.full((B,), CHUNK_FRAMES, jnp.int32),
        result_len=jnp.zeros((B,), jnp.int32),
        n_valid=jnp.zeros((B,), jnp.int32),
        completed=jnp.zeros((B,), bool), failed=jnp.zeros((B,), bool))

    def cond(c: _Carry):
        return jnp.any(~c.completed & ~c.failed) & (c.i < n_max)

    def body(c: _Carry) -> _Carry:
        i = c.i
        active = ~c.completed & ~c.failed               # (B,)
        st = LR.BeamState(
            is_initial=jnp.full((B,), i == 0),
            last_was_ts=c.last_was_ts, penult_was_ts=c.penult_was_ts,
            has_ts=c.has_ts,
            ts_min=jnp.where(c.has_ts, token_beg + c.seek_delta // 2, 0))
        f_logits, f_logprobs, f_probs = LR.apply_rules(
            rc, c.logits, base_mask, init_mask, st, jnp.float32(0.0))
        top_id, top_p, top_lp, pt_b, pts_b, tid_b = LR.sample_topk(
            rc, B, f_logits, f_logprobs, f_probs)       # (B, B) each

        # ---- candidate pool + multi-key sort ----
        cand_score = (c.sum_lp[:, None] + top_lp).reshape(-1)
        src_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), B)
        cand_id = top_id.reshape(-1).astype(jnp.int32)
        cand_lp = top_lp.reshape(-1)
        cand_p = top_p.reshape(-1)
        # inactive sources contribute nothing
        cand_score = jnp.where(active[src_idx], cand_score, -jnp.inf)

        neg_score = -cand_score
        (neg_s, srcs, ids, lps, ps) = jax.lax.sort(
            (neg_score, src_idx, cand_id, cand_lp, cand_p), num_keys=2)

        uid = ids.astype(jnp.uint32)
        sig1 = c.seq_hash1[srcs] * jnp.uint32(_H1) + uid
        sig2 = c.seq_hash2[srcs] * jnp.uint32(_H2) + uid

        # ---- sequential assignment with dedupe (whisper.cpp:7322-7341) ----
        n_active = jnp.sum(active.astype(jnp.int32))
        # slot s -> beam index of the s-th active beam
        order = jnp.argsort(jnp.where(active, 0, 1), stable=True)

        def assign(carry_a, e):
            n_done, csig1, csig2 = carry_a
            s1, s2, src, tok, lp, pp, negs = e
            dup = jnp.any((csig1 == s1) & (csig2 == s2)) & (i > 0)
            take = (~dup) & (n_done < n_active) & jnp.isfinite(negs)
            csig1 = jnp.where(take, csig1.at[n_done].set(s1), csig1)
            csig2 = jnp.where(take, csig2.at[n_done].set(s2), csig2)
            out = (jnp.where(take, n_done, -1), src, tok, lp, pp)
            return (n_done + take.astype(jnp.int32), csig1, csig2), out

        init_sigs = (jnp.int32(0),
                     jnp.full((B,), jnp.uint32(0xFFFFFFFF)),
                     jnp.full((B,), jnp.uint32(0xFFFFFFFE)))
        (_, _, _), (slot, a_src, a_tok, a_lp, a_p) = jax.lax.scan(
            assign, init_sigs, (sig1, sig2, srcs, ids, lps, ps, neg_s),
            unroll=True)

        # scatter assignments: beam_of_slot[s] = order[s]
        new_src = jnp.arange(B, dtype=jnp.int32)     # inactive: keep self
        new_tok = jnp.zeros((B,), jnp.int32)
        new_lp = jnp.zeros((B,), jnp.float32)
        new_p = jnp.zeros((B,), jnp.float32)
        taken = slot >= 0
        beam_target = jnp.where(taken, order[jnp.clip(slot, 0, B - 1)], B)
        new_src = new_src.at[beam_target].set(a_src, mode="drop")
        new_tok = new_tok.at[beam_target].set(a_tok, mode="drop")
        new_lp = new_lp.at[beam_target].set(a_lp, mode="drop")
        new_p = new_p.at[beam_target].set(a_p, mode="drop")

        # ---- gather state by source beam ----
        def g(x):
            return x[new_src]

        if mega is not None:
            # NO physical KV reorder: inherit lineage rows, claim slot b
            # for this step's write (beam_attn_bias docstring)
            kv_k2, kv_v2 = c.kv_k, c.kv_v
            origin2 = jnp.take(c.origin, new_src, axis=0).at[
                :, t_real + i].set(jnp.arange(B, dtype=jnp.int32))
        else:
            kv_k2 = jnp.take(c.kv_k, new_src, axis=1)
            kv_v2 = jnp.take(c.kv_v, new_src, axis=1)
            origin2 = c.origin
        tokens = g(c.tokens)
        p_buf = g(c.p)
        plog_buf = g(c.plog)
        pt_buf = g(c.pt)
        pts_buf = g(c.ptsum)
        tid_buf = g(c.tid)
        sum_lp = g(c.sum_lp)
        last_was = g(c.last_was_ts)
        has_ts = g(c.has_ts)
        seek_delta = g(c.seek_delta)
        result_len = g(c.result_len)
        h1 = g(c.seq_hash1)
        h2 = g(c.seq_hash2)

        # per-source timestamp aggregates follow the source beam
        pt_src = g(pt_b)
        pts_src = g(pts_b)
        tid_src = g(tid_b)

        is_ts_tok = new_tok >= token_beg
        tid_new = jnp.where(is_ts_tok, new_tok, tid_src)
        pt_new = jnp.where(is_ts_tok, new_p, pt_src)

        # append the new token on active beams
        wr = active
        tokens = tokens.at[:, i].set(jnp.where(wr, new_tok, tokens[:, i]))
        p_buf = p_buf.at[:, i].set(jnp.where(wr, new_p, p_buf[:, i]))
        plog_buf = plog_buf.at[:, i].set(jnp.where(wr, new_lp, plog_buf[:, i]))
        pt_buf = pt_buf.at[:, i].set(jnp.where(wr, pt_new, pt_buf[:, i]))
        pts_buf = pts_buf.at[:, i].set(jnp.where(wr, pts_src, pts_buf[:, i]))
        tid_buf = tid_buf.at[:, i].set(jnp.where(wr, tid_new, tid_buf[:, i]))
        sum_lp = jnp.where(wr, sum_lp + new_lp, sum_lp)
        n_valid = jnp.where(wr, i + 1, g(c.n_valid))
        h1 = jnp.where(wr, h1 * jnp.uint32(_H1) + new_tok.astype(jnp.uint32), h1)
        h2 = jnp.where(wr, h2 * jnp.uint32(_H2) + new_tok.astype(jnp.uint32), h2)

        # ---- state machine (whisper.cpp:7355-7459) ----
        gt_beg = (new_tok > token_beg) & wr
        sd_new = 2 * (new_tok - token_beg)
        ts_fail = gt_beg & has_ts & (seek_delta > sd_new) & (result_len < i)
        take_ts = gt_beg & ~ts_fail
        seek_delta = jnp.where(take_ts, sd_new, seek_delta)
        result_len = jnp.where(take_ts, i + 1, result_len)
        has_ts = has_ts | take_ts

        at_end = seek + seek_delta + DELTA_MIN >= seek_end
        end_hit = wr & ~ts_fail & (
            (new_tok == token_eot)
            | ((max_tokens > 0) & (i >= max_tokens))
            | (has_ts & at_end))
        rl_zero = (result_len == 0) & (not no_timestamps)
        end_fail = end_hit & rl_zero & ~at_end
        result_len = jnp.where(end_hit & rl_zero & at_end, i + 1, result_len)
        end_ok = end_hit & ~end_fail
        if single_segment or no_timestamps:
            result_len = jnp.where(end_ok, i + 1, result_len)
            seek_delta = jnp.where(end_ok, CHUNK_FRAMES, seek_delta)
        completed = c.completed | end_ok
        failed = c.failed | ts_fail | end_fail

        if stub:
            newly = wr & ~completed & ~failed
            seek_delta = jnp.where(newly, CHUNK_FRAMES, seek_delta)
            completed = completed | newly

        rep_fail = ((i == n_max - 1) & wr & ~completed & ~failed
                    & ((result_len == 0) | (seek_delta < CHUNK_FRAMES // 2)))
        failed = failed | rep_fail

        if mega is not None:
            x0 = (dec["te"][new_tok]
                  + dec["pe"][t_real + i][None, :]).astype(jnp.bfloat16)
            bias = MK.beam_attn_bias(origin2, t_real + i, cfg.n_text_ctx)
            new_logits, kv_k2, kv_v2 = MK.mega_decode_step_beam(
                cfg, mega, x0, kv_k2, kv_v2, t_real + i, xk_nat, xv_nat,
                attn_bias=bias, interpret=mega_interpret, mesh=mesh)
        else:
            step_logits, kv_k2, kv_v2, _ = M.decode_impl(
                cfg, dec, new_tok[:, None], kv_k2, kv_v2, t_real + i, xk, xv)
            new_logits = step_logits[:, 0]

        return _Carry(
            kv_k=kv_k2, kv_v=kv_v2, origin=origin2, i=i + 1,
            logits=new_logits,
            tokens=tokens, p=p_buf, plog=plog_buf, pt=pt_buf, ptsum=pts_buf,
            tid=tid_buf, seq_hash1=h1, seq_hash2=h2, sum_lp=sum_lp,
            last_was_ts=jnp.where(wr, is_ts_tok, last_was),
            penult_was_ts=jnp.where(wr, last_was | (i == 0), c.penult_was_ts[new_src]),
            has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
            n_valid=n_valid, completed=completed, failed=failed)

    c = jax.lax.while_loop(cond, body, carry)
    return BeamSegmentResult(
        tokens=c.tokens, p=c.p, plog=c.plog, pt=c.pt, ptsum=c.ptsum,
        tid=c.tid, n_tokens=c.i, sum_lp=c.sum_lp, result_len=c.result_len,
        n_valid=c.n_valid, seek_delta=c.seek_delta, has_ts=c.has_ts,
        completed=c.completed, failed=c.failed, no_speech_prob=nsp)


@jax.jit
def pack_beam_result(res: BeamSegmentResult) -> jnp.ndarray:
    """One-transfer flattening of the beam result bundle (see
    device_loop.pack_segment_result for why)."""
    B = res.tokens.shape[0]
    per_beam = jnp.stack([
        res.sum_lp, res.result_len.astype(jnp.float32),
        res.seek_delta.astype(jnp.float32), res.has_ts.astype(jnp.float32),
        res.completed.astype(jnp.float32), res.failed.astype(jnp.float32),
        res.n_valid.astype(jnp.float32),
    ])  # (7, B)
    return jnp.concatenate([
        res.tokens.astype(jnp.float32).reshape(-1), res.p.reshape(-1),
        res.plog.reshape(-1), res.pt.reshape(-1), res.ptsum.reshape(-1),
        res.tid.astype(jnp.float32).reshape(-1), per_beam.reshape(-1),
        jnp.stack([res.n_tokens.astype(jnp.float32), res.no_speech_prob])])


def unpack_beam_result(flat, beam_size: int, n_max: int):
    import numpy as np
    flat = np.asarray(flat)
    n = beam_size * n_max
    f = lambda i: flat[i * n:(i + 1) * n].reshape(beam_size, n_max)
    pb = flat[6 * n:6 * n + 7 * beam_size].reshape(7, beam_size)
    tail = flat[6 * n + 7 * beam_size:]
    return dict(
        tokens=f(0).astype(np.int64), p=f(1), plog=f(2), pt=f(3), ptsum=f(4),
        tid=f(5).astype(np.int64), sum_lp=pb[0],
        result_len=pb[1].astype(np.int64), seek_delta=pb[2].astype(np.int64),
        has_ts=pb[3] > 0.5, completed=pb[4] > 0.5, failed=pb[5] > 0.5,
        n_valid=pb[6].astype(np.int64),
        n_tokens=int(tail[0]), no_speech_prob=float(tail[1]))
