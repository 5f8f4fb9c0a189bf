"""Batched-window serving pipeline.

The reference's only multi-stream path runs one OS thread per audio chunk
(whisper_full_parallel, src/whisper.cpp:7801-7929), each thread still paying
one graph launch per token. Here B independent chunks decode *in the same
device program*: windows are gathered at per-chunk seek offsets, encoded as
one batch, and a single lax.while_loop advances all B greedy decoders with
the full rule-set — so the MXU sees batch-B matmuls throughout and the host
boundary is crossed once per round, not per token. This is the
throughput-serving mode (audio-seconds/sec/chip at batch).

Semantics match running whisper_full per chunk with no_context=True (chunk
boundaries are full_parallel's; QA-gate fallbacks re-run the affected chunk
through the reference-exact single-stream path).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import mel as mel_mod
from ..models.whisper import model as M
from ..parallel.mesh import fetch_np
from . import full as F
from . import logit_rules as LR
from .params import FullParams

CHUNK_FRAMES = 3000
DELTA_MIN = 10


class _BatchCarry(NamedTuple):
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    kv_head: jnp.ndarray        # (B,) == prompt_len + i (same for all, scalar ok)
    i: jnp.ndarray
    logits: jnp.ndarray         # (B, V)
    tokens: jnp.ndarray         # (B, n_max)
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    sum_lp: jnp.ndarray         # (B,)
    last_was_ts: jnp.ndarray    # (B,)
    penult_was_ts: jnp.ndarray
    has_ts: jnp.ndarray
    seek_delta: jnp.ndarray     # (B,)
    result_len: jnp.ndarray
    completed: jnp.ndarray
    failed: jnp.ndarray


class BatchResult(NamedTuple):
    tokens: jnp.ndarray
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    n_tokens: jnp.ndarray       # (B,) per-window sampled counts == global i
    result_len: jnp.ndarray     # (B,)
    seek_delta: jnp.ndarray
    has_ts: jnp.ndarray
    completed: jnp.ndarray
    failed: jnp.ndarray
    sum_lp: jnp.ndarray
    no_speech_prob: jnp.ndarray


def _gather_windows(mel_data: jnp.ndarray, seeks: jnp.ndarray,
                    n_ctx: int) -> jnp.ndarray:
    """(n_len, n_mel), (B,) -> (B, 2*n_ctx, n_mel) via batched dynamic slice."""
    def one(seek):
        return jax.lax.dynamic_slice_in_dim(mel_data, seek, 2 * n_ctx, axis=0)
    return jax.vmap(one)(seeks)


@dataclasses.dataclass(frozen=True)
class _StaticArgs:
    cfg: M.WhisperConfig
    rc: LR.RuleConfig
    n_max: int
    max_tokens: int
    no_timestamps: bool
    stub: bool
    cross_kv_int8: bool = False
    mesh: object = None          # jax.sharding.Mesh: dp-shard the chunk axis
    flash: bool = True           # pallas flash encoder (off under GSPMD)
    # staged self-KV cache widths: the decode runs entirely inside one
    # device program, but as a CHAIN of while_loops whose cache is only as
    # wide as positions reached so far (128 -> 256 covers the whole
    # no-context batched decode, n_max = n_text_ctx/2 - 4). Masked columns
    # contribute exact zeros to the softmax, so every stage is
    # bit-identical to the full-width loop while reading ~60% less
    # self-KV HBM per step on average.
    kv_stages: tuple = ()


def _kv_stage_widths(full: int, need: int) -> tuple:
    """Stage widths (ascending) ending at the narrowest of {128, 256, full}
    that covers `need` positions."""
    need = min(need, full)
    last = min(next((w for w in (128, 256) if w >= need), full), full)
    return tuple(w for w in (128, 256) if w < last) + (last,)


def _make_batch_step(sa: _StaticArgs):
    cfg, rc = sa.cfg, sa.rc
    token_beg, token_eot = rc.token_beg, rc.token_eot

    @jax.jit
    def run(dec, mel_data, seeks, active, prompt, kv_k, kv_v,
            base_mask, init_mask, token_nosp, seek_end, mega=None):
        B = seeks.shape[0]
        windows = _gather_windows(mel_data, seeks, cfg.n_audio_ctx)
        if sa.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            windows = jax.lax.with_sharding_constraint(
                windows, NamedSharding(sa.mesh, P("dp")))
        enc_out = M.encode(cfg, dec["encoder"], windows, flash=sa.flash)
        xk, xv = M.cross_kv(cfg, dec["decoder"], enc_out)
        if sa.cross_kv_int8:
            # halves the dominant per-step HBM traffic at batch
            xk = M.quantize_cross_kv(xk)
            xv = M.quantize_cross_kv(xv)

        t_prompt = prompt.shape[1]
        if mega is not None:
            # batched-stream megakernel step: one weight stream for all B
            # decoders, per-stream cross chunked in-kernel
            # (ops/decode_megakernel.mega_decode_step_batch). Prompt
            # ingest stays on the XLA path; kv carries are natural-layout.
            from ..ops import decode_megakernel as MK
            S = cfg.n_text_state
            L = cfg.n_text_layer

            def to_nat_b(a):  # (L, B, H, T, dh) head-major -> (L, B, T, S)
                return jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(
                    L, a.shape[1], a.shape[3], S)

            def to_tm(a):     # (L, B, H, T, dh) -> TIME-MAJOR (L, T, B, S)
                return jnp.transpose(a, (0, 3, 1, 2, 4)).reshape(
                    L, a.shape[3], a.shape[1], S)

            hm_k, hm_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
            logits_all, hm_k, hm_v, _ = M.decode_impl(
                cfg, dec["decoder"], jnp.broadcast_to(prompt, (B, t_prompt)),
                hm_k, hm_v, jnp.int32(0), xk, xv,
                logits_pos=jnp.int32(t_prompt - 1))
            n_ctx = cfg.n_text_ctx
            kv_k = to_tm(hm_k).reshape(L, n_ctx * B, S)   # flat time-major
            kv_v = to_tm(hm_v).reshape(L, n_ctx * B, S)
            xk_nat, xv_nat = to_nat_b(xk), to_nat_b(xv)
            mega_interpret = jax.devices()[0].platform == "cpu"
        else:
            logits_all, kv_k, kv_v, _ = M.decode_impl(
                cfg, dec["decoder"], jnp.broadcast_to(prompt, (B, t_prompt)),
                kv_k, kv_v, jnp.int32(0), xk, xv,
                logits_pos=jnp.int32(t_prompt - 1))
        last_logits = logits_all[:, 0]                        # (B, V)
        nsp = jax.vmap(lambda row: LR.compute_no_speech_prob(row, token_nosp))(
            last_logits)

        carry = _BatchCarry(
            kv_k=kv_k, kv_v=kv_v, kv_head=jnp.int32(t_prompt),
            i=jnp.int32(0), logits=last_logits,
            tokens=jnp.zeros((B, sa.n_max), jnp.int32),
            p=jnp.zeros((B, sa.n_max), jnp.float32),
            plog=jnp.zeros((B, sa.n_max), jnp.float32),
            pt=jnp.zeros((B, sa.n_max), jnp.float32),
            ptsum=jnp.zeros((B, sa.n_max), jnp.float32),
            tid=jnp.zeros((B, sa.n_max), jnp.int32),
            sum_lp=jnp.zeros((B,), jnp.float32),
            last_was_ts=jnp.zeros((B,), bool),
            penult_was_ts=jnp.ones((B,), bool),
            has_ts=jnp.zeros((B,), bool),
            seek_delta=jnp.full((B,), CHUNK_FRAMES, jnp.int32),
            result_len=jnp.zeros((B,), jnp.int32),
            completed=~active, failed=jnp.zeros((B,), bool))

        def cond(c: _BatchCarry):
            return jnp.any(~c.completed & ~c.failed) & (c.i < sa.n_max)

        def body(c: _BatchCarry) -> _BatchCarry:
            i = c.i
            run_mask = ~c.completed & ~c.failed                # (B,)
            st = LR.BeamState(
                is_initial=jnp.full((B,), i == 0),
                last_was_ts=c.last_was_ts,
                penult_was_ts=c.penult_was_ts,
                has_ts=c.has_ts,
                ts_min=jnp.where(c.has_ts, token_beg + c.seek_delta // 2, 0))
            f_logits, f_logprobs, f_probs = LR.apply_rules(
                rc, c.logits, base_mask, init_mask, st, jnp.float32(0.0))
            tok, p, plog, pt, ptsum, tid = LR.sample_greedy(
                rc, f_logits, f_logprobs, f_probs)
            is_ts_tok = tok >= token_beg
            tid = jnp.where(is_ts_tok, tok, tid)
            pt = jnp.where(is_ts_tok, p, pt)

            write = run_mask
            col = i
            tokens = c.tokens.at[:, col].set(jnp.where(write, tok, c.tokens[:, col]))
            p_b = c.p.at[:, col].set(jnp.where(write, p, c.p[:, col]))
            plog_b = c.plog.at[:, col].set(jnp.where(write, plog, c.plog[:, col]))
            pt_b = c.pt.at[:, col].set(jnp.where(write, pt, c.pt[:, col]))
            pts_b = c.ptsum.at[:, col].set(jnp.where(write, ptsum, c.ptsum[:, col]))
            tid_b = c.tid.at[:, col].set(jnp.where(write, tid, c.tid[:, col]))
            sum_lp = jnp.where(write, c.sum_lp + plog, c.sum_lp)

            # state machine (whisper.cpp:7355-7459), vectorized over B
            gt_beg = (tok > token_beg) & run_mask
            sd_new = 2 * (tok - token_beg)
            ts_fail = gt_beg & c.has_ts & (c.seek_delta > sd_new) & (c.result_len < i)
            take_ts = gt_beg & ~ts_fail
            seek_delta = jnp.where(take_ts, sd_new, c.seek_delta)
            result_len = jnp.where(take_ts, i + 1, c.result_len)
            has_ts = c.has_ts | take_ts

            at_end = seeks + seek_delta + DELTA_MIN >= seek_end
            end_hit = run_mask & ~ts_fail & (
                (tok == token_eot)
                | ((sa.max_tokens > 0) & (i >= sa.max_tokens))
                | (has_ts & at_end))
            rl_zero = (result_len == 0) & (not sa.no_timestamps)
            end_fail = end_hit & rl_zero & ~at_end
            result_len = jnp.where(end_hit & rl_zero & at_end, i + 1, result_len)
            end_ok = end_hit & ~end_fail
            if sa.no_timestamps:
                result_len = jnp.where(end_ok, i + 1, result_len)
                seek_delta = jnp.where(end_ok, CHUNK_FRAMES, seek_delta)
            completed = c.completed | end_ok
            failed = c.failed | ts_fail | end_fail

            if sa.stub:
                newly = run_mask & ~completed & ~failed
                seek_delta = jnp.where(newly, CHUNK_FRAMES, seek_delta)
                completed = completed | newly

            rep_fail = ((i == sa.n_max - 1) & run_mask & ~completed & ~failed
                        & ((result_len == 0) | (seek_delta < CHUNK_FRAMES // 2)))
            failed = failed | rep_fail

            if mega is not None:
                x0 = (dec["decoder"]["te"][tok]
                      + dec["decoder"]["pe"][c.kv_head][None, :]).astype(
                          jnp.bfloat16)
                step_logits1, kv_k, kv_v = MK.mega_decode_step_batch(
                    cfg, mega, x0, c.kv_k, c.kv_v, c.kv_head,
                    xk_nat, xv_nat, interpret=mega_interpret)
                step_logits = step_logits1[:, None]
            else:
                step_logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, dec["decoder"], tok[:, None], c.kv_k, c.kv_v,
                    c.kv_head, xk, xv)

            return _BatchCarry(
                kv_k=kv_k, kv_v=kv_v, kv_head=c.kv_head + 1, i=i + 1,
                logits=step_logits[:, 0],
                tokens=tokens, p=p_b, plog=plog_b, pt=pt_b, ptsum=pts_b,
                tid=tid_b, sum_lp=sum_lp,
                last_was_ts=jnp.where(run_mask, is_ts_tok, c.last_was_ts),
                penult_was_ts=jnp.where(run_mask, c.last_was_ts | (i == 0),
                                        c.penult_was_ts),
                has_ts=has_ts, seek_delta=seek_delta, result_len=result_len,
                completed=completed, failed=failed)

        if mega is None and sa.kv_stages:
            # staged-width self-KV: chain while_loops, widening the cache
            # between stages (all inside this one device program)
            c = carry
            for idx, w in enumerate(sa.kv_stages):
                if idx == len(sa.kv_stages) - 1:
                    c = jax.lax.while_loop(cond, body, c)
                else:
                    c = jax.lax.while_loop(
                        lambda c, w=w: cond(c) & (c.kv_head < w), body, c)
                    nxt = sa.kv_stages[idx + 1]
                    c = c._replace(kv_k=M.widen_kv_cache(c.kv_k, nxt),
                                   kv_v=M.widen_kv_cache(c.kv_v, nxt))
        else:
            c = jax.lax.while_loop(cond, body, carry)
        return BatchResult(
            tokens=c.tokens, p=c.p, plog=c.plog, pt=c.pt, ptsum=c.ptsum,
            tid=c.tid, n_tokens=jnp.broadcast_to(c.i, (B,)),
            result_len=c.result_len, seek_delta=c.seek_delta,
            has_ts=c.has_ts, completed=c.completed, failed=c.failed,
            sum_lp=c.sum_lp, no_speech_prob=nsp)

    return run


def _init_prompt(ctx: F.WhisperContext, p: FullParams) -> list[int]:
    vocab = ctx.vocab
    prompt_init = [vocab.token_sot]
    if vocab.is_multilingual:
        from . import tokenizer as tok_mod
        lid = tok_mod.lang_id(p.language or "en")
        prompt_init += [vocab.token_lang(lid),
                        vocab.token_translate if p.translate
                        else vocab.token_transcribe]
    if p.no_timestamps:
        prompt_init.append(vocab.token_not)
    return prompt_init


def _lockstep_chunks(ctx: F.WhisperContext, p: FullParams,
                     mel_data: jnp.ndarray,
                     bases: np.ndarray, ends_local: np.ndarray,
                     fallback_audio, cross_kv_int8: bool
                     ) -> list[list[F.Segment]]:
    """Lockstep-decode B independent chunks laid out in one mel buffer.

    Chunk b's frames live at mel_data[bases[b] : bases[b]+ends_local[b]]
    (plus window zero-pad). Returns per-chunk segments with CHUNK-LOCAL
    timestamps. `fallback_audio(b)` yields the chunk's samples for the
    QA-gate re-run through the exact single-stream driver.
    """
    cfg = ctx.cfg
    vocab = ctx.vocab
    rc = ctx.rule_config
    B = len(bases)

    prompt_init = _init_prompt(ctx, p)
    base_mask, init_mask = ctx.rule_masks(p)
    n_max = cfg.n_text_ctx // 2 - 4
    # dp-shard the chunk axis only when it divides evenly; otherwise the
    # tp-sharded weights still give multi-chip execution, batch replicated
    dp_shard = (ctx.mesh is not None
                and B % ctx.mesh.shape.get("dp", 1) == 0)
    # no-context lockstep decode: positions never pass prompt + n_max (+1
    # for the bonus write slot), so the self-KV cache can start narrow and
    # widen in stages — see _StaticArgs.kv_stages
    kv_stages = _kv_stage_widths(cfg.n_text_ctx,
                                 len(prompt_init) + n_max + 1)
    sa = _StaticArgs(cfg=cfg, rc=rc, n_max=n_max, max_tokens=p.max_tokens,
                     no_timestamps=p.no_timestamps, stub=ctx.n_loaded == 0,
                     cross_kv_int8=cross_kv_int8,
                     mesh=ctx.mesh if dp_shard else None,
                     flash=ctx.mesh is None,
                     kv_stages=kv_stages)
    step = _make_batch_step(sa)
    # one-weight-stream batched megakernel (B <= 8 sublane rows); the
    # int8 cross-KV path keeps the XLA step (QuantKV not in-kernel).
    # EXPLICIT opt-in only: the first-cut kernel measured 1.93 vs 1.52
    # ms/token against the XLA batch step (per-stream cross-attend is
    # MXU-utilization-bound at M=8 rows; docs/ROADMAP.md), so the
    # auto-on-for-quantized-checkpoints policy must not select it
    mega = (ctx.mega_params(p)
            if p.megakernel in (True, "int8", "int4")
            and B <= 8 and not cross_kv_int8 else None)

    bases = np.asarray(bases, np.int64)
    seeks = bases.astype(np.int32).copy()        # absolute frame cursors
    ends = (bases + np.asarray(ends_local, np.int64)).astype(np.int32)
    chunk_segments: list[list[F.Segment]] = [[] for _ in range(B)]
    chunk_timings = [F.Timings() for _ in range(B)]
    failed_chunks: set[int] = set()
    prompt = jnp.asarray(np.asarray(prompt_init, np.int32)[None])

    import time as _time
    while True:
        active_np = (seeks + DELTA_MIN < ends) & ~np.isin(
            np.arange(B), list(failed_chunks))
        if not active_np.any():
            break
        if mega is not None:   # flat time-major carry (megakernel step)
            kv_k = jnp.zeros((cfg.n_text_layer, cfg.n_text_ctx * B,
                              cfg.n_text_state), jnp.bfloat16)
            kv_v = kv_k
        else:
            kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=ctx.dtype,
                                         width=kv_stages[0])
            if dp_shard:
                from ..parallel.mesh import kv_sharding
                kv_k = jax.device_put(kv_k, kv_sharding(ctx.mesh))
                kv_v = jax.device_put(kv_v, kv_sharding(ctx.mesh))
        t0 = _time.perf_counter()
        res = step(ctx.params, mel_data, jnp.asarray(seeks),
                   jnp.asarray(active_np), prompt, kv_k, kv_v,
                   base_mask, init_mask, jnp.int32(vocab.token_nosp),
                   jnp.asarray(ends), mega=mega)
        res = jax.tree.map(fetch_np, res)
        round_ms = (_time.perf_counter() - t0) * 1e3
        n_active = max(1, int(active_np.sum()))

        for b in range(B):
            if not active_np[b]:
                continue
            tm = chunk_timings[b]
            tm.t_decode_ms += round_ms / n_active
            tm.n_encode += 1
            tm.n_decode += int(res.n_tokens[b]) + 1
            tm.n_sample += int(res.n_tokens[b])
            if res.failed[b]:
                failed_chunks.add(b)
                continue
            d = F._DecoderState()
            n_tok = int(res.n_tokens[b])
            d.tokens = [F.TokenData(int(res.tokens[b, k]), int(res.tid[b, k]),
                                    float(res.p[b, k]), float(res.plog[b, k]),
                                    float(res.pt[b, k]), float(res.ptsum[b, k]))
                        for k in range(n_tok)]
            d.result_len = int(res.result_len[b])
            d.seek_delta = int(res.seek_delta[b])
            d.tokens = d.tokens[:d.result_len]
            tokens_cur = d.tokens
            nsp = float(res.no_speech_prob[b])

            sub = F.TranscribeResult(segments=chunk_segments[b])
            if tokens_cur and ctx.n_loaded > 0:
                F._emit_segments(ctx, p, sub, tokens_cur,
                                 int(seeks[b] - bases[b]),
                                 d.seek_delta, nsp)
            single_ts_end = (len(tokens_cur) > 1
                             and tokens_cur[-2].id < vocab.token_beg
                             and tokens_cur[-1].id > vocab.token_beg)
            sd = d.seek_delta
            if single_ts_end:
                sd = min(int(ends[b]) - int(seeks[b]), CHUNK_FRAMES)
            seeks[b] += sd

    # QA-gate fallback: failed chunks re-run through the exact driver
    for b in sorted(failed_chunks):
        sub = F.whisper_full(ctx, dataclasses.replace(
            p, offset_ms=0, duration_ms=0, print_progress=False),
            fallback_audio(b))
        chunk_segments[b] = sub.segments
        chunk_timings[b] = sub.timings
    return chunk_segments, chunk_timings


def transcribe_batched(ctx: F.WhisperContext, p: FullParams,
                       samples: np.ndarray, n_chunks: int = 8,
                       cross_kv_int8: bool = False) -> F.TranscribeResult:
    """Transcribe by splitting into `n_chunks` independent chunks and
    decoding all their windows in lockstep on-device. Greedy t=0 path;
    chunks whose QA gates trip fall back to the single-stream driver.
    All chunks share ONE whole-audio mel (offset/duration single-stream
    semantics; full_parallel uses per-chunk mels via transcribe_chunks).
    On a mesh context the chunk axis is dp-sharded."""
    samples = np.asarray(samples, np.float32)
    if n_chunks <= 1:
        return F.whisper_full(ctx, p, samples)

    cfg = ctx.cfg

    mel = mel_mod.log_mel_spectrogram(samples, ctx.filters)
    # guarantee a full window fits at any seek < n_len_org (zero-padded
    # like whisper_encode_internal's window buffer, whisper.cpp:2392-2399)
    need = mel.n_len_org + 2 * cfg.n_audio_ctx
    if mel.data.shape[0] < need:
        mel = dataclasses.replace(
            mel, data=jnp.concatenate(
                [mel.data, jnp.zeros((need - mel.data.shape[0],
                                      mel.data.shape[1]), mel.data.dtype)]))
    n_per = mel.n_len_org // n_chunks
    bases = np.array([i * n_per for i in range(n_chunks)], np.int64)
    ends_local = np.array(
        [(mel.n_len_org if i == n_chunks - 1 else (i + 1) * n_per) - i * n_per
         for i in range(n_chunks)], np.int64)

    def fallback_audio(b):
        lo = int(bases[b])
        hi = lo + int(ends_local[b])
        return samples[lo * 160: hi * 160]

    chunk_segments, chunk_timings = _lockstep_chunks(
        ctx, p, mel.data, bases, ends_local, fallback_audio, cross_kv_int8)

    result = F.TranscribeResult(segments=[], timings=chunk_timings[0])
    for tm in chunk_timings[1:]:
        result.timings.t_decode_ms += tm.t_decode_ms
        result.timings.n_encode += tm.n_encode
        result.timings.n_decode += tm.n_decode
        result.timings.n_sample += tm.n_sample
    for b in range(n_chunks):
        for s in chunk_segments[b]:
            s.t0 += int(bases[b])
            s.t1 += int(bases[b])
            if result.segments:
                s.t0 = max(s.t0, result.segments[-1].t1)
            result.segments.append(s)
    return result


def transcribe_chunks(ctx: F.WhisperContext, p: FullParams,
                      chunks: list[np.ndarray],
                      cross_kv_int8: bool = False) -> list[list[F.Segment]]:
    """Lockstep-decode a list of independent audio chunks, each with its OWN
    mel normalization context (exactly what whisper_full computes per chunk
    — the whisper_full_parallel per-state semantics, whisper.cpp:7801-7929).
    Returns per-chunk segments with chunk-local timestamps; the caller owns
    offset fixup and merging (parallel/dp.py::full_parallel)."""
    segs, _ = transcribe_chunks_with_timings(ctx, p, chunks, cross_kv_int8)
    return segs


def transcribe_chunks_with_timings(ctx: F.WhisperContext, p: FullParams,
                                   chunks: list[np.ndarray],
                                   cross_kv_int8: bool = False):
    """transcribe_chunks + per-chunk Timings (full_parallel's merge input)."""
    cfg = ctx.cfg
    mels = [mel_mod.log_mel_spectrogram(np.asarray(c, np.float32),
                                        ctx.filters) for c in chunks]
    pad = 2 * cfg.n_audio_ctx
    bases = []
    parts = []
    off = 0
    for m in mels:
        need = m.n_len_org + pad
        data = m.data
        if data.shape[0] < need:
            data = jnp.concatenate(
                [data, jnp.zeros((need - data.shape[0], data.shape[1]),
                                 data.dtype)])
        else:
            data = data[:need]
        bases.append(off)
        parts.append(data)
        off += int(data.shape[0])
    mel_data = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    ends_local = np.array([m.n_len_org for m in mels], np.int64)
    return _lockstep_chunks(ctx, p, mel_data, np.asarray(bases, np.int64),
                            ends_local, lambda b: chunks[b], cross_kv_int8)
