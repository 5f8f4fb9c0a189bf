"""Fused multi-window device decode: up to K 30 s windows per dispatch.

The reference transcribes long audio as a sequence of 30 s windows, with
host logic between windows for the rolling prompt context, quality gates and
seek advancement (whisper_full_with_state, src/whisper.cpp:7034-7772). The
single-window device loop (decode/device_loop.py) already fuses one window's
token loop; this module additionally fuses the *window* loop: encoder,
greedy segment decode, quality gates (avg-logprob / entropy / no-speech,
whisper.cpp:7545-7605), the prompt_past rolling-context update
(whisper.cpp:7625-7636) and the seek state machine all run inside ONE jitted
lax.while_loop over up to K windows. The host gets one buffer bundle per
dispatch instead of one per window — on a remote-attached TPU that removes
K-1 full round trips, and on a local chip it removes K-1 dispatch+sync pairs.

A window that trips a quality gate stops the loop; the host re-decodes that
window with the temperature-fallback schedule (decode/full.py) and re-enters
the device loop with the updated prompt context. Clean audio therefore runs
entirely on device in ceil(n_windows / K) dispatches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import model as M
from . import logit_rules as LR
from .device_loop import CHUNK_FRAMES, segment_core

DELTA_MIN = 10  # 100 ms in 10 ms frames


class _SegView(NamedTuple):
    """The segment fields the window loop consumes, normalized across
    segment_core's carry (greedy) and speculative_core's (draft+verify)."""
    tokens: jnp.ndarray
    p: jnp.ndarray
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray
    i: jnp.ndarray
    result_len: jnp.ndarray
    seek_delta: jnp.ndarray
    failed: jnp.ndarray
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray


class WindowsResult(NamedTuple):
    # per-window buffers, leading axis K
    tokens: jnp.ndarray      # (K, n_max) i32
    p: jnp.ndarray           # (K, n_max) f32
    plog: jnp.ndarray
    pt: jnp.ndarray
    ptsum: jnp.ndarray
    tid: jnp.ndarray         # (K, n_max) i32
    n_tokens: jnp.ndarray    # (K,) i32 sampled count
    result_len: jnp.ndarray  # (K,) i32
    seek: jnp.ndarray        # (K,) i32 window start frame
    seek_delta: jnp.ndarray  # (K,) i32 applied advance (post single-ts-end)
    no_speech_prob: jnp.ndarray  # (K,) f32
    avg_logprobs: jnp.ndarray    # (K,) f32
    is_no_speech: jnp.ndarray    # (K,) bool: skip emission + past update
    # dispatch-level state
    n_done: jnp.ndarray      # i32 windows fully decoded this dispatch
    fallback: jnp.ndarray    # bool: window n_done needs host re-decode
    next_seek: jnp.ndarray   # i32 seek after the last decoded window
    past_buf: jnp.ndarray    # (P,) i32 right-aligned rolling context
    past_len: jnp.ndarray    # i32
    n_rounds: jnp.ndarray    # i32 speculative verify passes (0 if greedy)
    n_accepted: jnp.ndarray  # i32 accepted draft tokens (0 if greedy)


class _WCarry(NamedTuple):
    w: jnp.ndarray
    seek: jnp.ndarray
    past_buf: jnp.ndarray
    past_len: jnp.ndarray
    kv_k: jnp.ndarray
    kv_v: jnp.ndarray
    stop: jnp.ndarray        # bool
    fallback: jnp.ndarray    # bool
    out: WindowsResult       # buffers only; scalars filled at the end


def _entropy_last32(tokens: jnp.ndarray, result_len: jnp.ndarray):
    """Shannon entropy of the token multiset over tokens[max(0,rl-32):rl]
    (whisper_sequence_score, src/whisper.cpp:6622-6641).

    Uses H = -(1/n) * sum_i log(c_i / n) where c_i is the count of token i
    among the n valid positions (each unique value v with count c contributes
    c * (1/n) log(c/n) summed once per occurrence / divided out by c)."""
    lo = jnp.maximum(0, result_len - 32)
    idx = lo + jnp.arange(32)
    valid = idx < result_len
    toks = tokens[jnp.clip(idx, 0, tokens.shape[0] - 1)]
    eq = (toks[:, None] == toks[None, :]) & valid[:, None] & valid[None, :]
    c = jnp.sum(eq, axis=1)
    n = jnp.maximum(result_len - lo, 1)
    logp = jnp.log(jnp.maximum(c, 1).astype(jnp.float32) / n.astype(jnp.float32))
    return -jnp.sum(jnp.where(valid, logp, 0.0)) / n.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rc", "prompt_init", "K", "n_max", "P",
                     "max_tokens", "no_timestamps", "stub", "window_frames",
                     "fallback_available", "quant_kv", "flash", "dcfg",
                     "gamma", "beam_size", "mesh"))
def decode_windows(cfg: M.WhisperConfig, rc: LR.RuleConfig,
                   enc_params: M.Params, dec_params: M.Params,
                   mel_data: jnp.ndarray,
                   base_mask: jnp.ndarray, init_mask: jnp.ndarray,
                   past_buf: jnp.ndarray,
                   iscalars: jnp.ndarray, fscalars: jnp.ndarray,
                   mega=None, denc_params=None, ddec_params=None,
                   dmel_data=None, dmega=None, tmega=None, *,
                   prompt_init: tuple[int, ...], K: int, n_max: int, P: int,
                   max_tokens: int = 0, no_timestamps: bool = False,
                   stub: bool = False, window_frames: int = 2 * 1500,
                   fallback_available: bool = True,
                   quant_kv: bool = False, flash: bool = True,
                   dcfg: M.WhisperConfig | None = None,
                   gamma: int = 0, beam_size: int = 0,
                   mesh=None) -> WindowsResult:
    """Decode up to K windows greedily in one dispatch.

    mel_data (n_pad, n_mels) whole-audio device mel, zero past n_len
    (audio/mel.py); past_buf (P,) right-aligned rolling prompt context.
    iscalars i32: [token_nosp, token_prev, seek, seek_start, seek_end,
    past_len]. fscalars f32: [logprob_thold, entropy_thold, no_speech_thold]
    (+ fscalars[3] = length_penalty in beam mode).

    dcfg + gamma > 0 (speculative mode): each window decodes through
    speculative_core (decode/device_speculative.py) instead of
    segment_core — the draft model's window is encoded IN-LOOP from its
    own whole-audio mel (dmel_data; the draft may use a different mel
    bank), so the K-windows-per-dispatch fusion and speculative
    decoding compose: a draft model no longer costs the multi-window
    dispatch amortization. Outputs are identical to the greedy path by
    the speculative contract (every emitted token is the target's own
    argmax).

    beam_size > 1 (beam mode, VERDICT r4 #4): each window runs the fused
    beam loop (decode/device_beam.decode_segment_beam) and the sequence
    ranking (whisper_rank / _score_sequence, whisper.cpp:7545-7605) runs
    IN-TRACE — best-beam selection, entropy gate, length penalty — so K
    beam windows cost ONE dispatch like greedy instead of 2-3 round
    trips per window."""
    token_nosp, token_prev = iscalars[0], iscalars[1]
    seek0, seek_start, seek_end, past_len0 = (
        iscalars[2], iscalars[3], iscalars[4], iscalars[5])
    lp_thold, ent_thold, nsp_thold = fscalars[0], fscalars[1], fscalars[2]
    n_init = len(prompt_init)
    T_pad = 1 + P + n_init          # token_prev + past tail + task prompt
    init_arr = jnp.asarray(np.array(prompt_init, np.int32))
    speculating = dcfg is not None and gamma > 0
    assert not (speculating and stub)  # gate: spec needs loaded weights
    assert not (speculating and beam_size > 1)  # spec is greedy-only
    cache_dtype = enc_params["conv1_w"].dtype

    if speculating:
        from . import device_speculative as DS
        # carry shapes mirror speculative_core's in-trace allocations
        pad = gamma + 4
        if tmega is not None:
            rows = -(-(cfg.n_text_ctx + pad) // 16) * 16
            kv_k = jnp.zeros(
                (cfg.n_text_layer, rows, cfg.n_text_state), jnp.bfloat16)
            kv_v = kv_k
        else:
            kv_k = jnp.zeros(
                (cfg.n_text_layer, 1, cfg.n_text_head, cfg.n_text_ctx + pad,
                 cfg.d_text_head), cache_dtype)
            kv_v = kv_k
    elif mega is not None:  # natural-layout carry buffers (decode_megakernel)
        kv_k = jnp.zeros((cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state),
                         cache_dtype)
        kv_v = kv_k
    else:
        kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=cache_dtype)

    out = WindowsResult(
        tokens=jnp.zeros((K, n_max), jnp.int32),
        p=jnp.zeros((K, n_max), jnp.float32),
        plog=jnp.zeros((K, n_max), jnp.float32),
        pt=jnp.zeros((K, n_max), jnp.float32),
        ptsum=jnp.zeros((K, n_max), jnp.float32),
        tid=jnp.zeros((K, n_max), jnp.int32),
        n_tokens=jnp.zeros((K,), jnp.int32),
        result_len=jnp.zeros((K,), jnp.int32),
        seek=jnp.zeros((K,), jnp.int32),
        seek_delta=jnp.zeros((K,), jnp.int32),
        no_speech_prob=jnp.zeros((K,), jnp.float32),
        avg_logprobs=jnp.zeros((K,), jnp.float32),
        is_no_speech=jnp.zeros((K,), bool),
        n_done=jnp.int32(0), fallback=jnp.bool_(False),
        next_seek=seek0, past_buf=past_buf, past_len=past_len0,
        n_rounds=jnp.int32(0), n_accepted=jnp.int32(0))

    carry = _WCarry(w=jnp.int32(0), seek=seek0, past_buf=past_buf,
                    past_len=past_len0, kv_k=kv_k, kv_v=kv_v,
                    stop=jnp.bool_(False), fallback=jnp.bool_(False), out=out)

    def cond(c: _WCarry):
        return (~c.stop) & (c.w < K) & (c.seek + DELTA_MIN < seek_end)

    def body(c: _WCarry) -> _WCarry:
        # drop confusing history near the very end (whisper.cpp:7060-7064)
        past_len = jnp.where((c.seek > seek_start) & (c.seek + 500 >= seek_end),
                             0, c.past_len)

        # ---- encode this window (whisper_encode_internal) ----
        window = jax.lax.dynamic_slice_in_dim(
            mel_data, c.seek, window_frames, axis=0)
        _eo, xk, xv = M.encode_with_cross_kv(
            cfg, enc_params, dec_params, window[None], flash=flash,
            mesh=mesh)
        if quant_kv:
            xk = M.quantize_cross_kv(xk)
            xv = M.quantize_cross_kv(xv)

        # ---- build the prompt (whisper.cpp:7121-7148) ----
        if P > 0:
            use_past = past_len > 0
            # prompt = [token_prev] + past_buf tail + prompt_init, left-aligned
            i = jnp.arange(T_pad)
            t_real = jnp.where(use_past, 1 + past_len + n_init, n_init)
            off = jnp.where(use_past, 1, 0)      # position of past start
            past_idx = P - past_len + (i - off)  # right-aligned past gather
            from_past = use_past & (i >= off) & (i < off + past_len)
            init_pos = i - (off + jnp.where(use_past, past_len, 0))
            from_init = (init_pos >= 0) & (init_pos < n_init)
            prompt = jnp.where(
                use_past & (i == 0), token_prev,
                jnp.where(from_past,
                          c.past_buf[jnp.clip(past_idx, 0, P - 1)],
                          jnp.where(from_init,
                                    init_arr[jnp.clip(init_pos, 0, n_init - 1)],
                                    0))).astype(jnp.int32)
        else:  # context carry disabled (n_max_text_ctx <= 1)
            t_real = jnp.int32(n_init)
            prompt = jnp.concatenate(
                [init_arr, jnp.zeros((T_pad - n_init,), jnp.int32)])

        # ---- segment decode (shared cores) ----
        if speculating:
            dwindow = jax.lax.dynamic_slice_in_dim(
                dmel_data, c.seek, window_frames, axis=0)
            _deo, dxk, dxv = M.encode_with_cross_kv(
                dcfg, denc_params, ddec_params, dwindow[None], flash=flash,
                mesh=mesh)
            sc, nsp = DS.speculative_core(
                cfg, dcfg, rc, dec_params, ddec_params, prompt[None],
                xk, xv, dxk, dxv, base_mask, init_mask,
                t_real, token_nosp, c.seek, seek_end,
                n_max=n_max, gamma=gamma, max_tokens=max_tokens,
                single_segment=False, no_timestamps=no_timestamps,
                cache_dtype=cache_dtype, dmega=dmega, tmega=tmega)
            seg = _SegView(tokens=sc.tokens, p=sc.p, plog=sc.plog,
                           pt=sc.pt, ptsum=sc.ptsum, tid=sc.tid, i=sc.i,
                           result_len=sc.ms.result_len,
                           seek_delta=sc.ms.seek_delta, failed=sc.failed,
                           kv_k=sc.kv_k, kv_v=sc.kv_v)
            full_len = seg.i
            n_rounds_w, n_acc_w = sc.n_rounds, sc.n_accepted
        elif beam_size > 1:
            from . import device_beam as DB
            Bn = beam_size
            scalars_b = jnp.stack(
                [t_real, token_nosp, c.seek, seek_end]).astype(jnp.int32)
            if quant_kv:
                xk_b = M.QuantKV(jnp.repeat(xk.qs, Bn, axis=1),
                                 jnp.repeat(xk.scale, Bn, axis=1))
                xv_b = M.QuantKV(jnp.repeat(xv.qs, Bn, axis=1),
                                 jnp.repeat(xv.scale, Bn, axis=1))
                bmega = None
            else:
                bmega = mega
                if bmega is not None:   # cross-KV shared in-kernel
                    xk_b, xv_b = xk, xv
                else:
                    xk_b = jnp.repeat(xk, Bn, axis=1)
                    xv_b = jnp.repeat(xv, Bn, axis=1)
            bres = DB.decode_segment_beam(
                cfg, rc, dec_params, prompt[None], xk_b, xv_b,
                base_mask, init_mask, scalars_b, beam_size=Bn, n_max=n_max,
                max_tokens=max_tokens, single_segment=False,
                no_timestamps=no_timestamps, stub=stub, mega=bmega,
                cache_dtype=cache_dtype, mesh=mesh)
            nsp = bres.no_speech_prob
            # in-trace whisper_rank: score + entropy gate per beam
            # (_rank_decoders / _score_sequence, whisper.cpp:7545-7605)
            rl_b = bres.result_len
            live_b = jnp.arange(n_max)[None, :] < rl_b[:, None]
            total_lp_b = jnp.sum(jnp.where(live_b, bres.plog, 0.0), axis=1)
            ent_b = jnp.stack([_entropy_last32(bres.tokens[j], rl_b[j])
                               for j in range(Bn)])
            failed_b = bres.failed | ((rl_b > 32) & (ent_b < ent_thold))
            len_pen = fscalars[3]
            rlf = rl_b.astype(jnp.float32)
            pen = jnp.where(len_pen > 0.0,
                            ((5.0 + rlf) / 6.0) ** len_pen, rlf)
            score_b = jnp.where(failed_b | (rl_b == 0), -jnp.inf,
                                total_lp_b / jnp.maximum(pen, 1e-6))
            best = jnp.argmax(score_b).astype(jnp.int32)
            pick = lambda a: jnp.take(a, best, axis=0)
            seg = _SegView(tokens=pick(bres.tokens), p=pick(bres.p),
                           plog=pick(bres.plog), pt=pick(bres.pt),
                           ptsum=pick(bres.ptsum), tid=pick(bres.tid),
                           i=bres.n_tokens, result_len=pick(rl_b),
                           seek_delta=pick(bres.seek_delta),
                           failed=pick(failed_b),
                           kv_k=c.kv_k, kv_v=c.kv_v)
            full_len = pick(bres.n_valid)
            n_rounds_w = n_acc_w = jnp.int32(0)
        else:
            seg, nsp = segment_core(
                cfg, rc, dec_params, prompt[None], c.kv_k, c.kv_v, xk, xv,
                base_mask, init_mask, t_real, token_nosp, c.seek, seek_end,
                n_max=n_max, max_tokens=max_tokens, single_segment=False,
                no_timestamps=no_timestamps, stub=stub, mega=mega, mesh=mesh)
            full_len = seg.i
            n_rounds_w = n_acc_w = jnp.int32(0)

        # ---- quality gates (whisper_rank / _score_sequence) ----
        rl = seg.result_len
        live = jnp.arange(n_max) < rl
        total_lp = jnp.sum(jnp.where(live, seg.plog, 0.0))
        avg_lp = jnp.where(rl > 0, total_lp / jnp.maximum(rl, 1), -jnp.inf)
        entropy = _entropy_last32(seg.tokens, rl)
        failed = seg.failed | ((rl > 32) & (entropy < ent_thold))
        low_conf = (avg_lp < lp_thold) & (nsp < nsp_thold)
        needs_fallback = (failed | low_conf) & jnp.bool_(fallback_available)
        is_nsp = (nsp > nsp_thold) & (avg_lp < lp_thold)

        # single-timestamp ending skips the whole chunk (whisper.cpp:7758)
        tb = rc.token_beg
        tl = seg.tokens[jnp.clip(rl - 1, 0, n_max - 1)]
        tp = seg.tokens[jnp.clip(rl - 2, 0, n_max - 1)]
        single_ts_end = (rl > 1) & (tp < tb) & (tl > tb)
        seek_delta = jnp.where(
            single_ts_end,
            jnp.minimum(seek_end - c.seek, CHUNK_FRAMES), seg.seek_delta)

        # ---- rolling context update (whisper.cpp:7625-7636) ----
        # new past = (past tail used this window) + tokens[:result_len],
        # truncated to the last P entries. Keeping only the last P tokens is
        # tail-equivalent to the reference's unbounded prompt_past list
        # because only its last max_prompt_ctx-1 entries are ever consumed.
        # A no-speech window keeps the used tail but adds nothing
        # (whisper.cpp:7631: is_no_speech skips the extend).
        take = jnp.where(is_nsp, 0, rl)
        used = jnp.where(jnp.arange(P) >= P - past_len, c.past_buf, 0)
        # right-align new tokens in their n_max half, shift the used tail so
        # both valid regions abut, then keep the last P of the combination
        toks_z = jnp.where(jnp.arange(n_max) < take, seg.tokens, 0)
        rolled = jnp.roll(toks_z, n_max - take)
        full = (jnp.roll(jnp.concatenate([used, jnp.zeros((n_max,), jnp.int32)]),
                         n_max - take)
                + jnp.concatenate([jnp.zeros((P,), jnp.int32), rolled]))
        new_past = full[n_max:]
        new_past_len = jnp.minimum(P, past_len + take)

        new_seek = c.seek + seek_delta

        # ---- write outputs at row w ----
        o = c.out
        w = c.w
        row = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (w, 0))
        sca = lambda buf, val: buf.at[w].set(val.astype(buf.dtype))
        commit = ~needs_fallback
        out_new = WindowsResult(
            tokens=row(o.tokens, seg.tokens), p=row(o.p, seg.p),
            plog=row(o.plog, seg.plog), pt=row(o.pt, seg.pt),
            ptsum=row(o.ptsum, seg.ptsum), tid=row(o.tid, seg.tid),
            n_tokens=sca(o.n_tokens, seg.i),
            # a failed best decoder emits its FULL sequence (the reference
            # resizes tokens to result_len only for NON-failed decoders,
            # whisper.cpp:7556, and emission iterates tokens_cur, :7615);
            # the rolling context above still extends by the true rl only
            result_len=sca(o.result_len, jnp.where(failed, full_len, rl)),
            seek=sca(o.seek, c.seek),
            seek_delta=sca(o.seek_delta, seek_delta),
            no_speech_prob=sca(o.no_speech_prob, nsp),
            avg_logprobs=sca(o.avg_logprobs, avg_lp),
            is_no_speech=sca(o.is_no_speech, is_nsp),
            n_done=o.n_done, fallback=o.fallback, next_seek=o.next_seek,
            past_buf=o.past_buf, past_len=o.past_len,
            n_rounds=o.n_rounds + n_rounds_w,
            n_accepted=o.n_accepted + n_acc_w)
        out_sel = jax.tree.map(
            lambda a, b: jnp.where(commit, a, b), out_new, o)

        return _WCarry(
            w=jnp.where(commit, w + 1, w),
            seek=jnp.where(commit, new_seek, c.seek),
            past_buf=jnp.where(commit, new_past, c.past_buf),
            past_len=jnp.where(commit, new_past_len, past_len),
            kv_k=seg.kv_k, kv_v=seg.kv_v,
            stop=needs_fallback, fallback=needs_fallback, out=out_sel)

    c = jax.lax.while_loop(cond, body, carry)
    return c.out._replace(n_done=c.w, fallback=c.fallback, next_seek=c.seek,
                          past_buf=c.past_buf, past_len=c.past_len)


@jax.jit
def pack_windows_result(res: WindowsResult) -> jnp.ndarray:
    """Flatten to ONE f32 array: one device->host transfer per dispatch."""
    K, n_max = res.tokens.shape
    mats = jnp.concatenate([
        res.tokens.astype(jnp.float32), res.p, res.plog, res.pt, res.ptsum,
        res.tid.astype(jnp.float32)], axis=1).reshape(-1)
    per_w = jnp.stack([
        res.n_tokens.astype(jnp.float32),
        res.result_len.astype(jnp.float32),
        res.seek.astype(jnp.float32),
        res.seek_delta.astype(jnp.float32),
        res.no_speech_prob, res.avg_logprobs,
        res.is_no_speech.astype(jnp.float32)], axis=0).reshape(-1)
    scalars = jnp.stack([
        res.n_done.astype(jnp.float32),
        res.fallback.astype(jnp.float32),
        res.next_seek.astype(jnp.float32),
        res.past_len.astype(jnp.float32),
        res.n_rounds.astype(jnp.float32),
        res.n_accepted.astype(jnp.float32)])
    return jnp.concatenate([mats, per_w, scalars])


@functools.partial(
    jax.jit, static_argnums=(0, 1),
    static_argnames=("prompt_init", "K", "n_max", "P",
                     "max_tokens", "no_timestamps", "stub", "window_frames",
                     "fallback_available", "quant_kv", "flash", "dcfg",
                     "gamma", "beam_size", "mesh"))
def decode_windows_packed(*args, **kwargs):
    """decode_windows with the result already packed, in the SAME dispatch.

    Returns (flat, past_buf): one device program + one device->host fetch
    per K-window round instead of two dispatches — on a relayed link each
    extra dispatch costs a round trip."""
    res = decode_windows(*args, **kwargs)
    return pack_windows_result(res), res.past_buf


def unpack_windows_result(flat, K: int, n_max: int) -> dict:
    flat = np.asarray(flat)
    mats = flat[:K * 6 * n_max].reshape(K, 6 * n_max)
    f = lambda i: mats[:, i * n_max:(i + 1) * n_max]
    pw = flat[K * 6 * n_max:K * 6 * n_max + 7 * K].reshape(7, K)
    s = flat[K * 6 * n_max + 7 * K:]
    return dict(
        tokens=f(0).astype(np.int64), p=f(1), plog=f(2), pt=f(3), ptsum=f(4),
        tid=f(5).astype(np.int64),
        n_tokens=pw[0].astype(np.int64), result_len=pw[1].astype(np.int64),
        seek=pw[2].astype(np.int64), seek_delta=pw[3].astype(np.int64),
        no_speech_prob=pw[4], avg_logprobs=pw[5],
        is_no_speech=pw[6].astype(bool),
        n_done=int(s[0]), fallback=bool(s[1]), next_seek=int(s[2]),
        past_len=int(s[3]), n_rounds=int(s[4]), n_accepted=int(s[5]))
