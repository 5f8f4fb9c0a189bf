"""Device-resident AOSC: the whole streaming diarization loop as ONE
lax.scan program.

The host port in streaming.py mirrors the reference chunk-by-chunk
(sortformer.cpp:2271-2571 + 1655-1920) and synchronizes with the device
once per chunk — fine on local hardware, round-trip-bound on a remote
link. This module re-expresses the same state machine with fixed-shape
device arrays so an entire file diarizes in one dispatch:

* spkcache/FIFO live in padded buffers with explicit lengths; the
  "concat" steps become boundary gathers,
* compress_spkcache's argpartition top-Ks become lax.top_k with the same
  speaker-major (s, t) output ordering; +inf silence pads and -inf
  disabled frames behave identically,
* the silence profile's running mean is computed in closed form
  (mathematically equal to the reference's sequential update; floating
  point may differ in the last ulps).

Everything per-chunk-static (chunk schedule, mel offsets, context sizes)
is precomputed on the host and fed as scan xs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import model as SM
from .streaming import N_SPK, StreamConfig

_NEG = -jnp.inf


def _scfg_key(scfg: StreamConfig) -> tuple:
    """StreamConfig as a hashable static argument."""
    return (scfg.chunk_len, scfg.fifo_len, scfg.spkcache_len,
            scfg.spkcache_update_period, scfg.chunk_left_context,
            scfg.chunk_right_context, scfg.spkcache_sil_frames_per_spk,
            scfg.sil_threshold, scfg.pred_score_threshold,
            scfg.scores_boost_latest, scfg.strong_boost_rate,
            scfg.weak_boost_rate, scfg.min_pos_scores_rate)


def _scfg_from_key(key: tuple) -> StreamConfig:
    return StreamConfig(*key, max_index=99999)


def _gather_rows(buf: jnp.ndarray, offset, length_mask_idx) -> jnp.ndarray:
    idx = jnp.clip(length_mask_idx + offset, 0, buf.shape[0] - 1)
    return buf[idx]


def _boost_topk_dev(scores: jnp.ndarray, k: int, scale: float, offset: float,
                    live: jnp.ndarray) -> jnp.ndarray:
    """Per-speaker top-K boost (streaming.py _boost_topk, device form)."""
    if k <= 0:
        return scores
    boost = -scale * math.log(offset)
    cols = []
    for s in range(N_SPK):
        col = jnp.where(live, scores[:, s], _NEG)
        _, idx = jax.lax.top_k(col, k)
        add = jnp.zeros_like(col).at[idx].add(boost)
        cols.append(scores[:, s] + add)   # -inf + finite stays -inf
    return jnp.stack(cols, axis=1)


def _compress_dev(sc, sc_preds, sc_len, sil_emb, key: tuple):
    """compress_spkcache on fixed-shape buffers (streaming.py:compress)."""
    scfg = _scfg_from_key(key)
    SC_MAX = sc.shape[0]
    target = scfg.spkcache_len
    per_spk = target // N_SPK - scfg.spkcache_sil_frames_per_spk
    strong_k = int(per_spk * scfg.strong_boost_rate)
    # compress only triggers at sc_len > target >= these Ks (driver asserts)
    weak_k = int(per_spk * scfg.weak_boost_rate)
    min_pos_k = int(per_spk * scfg.min_pos_scores_rate)
    n_sil_pad = scfg.spkcache_sil_frames_per_spk
    thr = scfg.pred_score_threshold

    i = jnp.arange(SC_MAX)
    live = i < sc_len
    p = sc_preds
    log_1_sum = jnp.log(jnp.maximum(1.0 - p, thr)).sum(axis=1, keepdims=True)
    scores = (jnp.log(jnp.maximum(p, thr)) - jnp.log(jnp.maximum(1.0 - p, thr))
              + log_1_sum - math.log(0.5))
    scores = jnp.where(p <= 0.5, _NEG, scores)
    scores = jnp.where(live[:, None], scores, _NEG)

    # disable weak positives when enough strong ones exist
    for s in range(N_SPK):
        pos_cnt = jnp.sum((scores[:, s] > 0) & live)
        kill = (scores[:, s] <= 0) & (p[:, s] > 0.5) & live
        scores = scores.at[:, s].set(
            jnp.where((pos_cnt >= min_pos_k) & kill, _NEG, scores[:, s]))

    if scfg.scores_boost_latest > 0:
        latest = (i >= target) & live
        scores = jnp.where((latest[:, None]) & jnp.isfinite(scores),
                           scores + scfg.scores_boost_latest, scores)

    scores = _boost_topk_dev(scores, strong_k, 2.0, 0.5, live)
    scores = _boost_topk_dev(scores, weak_k, 1.0, 0.5, live)

    # speaker-major flat scores over R = SC_MAX + n_sil_pad rows per speaker:
    # rows [0, sc_len) live, [sc_len, sc_len+n_sil_pad) = +inf silence pads,
    # the rest -inf. Index s*R + t preserves the reference's (s, t) ordering.
    R = SC_MAX + n_sil_pad
    t_idx = jnp.arange(R)
    def spk_col(s):
        base = jnp.where(t_idx < sc_len,
                         scores[jnp.clip(t_idx, 0, SC_MAX - 1), s], _NEG)
        return jnp.where((t_idx >= sc_len) & (t_idx < sc_len + n_sil_pad),
                         jnp.inf, base)
    flat = jnp.concatenate([spk_col(s) for s in range(N_SPK)])   # (4R,)

    vals, order = jax.lax.top_k(flat, target)
    BIG = jnp.int32(4 * R + 1)
    key_sort = jnp.where(jnp.isneginf(vals), BIG, order.astype(jnp.int32))
    key_sorted = jax.lax.sort(key_sort)
    t = key_sorted % R
    disabled = (key_sorted == BIG) | (t >= sc_len)
    t_safe = jnp.clip(t, 0, SC_MAX - 1)
    new_embs = jnp.where(disabled[:, None], sil_emb[None, :], sc[t_safe])
    new_preds = jnp.where(disabled[:, None], 0.0, sc_preds[t_safe])

    sc_out = jnp.zeros_like(sc).at[:target].set(new_embs)
    scp_out = jnp.zeros_like(sc_preds).at[:target].set(new_preds)
    return sc_out, scp_out, jnp.int32(target)


def _state_update_dev(state: dict, key: tuple, chunk_embs, chunk_used,
                      chunk_preds, full_preds):
    """_state_update on fixed-shape buffers (streaming.py:_state_update)."""
    scfg = _scfg_from_key(key)
    F_MAX = state["fifo"].shape[0]
    CH_MAX = chunk_embs.shape[0]
    U_MAX = F_MAX + CH_MAX
    d = chunk_embs.shape[1]

    sc_len = state["sc_len"]
    fifo_len = state["fifo_len"]

    # refresh fifo preds from this round's full predictions
    fi = jnp.arange(F_MAX)
    fifo_preds = jnp.where((fi < fifo_len)[:, None],
                           _gather_rows(full_preds, sc_len, fi), 0.0)

    # upd = [fifo | chunk]
    ui = jnp.arange(U_MAX)
    from_fifo = ui < fifo_len
    upd = jnp.where(from_fifo[:, None],
                    _gather_rows(state["fifo"], 0, jnp.clip(ui, 0, F_MAX - 1)),
                    _gather_rows(chunk_embs, -fifo_len, ui))
    upd_preds = jnp.where(from_fifo[:, None],
                          _gather_rows(fifo_preds, 0, jnp.clip(ui, 0, F_MAX - 1)),
                          _gather_rows(chunk_preds, -fifo_len, ui))
    new_total = fifo_len + chunk_used
    upd_live = ui < new_total
    upd = jnp.where(upd_live[:, None], upd, 0.0)
    upd_preds = jnp.where(upd_live[:, None], upd_preds, 0.0)

    def no_pop(state):
        out = dict(state)
        out["fifo"] = upd[:F_MAX]
        out["fifo_preds"] = upd_preds[:F_MAX]
        out["fifo_len"] = new_total
        return out

    def pop_branch(state):
        pop = jnp.maximum(jnp.int32(scfg.spkcache_update_period),
                          chunk_used - scfg.fifo_len + fifo_len)
        pop = jnp.minimum(pop, new_total)

        # silence profile (closed-form running mean)
        sel = (ui < pop) & (upd_preds.sum(axis=1) < scfg.sil_threshold)
        cnt = sel.sum()
        ssum = (upd * sel[:, None]).sum(axis=0)
        n_new = state["n_sil"] + cnt
        mean = jnp.where(n_new > 0,
                         (state["sil_emb"] * state["n_sil"] + ssum)
                         / jnp.maximum(n_new, 1),
                         state["sil_emb"])

        fifo_new_len = new_total - pop
        fifo_new = jnp.where((fi < fifo_new_len)[:, None],
                             _gather_rows(upd, pop, fi), 0.0)
        fifo_preds_new = jnp.where((fi < fifo_new_len)[:, None],
                                   _gather_rows(upd_preds, pop, fi), 0.0)

        SC_MAX = state["sc"].shape[0]
        si = jnp.arange(SC_MAX)
        new_sc_len = sc_len + pop
        sc_new = jnp.where((si < sc_len)[:, None], state["sc"],
                           jnp.where((si < new_sc_len)[:, None],
                                     _gather_rows(upd, -sc_len, si), 0.0))
        # preds: existing when valid, else re-seeded from full_preds
        base_preds = jnp.where(state["sc_preds_valid"],
                               state["sc_preds"],
                               jnp.where((si < sc_len)[:, None],
                                         _gather_rows(full_preds, 0, si), 0.0))
        sc_preds_new = jnp.where((si < sc_len)[:, None], base_preds,
                                 jnp.where((si < new_sc_len)[:, None],
                                           _gather_rows(upd_preds, -sc_len, si),
                                           0.0))

        def compress(args):
            sc, scp, n = args
            return _compress_dev(sc, scp, n, mean, key)

        do = new_sc_len > scfg.spkcache_len
        sc_f, scp_f, len_f = jax.lax.cond(
            do, compress, lambda a: a, (sc_new, sc_preds_new, new_sc_len))

        out = dict(state)
        out.update(sc=sc_f, sc_preds=scp_f, sc_len=len_f,
                   sc_preds_valid=state["sc_preds_valid"] | do,
                   fifo=fifo_new, fifo_preds=fifo_preds_new,
                   fifo_len=fifo_new_len, sil_emb=mean, n_sil=n_new)
        return out

    return jax.lax.cond(new_total > scfg.fifo_len, pop_branch, no_pop, state)


def init_state_dev(scfg: StreamConfig, d_model: int, ch_max: int) -> dict:
    SC_MAX = scfg.spkcache_len + scfg.fifo_len + ch_max
    F_MAX = scfg.fifo_len + ch_max
    return {
        "sc": jnp.zeros((SC_MAX, d_model), jnp.float32),
        "sc_preds": jnp.zeros((SC_MAX, N_SPK), jnp.float32),
        "sc_len": jnp.int32(0),
        "sc_preds_valid": jnp.bool_(False),
        "fifo": jnp.zeros((F_MAX, d_model), jnp.float32),
        "fifo_preds": jnp.zeros((F_MAX, N_SPK), jnp.float32),
        "fifo_len": jnp.int32(0),
        "sil_emb": jnp.zeros(d_model, jnp.float32),
        "n_sil": jnp.int32(0),
    }


def _chunk_step(cfg, key: tuple, params, state: dict, chunk_mel, t_mel, lc,
                chunk_used, ch_max: int, t_comb: int):
    """One streaming chunk: preencode + [spkcache|fifo|chunk] assembly +
    head + AOSC state update, on fixed-shape device buffers. Shared by the
    whole-file scan below and the true-streaming step (stream_step_jit)."""
    pre = SM.preencode(cfg, params, chunk_mel[None], t_mel)[0]
    pre_len = SM.preenc_out_len(t_mel)   # integer ops, traces fine

    sc_len, fifo_len = state["sc_len"], state["fifo_len"]
    p_len = sc_len + fifo_len
    ci = jnp.arange(t_comb)
    from_sc = ci < sc_len
    from_fifo = (~from_sc) & (ci < p_len)
    combined = jnp.where(
        from_sc[:, None], _gather_rows(state["sc"], 0, jnp.clip(ci, 0, state["sc"].shape[0] - 1)),
        jnp.where(from_fifo[:, None],
                  _gather_rows(state["fifo"], -sc_len, ci),
                  _gather_rows(pre, -p_len, ci)))
    n_valid = p_len + pre_len
    full_preds = SM.head(cfg, params, combined[None], n_valid)[0]

    pred_start = p_len + lc
    oi = jnp.arange(ch_max)
    chunk_preds = jnp.where((oi < chunk_used)[:, None],
                            _gather_rows(full_preds, pred_start, oi), 0.0)
    chunk_embs = jnp.where((oi < chunk_used)[:, None],
                           _gather_rows(pre, lc, oi), 0.0)

    state = _state_update_dev(state, key, chunk_embs, chunk_used,
                              chunk_preds, full_preds)
    return state, chunk_preds


@functools.partial(jax.jit, static_argnames=("cfg", "key", "ch_max",
                                             "t_comb"))
def stream_step_jit(cfg, key: tuple, params, state: dict, chunk_mel,
                    scalars, ch_max: int, t_comb: int):
    """True-streaming single-chunk step with device-resident AOSC state.

    chunk_mel (mel_max, n_mels) zero-padded; scalars i32 packs
    (t_mel, lc, chunk_used). Returns (new state dict of device arrays,
    (ch_max, 4) chunk predictions — the only per-chunk fetch)."""
    return _chunk_step(cfg, key, params, state, chunk_mel,
                       scalars[0], scalars[1], scalars[2], ch_max, t_comb)


@functools.partial(jax.jit, static_argnames=("cfg", "key", "mel_max",
                                             "ch_max", "t_comb"))
def _diarize_scan_jit(cfg, key: tuple, params, mel, starts, t_mels, lcs,
                      chunk_useds, mel_max: int, ch_max: int, t_comb: int):
    """The whole chunk loop in one program. Returns (n_chunks, ch_max, 4)
    per-chunk predictions (live rows = chunk_useds[i])."""
    state = init_state_dev(_scfg_from_key(key), cfg.d_model, ch_max)

    def body(state, xs):
        start, t_mel, lc, chunk_used = xs
        chunk_mel = jax.lax.dynamic_slice(
            mel, (start, 0), (mel_max, mel.shape[1]))
        return _chunk_step(cfg, key, params, state, chunk_mel, t_mel, lc,
                           chunk_used, ch_max, t_comb)

    _, preds = jax.lax.scan(body, state,
                            (starts, t_mels, lcs, chunk_useds))
    return preds


@functools.partial(jax.jit, static_argnames=("cfg", "key", "mel_max",
                                              "ch_max", "t_comb"))
def _diarize_scan_batch_jit(cfg, key, params, mel_b, starts, t_mels, lcs,
                            chunk_useds, mel_max, ch_max, t_comb):
    """vmap of the single-file scan over a leading file axis (the chunk
    schedule is shared, so per-file states stay shape-aligned)."""
    def one(mel):
        return _diarize_scan_jit.__wrapped__(
            cfg, key, params, mel, starts, t_mels, lcs, chunk_useds,
            mel_max, ch_max, t_comb)
    return jax.vmap(one)(mel_b)


def _chunk_schedule(cfg, scfg: StreamConfig, feat_len: int):
    sub = cfg.subsampling
    starts, t_mels, lcs, useds = [], [], [], []
    stt = 0
    while stt < feat_len:
        end = min(stt + scfg.chunk_len * sub, feat_len)
        lo = min(scfg.chunk_left_context * sub, stt)
        ro = min(scfg.chunk_right_context * sub, feat_len - end)
        t = (end + ro) - (stt - lo)
        lc = round(lo / sub)
        rc = math.ceil(ro / sub)
        starts.append(stt - lo)
        t_mels.append(t)
        lcs.append(lc)
        useds.append(SM.preenc_out_len(t) - lc - rc)
        stt = end
    return starts, t_mels, lcs, useds


def _scan_args(cfg, scfg, starts, t_mels, lcs, useds):
    bucket = 64 * cfg.subsampling
    mel_max = max(-(-max(t_mels) // bucket) * bucket, bucket)
    ch_max = max(useds)
    t_comb_raw = scfg.spkcache_len + scfg.fifo_len + mel_max // cfg.subsampling
    t_comb = -(-t_comb_raw // 64) * 64
    xs = (jnp.asarray(starts, jnp.int32), jnp.asarray(t_mels, jnp.int32),
          jnp.asarray(lcs, jnp.int32), jnp.asarray(useds, jnp.int32))
    return mel_max, ch_max, t_comb, xs


def _check_scfg(scfg: StreamConfig):
    per_spk = scfg.spkcache_len // N_SPK - scfg.spkcache_sil_frames_per_spk
    assert int(per_spk * scfg.weak_boost_rate) <= scfg.spkcache_len, \
        "device AOSC requires weak_k <= spkcache_len (top_k size is static)"


def diarize_device(diarizer, samples: np.ndarray,
                   scfg: StreamConfig | None = None) -> np.ndarray:
    """Single-dispatch diarization (same output as SortformerDiarizer.diarize
    up to float associativity; see module docstring)."""
    cfg = diarizer.cfg
    scfg = scfg or StreamConfig()
    _check_scfg(scfg)

    mel, seq_len = SM.compute_mel(cfg, diarizer.params, samples)
    feat_len = int(seq_len)
    starts, t_mels, lcs, useds = _chunk_schedule(cfg, scfg, feat_len)
    if not starts:
        return np.zeros((0, N_SPK), np.float32)
    mel_max, ch_max, t_comb, xs = _scan_args(cfg, scfg, starts, t_mels,
                                             lcs, useds)
    n_pad = starts[-1] + mel_max - mel.shape[0]
    if n_pad > 0:       # pad on device — no host round trip for the mel
        mel = jnp.pad(mel, ((0, n_pad), (0, 0)))

    preds = np.asarray(_diarize_scan_jit(
        cfg, _scfg_key(scfg), diarizer.params, mel, *xs,
        mel_max, ch_max, t_comb))
    return np.concatenate([preds[i, :useds[i]] for i in range(len(useds))])


def diarize_device_batch(diarizer, audios: list[np.ndarray],
                         scfg: StreamConfig | None = None) -> list[np.ndarray]:
    """Batched single-dispatch diarization over several files in lockstep
    (chunk schedule follows the batch maximum — same semantics as
    SortformerDiarizer.diarize_batch)."""
    if not audios:
        return []
    cfg = diarizer.cfg
    scfg = scfg or StreamConfig()
    _check_scfg(scfg)

    mels, seq_lens = [], []
    for a in audios:
        m, s = SM.compute_mel(cfg, diarizer.params, np.asarray(a, np.float32))
        mels.append(m)
        seq_lens.append(int(s))
    feat_len = max(seq_lens)
    starts, t_mels, lcs, useds = _chunk_schedule(cfg, scfg, feat_len)
    if not starts:
        return [np.zeros((0, N_SPK), np.float32) for _ in audios]
    mel_max, ch_max, t_comb, xs = _scan_args(cfg, scfg, starts, t_mels,
                                             lcs, useds)
    rows = max(max(m.shape[0] for m in mels), starts[-1] + mel_max)
    # pad + stack on device (no host round trip for the mels)
    mel_b = jnp.stack([jnp.pad(m, ((0, rows - m.shape[0]), (0, 0)))
                       for m in mels])

    preds = np.asarray(_diarize_scan_batch_jit(
        cfg, _scfg_key(scfg), diarizer.params, mel_b, *xs,
        mel_max, ch_max, t_comb))           # (B, n_chunks, ch_max, 4)
    out = []
    for b, sl in enumerate(seq_lens):
        full = np.concatenate([preds[b, i, :useds[i]]
                               for i in range(len(useds))])
        out.append(full[:-(-sl // cfg.subsampling)])
    return out
