"""Benchmark: whisper large-v3-turbo encoder/decoder throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric is real-time factor for large-v3-turbo:
    RTF = 30 s audio / (1 encoder pass + 200 decoded tokens)
vs_baseline compares against the reference's best published number for the
same model (M2 Ultra Metal FA=1: Enc 148.79 ms, Dec 1.30 ms/token
-> RTF ~= 73.4x; BASELINE.md / scripts/bench-all-gg.txt:166).

All timed regions are N iterations chained with data dependencies inside one
jit dispatch (lax.scan / lax.while_loop), so dispatch overhead and async
tunnel latency don't contaminate the per-iteration numbers.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

MODEL = "large-v3-turbo"
BASELINE_ENC_MS = 148.79
BASELINE_DEC_MS = 1.30
N_DEC_TOKENS = 200


def main():
    import os

    import jax

    # persistent compile cache: cold compiles via the remote compile service
    # can take minutes; caching makes repeat bench runs warm-start
    from open_whisper_kit_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.join(os.path.dirname(__file__) or ".",
                                      ".jax_cache"))

    import jax.numpy as jnp

    from open_whisper_kit_tpu.models.whisper import model as M

    cfg = M.PRESETS[MODEL]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))

    # ---- encoder: N chained passes in one dispatch ----
    N_ENC = 8

    @jax.jit
    def enc_loop(enc_params, mel0):
        def body(x, _):
            out = M.encode(cfg, enc_params, x)
            # data dependency: perturb the input with the output's mean
            x2 = mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6
            return x2, ()
        x, _ = jax.lax.scan(body, mel0, None, length=N_ENC)
        return jnp.sum(x)

    float(enc_loop(params["encoder"], mel))  # warm + fetch
    t0 = time.perf_counter()
    float(enc_loop(params["encoder"], mel))
    enc_s = (time.perf_counter() - t0) / N_ENC

    # ---- decoder: K chained greedy steps in one dispatch ----
    # production decode path: fused qkv projection (prepare_decoder)
    dec_prepared = M.prepare_decoder(params["decoder"])
    enc_out = M.encode(cfg, params["encoder"], mel)
    xk, xv = M.cross_kv(cfg, dec_prepared, enc_out)

    def make_dec_loop(batch, length):
        @jax.jit
        def dec_loop(dec_params, xk, xv):
            kv_k, kv_v = M.init_kv_cache(cfg, batch, dtype=jnp.bfloat16)
            tok0 = jnp.zeros((batch, 1), jnp.int32)

            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, dec_params, tok, kv_k, kv_v, head, xk, xv)
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()

            (tok, _, _, _), _ = jax.lax.scan(
                body, (tok0, kv_k, kv_v, jnp.int32(0)), None, length=length)
            return jnp.sum(tok)
        return dec_loop

    K = 256
    dec_loop = make_dec_loop(1, K)
    float(dec_loop(dec_prepared, xk, xv))
    t0 = time.perf_counter()
    float(dec_loop(dec_prepared, xk, xv))
    dec_s = (time.perf_counter() - t0) / K

    # ---- batch-of-5 decode (reference's Bch5 column) ----
    xk5 = jnp.repeat(xk, 5, axis=1)
    xv5 = jnp.repeat(xv, 5, axis=1)
    dec5_loop = make_dec_loop(5, K)
    float(dec5_loop(dec_prepared, xk5, xv5))
    t0 = time.perf_counter()
    float(dec5_loop(dec_prepared, xk5, xv5))
    bch5_s = (time.perf_counter() - t0) / K

    # ---- prompt processing (PP column): 256 tokens in one pass ----
    @jax.jit
    def pp(dec_params, xk, xv):
        kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
        toks = jnp.zeros((1, 256), jnp.int32)
        logits, _, _, _ = M.decode_impl(cfg, dec_params, toks, kv_k, kv_v,
                                        jnp.int32(0), xk, xv)
        return jnp.sum(logits[:, -1])

    float(pp(dec_prepared, xk, xv))
    t0 = time.perf_counter()
    float(pp(dec_prepared, xk, xv))
    pp_s = (time.perf_counter() - t0) / 256

    # ---- batched serving throughput: B windows, enc + 200 tokens each ----
    B = 16

    @jax.jit
    def batched_round(p, melB):
        enc = M.encode(cfg, p["encoder"], melB)
        xkB, xvB = M.cross_kv(cfg, p["decoder"], enc)
        kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        tok = jnp.zeros((B, 1), jnp.int32)

        def body(carry, _):
            tok, kv_k, kv_v, head = carry
            logits, kv_k, kv_v, _ = M.decode_impl(
                cfg, p["decoder"], tok, kv_k, kv_v, head, xkB, xvB)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (tok, kv_k, kv_v, head + 1), ()

        (tok, _, _, _), _ = jax.lax.scan(
            body, (tok, kv_k, kv_v, jnp.int32(0)), None, length=N_DEC_TOKENS)
        return jnp.sum(tok)

    melB = jnp.zeros((B, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)
    params_prep = {"encoder": params["encoder"], "decoder": dec_prepared}
    float(batched_round(params_prep, melB))
    t0 = time.perf_counter()
    float(batched_round(params_prep, melB))
    batched_sps = B * 30.0 / (time.perf_counter() - t0)

    # quantized serving mode: int8 logits planes + int8 cross-KV (opt-in
    # decoder_int8 / cross_kv_int8 flags; q8_0-level numerics)
    @jax.jit
    def batched_round_q8(p, melB):
        enc = M.encode(cfg, p["encoder"], melB)
        xkB, xvB = M.cross_kv(cfg, p["decoder"], enc)
        xkB, xvB = M.quantize_cross_kv(xkB), M.quantize_cross_kv(xvB)
        kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        tok = jnp.zeros((B, 1), jnp.int32)

        def body(carry, _):
            tok, kv_k, kv_v, head = carry
            logits, kv_k, kv_v, _ = M.decode_impl(
                cfg, p["decoder"], tok, kv_k, kv_v, head, xkB, xvB)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (tok, kv_k, kv_v, head + 1), ()

        (tok, _, _, _), _ = jax.lax.scan(
            body, (tok, kv_k, kv_v, jnp.int32(0)), None, length=N_DEC_TOKENS)
        return jnp.sum(tok)

    dec_int8_full = M.quantize_decoder_int8(dec_prepared)
    params_q8 = {"encoder": params["encoder"], "decoder": dec_int8_full}
    float(batched_round_q8(params_q8, melB))
    t0 = time.perf_counter()
    float(batched_round_q8(params_q8, melB))
    batched_q8_sps = B * 30.0 / (time.perf_counter() - t0)

    # ---- true end-to-end: whisper_full on 30 s of audio (mel + windows +
    # fused device decode + segment assembly) ----
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams

    ctx = F.WhisperContext.from_preset(MODEL, dtype=jnp.bfloat16)
    audio = np.random.default_rng(0).standard_normal(16000 * 30).astype(np.float32) * 0.1
    fp = FullParams(print_progress=False)
    fp.greedy.best_of = 1
    fp.temperature_inc = 0
    F.whisper_full(ctx, fp, audio)          # warm
    e2e_best = 1e9
    for _ in range(3):                      # relay jitter: take the best
        t0 = time.perf_counter()
        F.whisper_full(ctx, fp, audio)
        e2e_best = min(e2e_best, time.perf_counter() - t0)
    e2e_rtf = 30.0 / e2e_best

    # same pipeline in the W4 serving mode (megakernel="int4")
    fp4 = FullParams(print_progress=False, megakernel="int4")
    fp4.greedy.best_of = 1
    fp4.temperature_inc = 0
    F.whisper_full(ctx, fp4, audio)         # warm
    e2e4_best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        F.whisper_full(ctx, fp4, audio)
        e2e4_best = min(e2e4_best, time.perf_counter() - t0)
    e2e4_rtf = 30.0 / e2e4_best

    # beam-5 quality mode end-to-end, through the beam megakernel
    # (origin-table lineage, int4 planes — the Bch5 serving path).
    # Best-effort: a failure here must not sink the headline metric.
    e2eb_rtf = None
    try:
        from open_whisper_kit_tpu.decode.params import SamplingStrategy
        fpb = FullParams(print_progress=False, megakernel="int4",
                         strategy=SamplingStrategy.BEAM_SEARCH)
        fpb.beam_search.beam_size = 5
        fpb.temperature_inc = 0
        F.whisper_full(ctx, fpb, audio)     # warm
        e2eb_best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            F.whisper_full(ctx, fpb, audio)
            e2eb_best = min(e2eb_best, time.perf_counter() - t0)
        e2eb_rtf = round(30.0 / e2eb_best, 1)
    except Exception as e:                      # pragma: no cover
        print(f"beam e2e failed: {e!r}", file=sys.stderr)

    # ---- decoder with runtime int8 logits (decoder_int8 path) ----
    dec8_loop = make_dec_loop(1, K)
    float(dec8_loop(dec_int8_full, xk, xv))
    t0 = time.perf_counter()
    float(dec8_loop(dec_int8_full, xk, xv))
    dec8_s = (time.perf_counter() - t0) / K

    # ---- single-kernel decoder (ops/decode_megakernel), int8-all mode:
    # all layers + logits in one pallas_call, weights as int8 planes
    # dequantized inline (the FullParams.megakernel="int8" W8 serving
    # path; -17% vs the XLA int8-logits step, in-situ interleaved A/B) ----
    from open_whisper_kit_tpu.ops import decode_megakernel as MK
    mp = MK.prepare_mega(cfg, dec_prepared, quant="all")
    L = cfg.n_text_layer
    S = cfg.n_text_state
    Tc = cfg.n_text_ctx
    xk_nat = jnp.transpose(xk[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)
    xv_nat = jnp.transpose(xv[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)

    @jax.jit
    def mega_loop(mp, te, pe, xkn, xvn):
        nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
        nv = jnp.zeros((L, Tc, S), jnp.bfloat16)

        def body(carry, i):
            tok, nk, nv = carry
            x0 = (te[tok] + pe[i])[None].astype(jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step(cfg, mp, x0, nk, nv, i,
                                                 xkn, xvn)
            return (jnp.argmax(logits[0]).astype(jnp.int32), nk, nv), ()

        (tok, _, _), _ = jax.lax.scan(
            body, (jnp.int32(0), nk, nv), jnp.arange(K))
        return tok

    args = (mp, dec_prepared["te"], dec_prepared["pe"], xk_nat, xv_nat)
    float(mega_loop(*args))
    t0 = time.perf_counter()
    float(mega_loop(*args))
    mega_s = (time.perf_counter() - t0) / K

    # int4 mode (FullParams.megakernel="int4" W4 serving path; -14% vs
    # int8-all, interleaved in-situ A/B: 297 vs 344 us/token on v5e)
    mp4 = MK.prepare_mega(cfg, dec_prepared, quant="int4")
    args4 = (mp4, dec_prepared["te"], dec_prepared["pe"], xk_nat, xv_nat)
    float(mega_loop(*args4))
    t0 = time.perf_counter()
    float(mega_loop(*args4))
    mega4_s = (time.perf_counter() - t0) / K

    # ---- beam-5 megakernel: all beams in one kernel launch through one
    # weight stream; per-step beam reorder is an origin-table update
    # (lineage masking — NO physical KV gather; see
    # ops/decode_megakernel.beam_attn_bias). tools/bench_beam_ab.py is
    # the A/B harness — the XLA batched step pays a physical reorder and
    # measures ~2.0 ms/token on the same workload. ----
    BB = 5
    src = jnp.asarray((np.arange(BB) + 1) % BB, jnp.int32)

    @jax.jit
    def mega_beam_loop(mp, te, pe, xkn, xvn):
        nk = jnp.zeros((L, Tc * BB, S), jnp.bfloat16)
        nv = jnp.zeros((L, Tc * BB, S), jnp.bfloat16)
        origin = jnp.broadcast_to(
            jnp.arange(BB, dtype=jnp.int32)[:, None], (BB, Tc))

        def body(carry, i):
            toks, nk, nv, origin = carry
            origin = jnp.take(origin, src, axis=0).at[:, i].set(
                jnp.arange(BB, dtype=jnp.int32))
            bias = MK.beam_attn_bias(origin, i, Tc)
            x0 = (te[toks] + pe[i][None]).astype(jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step_beam(
                cfg, mp, x0, nk, nv, i, xkn, xvn, attn_bias=bias)
            return (jnp.argmax(logits, -1).astype(jnp.int32), nk, nv,
                    origin), ()

        (toks, _, _, _), _ = jax.lax.scan(
            body, (jnp.zeros((BB,), jnp.int32), nk, nv, origin),
            jnp.arange(K))
        return jnp.sum(toks)

    mega_b5_ms = None
    try:
        argsb = (mp4, dec_prepared["te"], dec_prepared["pe"], xk_nat,
                 xv_nat)
        float(mega_beam_loop(*argsb))
        t0 = time.perf_counter()
        float(mega_beam_loop(*argsb))
        mega_b5_ms = round((time.perf_counter() - t0) / K * 1e3, 3)
    except Exception as e:                      # pragma: no cover
        print(f"beam kernel bench failed: {e!r}", file=sys.stderr)

    rtf = 30.0 / (enc_s + N_DEC_TOKENS * dec_s)
    baseline_rtf = 30.0 / ((BASELINE_ENC_MS + N_DEC_TOKENS * BASELINE_DEC_MS) / 1e3)

    result = {
        "metric": f"rtf_{MODEL.replace('-', '_')}",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / baseline_rtf, 3),
        "detail": {
            "enc_ms": round(enc_s * 1e3, 2),
            "dec_ms_per_token": round(dec_s * 1e3, 3),
            "dec_mega_int8_ms_per_token": round(mega_s * 1e3, 3),
            "dec_mega_int4_ms_per_token": round(mega4_s * 1e3, 3),
            "dec_int8_ms_per_token": round(dec8_s * 1e3, 3),
            "bch5_ms_per_token": round(bch5_s * 1e3, 3),
            "dec_mega_beam5_ms_per_token": mega_b5_ms,
            "pp_ms_per_token": round(pp_s * 1e3, 4),
            "baseline_enc_ms": BASELINE_ENC_MS,
            "baseline_dec_ms": BASELINE_DEC_MS,
            "baseline_rtf": round(baseline_rtf, 1),
            "batched16_audio_sec_per_sec": round(batched_sps, 1),
            "batched16_int8_audio_sec_per_sec": round(batched_q8_sps, 1),
            "e2e_whisper_full_rtf": round(e2e_rtf, 1),
            "e2e_whisper_full_int4_rtf": round(e2e4_rtf, 1),
            "e2e_whisper_full_beam5_int4_rtf": e2eb_rtf,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
