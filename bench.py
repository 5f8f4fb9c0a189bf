"""Benchmark: whisper large-v3-turbo encoder/decoder throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric is real-time factor for large-v3-turbo:
    RTF = 30 s audio / (1 encoder pass + 200 decoded tokens)
vs_baseline compares against the reference's best published number for the
same model (M2 Ultra Metal FA=1: Enc 148.79 ms, Dec 1.30 ms/token
-> RTF ~= 73.4x; BASELINE.md / scripts/bench-all-gg.txt:166).

Hardened against backend faults AND against the wrapper itself being
killed (the round-3 lesson: the driver's timeout killed the wrapper,
which had buffered the child's output with capture_output — rc=124,
empty artifact, a whole round with no captured number):

* the `--impl` child's stdout is STREAMED line-by-line straight through
  to this process's stdout as it arrives (tee, not capture_output) — any
  external kill of the wrapper leaves the last flushed JSON line in the
  driver's capture;
* a hard overall budget (`OWK_BENCH_BUDGET_S`, default 780 s) bounds the
  whole run: the child gets the remaining budget and SKIPS lower-priority
  sections once past its deadline; the wrapper additionally terminates
  the child at the budget (the already-streamed lines stand);
* sections run in priority order: headline enc/dec -> megakernel
  int8/int4 -> beam5 -> e2e whisper_full -> sortformer -> extras;
* this entry process never touches the TPU itself — it probes backend
  health with a small matmul in a SUBPROCESS under a hard timeout,
  retrying with (budget-bounded) backoff;
* on total failure it still exits 0 and prints a well-formed JSON line
  with value 0.0, an "error" field, and host-side (CPU) metrics — the
  artifact is never unparseable.

All timed regions are N iterations chained with data dependencies inside one
jit dispatch (lax.scan / lax.while_loop), so dispatch overhead and async
tunnel latency don't contaminate the per-iteration numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MODEL = os.environ.get("OWK_BENCH_MODEL", "large-v3-turbo")  # override for plumbing tests
BASELINE_ENC_MS = 148.79
BASELINE_DEC_MS = 1.30
N_DEC_TOKENS = 200
# streaming-sortformer/README.md:21 — ~110x RT, F16 CoreML/ANE, M3 MBP
BASELINE_SORTFORMER_RTF = 110.0

# Overall wall-clock budget for the WHOLE bench run (probe + impl + retry).
# The driver's own timeout is unknown; default well under plausible limits.
BUDGET_S = float(os.environ.get("OWK_BENCH_BUDGET_S", "780"))
PROBE_TIMEOUT_S = int(os.environ.get("OWK_BENCH_PROBE_TIMEOUT", "120"))
# 3 probe attempts; sleeps between them total ~60 s (retry-with-backoff)
PROBE_SLEEPS_S = tuple(
    int(s) for s in os.environ.get(
        "OWK_BENCH_PROBE_SLEEPS", "0,20,40").split(","))

# plumbing-test escape hatch: the environment's sitecustomize pins
# jax.config to the axon tunnel (beats JAX_PLATFORMS), so CPU smoke runs
# need an explicit config override on every subprocess in the chain
FORCE_CPU = bool(os.environ.get("OWK_BENCH_FORCE_CPU"))
_CPU_PIN = ('import jax\njax.config.update("jax_platforms", "cpu")\n'
            if FORCE_CPU else "")

_PROBE_SRC = _CPU_PIN + """
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
(x @ x).block_until_ready()
print("PROBE_OK", jax.devices()[0])
"""

_HOST_SRC = """
import json, sys, time
sys.path.insert(0, %r)
# the environment's sitecustomize pins the platform to the axon TPU tunnel
# in jax.config, which beats the JAX_PLATFORMS env var at backend init —
# force CPU explicitly or this fallback hangs on the dead tunnel too
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from open_whisper_kit_tpu.audio import mel as mel_mod
from open_whisper_kit_tpu.decode.full import _synthetic_mel_filters
filters = _synthetic_mel_filters(128)
audio = np.random.default_rng(0).standard_normal(16000 * 30).astype(np.float32)
m = mel_mod.log_mel_spectrogram(audio, filters)   # warm/compile
np.asarray(m.data if hasattr(m, "data") else m)
t0 = time.perf_counter()
m = mel_mod.log_mel_spectrogram(audio, filters)
np.asarray(m.data if hasattr(m, "data") else m)
dt = time.perf_counter() - t0
print(json.dumps({"host_mel_rtf_cpu": round(30.0 / dt, 1)}))
""" % (REPO,)


def _probe(timeout: float) -> tuple[bool, str]:
    """Backend health check in a subprocess: a real device matmul fetched
    back, under a hard timeout (handles both init errors and compute hangs).
    """
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True, timeout=timeout,
                           cwd=REPO)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout}s (backend hang)"
    except Exception as e:  # noqa: BLE001
        return False, f"probe spawn failed: {e!r}"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    msg = (r.stderr or r.stdout or "").strip()
    return False, f"probe rc={r.returncode}: ...{msg[-400:]}"


def _host_metrics() -> dict:
    """CPU-only fallback metrics so a dead chip still yields data."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        r = subprocess.run([sys.executable, "-c", _HOST_SRC],
                           capture_output=True, text=True, timeout=600,
                           cwd=REPO, env=env)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except Exception:  # noqa: BLE001
        pass
    return {}


def _emit_failure(attempts: list[str]) -> None:
    detail = {"attempts": attempts}
    detail.update(_host_metrics())
    print(json.dumps({
        "metric": f"rtf_{MODEL.replace('-', '_')}",
        "value": 0.0,
        "unit": "x_realtime",
        "vs_baseline": 0.0,
        "error": attempts[-1] if attempts else "unknown",
        "detail": detail,
    }))


def _stream_impl(deadline: float, attempts: list[str]) -> tuple[bool, bool]:
    """Run `--impl` in a subprocess, tee-ing its stdout straight through.

    Every line the child flushes is immediately re-printed (flushed) on OUR
    stdout — so even if this wrapper is killed externally mid-run, the
    driver's capture already holds the last JSON line. Returns
    (emitted_any_json, clean_exit).
    """
    remain = deadline - time.monotonic()
    if remain <= 10:
        attempts.append("no budget left for impl")
        return False, False
    # the child stops BETWEEN sections at its own deadline; leave it real
    # margin so its final (richest) emit lands before the hard kill
    env = dict(os.environ, OWK_BENCH_IMPL_BUDGET_S=str(max(10.0, remain - 45)))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--impl"],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, bufsize=1,
        cwd=REPO, env=env)
    emitted = False
    killed = False
    import threading

    def _watchdog():
        while proc.poll() is None:
            if time.monotonic() >= deadline:
                nonlocal_kill()
                return
            time.sleep(1.0)

    def nonlocal_kill():
        nonlocal killed
        killed = True
        try:
            proc.terminate()
        except OSError:
            pass
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

    wd = threading.Thread(target=_watchdog, daemon=True)
    wd.start()
    assert proc.stdout is not None
    for line in proc.stdout:
        line = line.rstrip("\n")
        if line.startswith("{"):
            try:
                json.loads(line)
            except ValueError:
                print(line, file=sys.stderr, flush=True)
            else:
                print(line, flush=True)    # straight through to the driver
                emitted = True
                continue
        if line:
            print(line, file=sys.stderr, flush=True)
    rc = proc.wait()
    if killed:
        attempts.append("impl terminated at budget (streamed lines stand)")
    elif rc != 0:
        attempts.append(f"impl rc={rc}")
    return emitted, (rc == 0 and not killed)


def main() -> None:
    if "--impl" in sys.argv:
        impl_main()
        return

    deadline = time.monotonic() + BUDGET_S
    attempts: list[str] = []
    ok = False
    for sleep_s in PROBE_SLEEPS_S:
        if sleep_s:
            time.sleep(min(sleep_s, max(0.0, deadline - time.monotonic())))
        if time.monotonic() >= deadline:
            break
        ok, info = _probe(min(PROBE_TIMEOUT_S,
                              max(5.0, deadline - time.monotonic())))
        attempts.append(info)
        if ok:
            break

    emitted = False
    if ok:
        emitted, clean = _stream_impl(deadline, attempts)
        if clean and emitted:
            return
        # one retry if the child crashed early with budget to spare
        # (warm compile cache makes the second pass much faster)
        if not clean and deadline - time.monotonic() > 60:
            ok2, info2 = _probe(min(PROBE_TIMEOUT_S,
                                    max(5.0, deadline - time.monotonic())))
            attempts.append(info2)
            if ok2:
                emitted2, _ = _stream_impl(deadline, attempts)
                emitted = emitted or emitted2

    if not emitted:
        _emit_failure(attempts)


def impl_main():
    import jax
    if FORCE_CPU:
        jax.config.update("jax_platforms", "cpu")
    # NOTE on init: fixed-length loop sections (enc/dec/mega/batched/
    # matrix) use device-side init_params(device=True) — values are
    # irrelevant there and host init uploads hundreds of MB through the
    # tunnel. e2e sections keep HOST init (seed 0): their wall time
    # depends on the decoded trajectory, so the weights must stay the
    # same draw across rounds to be comparable.

    # hard per-child budget handed down by the wrapper: once past the
    # deadline, remaining (lower-priority) sections are skipped so the
    # final emitted line is the artifact
    impl_deadline = time.monotonic() + float(
        os.environ.get("OWK_BENCH_IMPL_BUDGET_S", "1e9"))

    # persistent compile cache: cold compiles via the remote compile service
    # can take minutes; caching makes repeat bench runs warm-start
    from open_whisper_kit_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.join(REPO, ".jax_cache"))

    import jax.numpy as jnp

    from open_whisper_kit_tpu.models.whisper import model as M

    errors: dict[str, str] = {}

    # ---- relay round-trip time: on tunneled sessions a single host
    # fetch costs 5-30 ms (measured 26 ms on a bad session) — every
    # "wall time of one call" number below carries one RTT. Record it
    # so the artifact itself says how much of e2e is tunnel, not TPU.
    _rtt_f = jax.jit(lambda x: x * 2.0)
    float(_rtt_f(jnp.float32(1.0)))
    _rtts = []
    for _i in range(8):
        _t0 = time.perf_counter()
        float(_rtt_f(jnp.float32(1.0 + _i)))
        _rtts.append(time.perf_counter() - _t0)
    _rtts.sort()
    relay_rtt_ms = round(_rtts[len(_rtts) // 2] * 1e3, 2)

    cfg = M.PRESETS[MODEL]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16,
                           device=not FORCE_CPU)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (1, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))

    # ---- encoder: N chained passes in one dispatch (N large enough
    # that the single result fetch's RTT is <1 ms of per-pass bias) ----
    N_ENC = 48

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

    def make_dec_loop(batch, length, repeats=3):
        # `repeats` full decodes (cache re-initialized each time) per
        # dispatch: one fetch per length*repeats steps keeps the relay
        # RTT bias on ms/token under 0.04 ms
        @jax.jit
        def dec_loop(dec_params, xk, xv):
            def one(seed):
                kv_k, kv_v = M.init_kv_cache(cfg, batch, dtype=jnp.bfloat16)
                tok0 = jnp.full((batch, 1), seed, jnp.int32)

                def body(carry, _):
                    tok, kv_k, kv_v, head = carry
                    logits, kv_k, kv_v, _ = M.decode_impl(
                        cfg, dec_params, tok, kv_k, kv_v, head, xk, xv)
                    tok = jnp.argmax(logits[:, -1], axis=-1).astype(
                        jnp.int32)[:, None]
                    return (tok, kv_k, kv_v, head + 1), ()

                (tok, _, _, _), _ = jax.lax.scan(
                    body, (tok0, kv_k, kv_v, jnp.int32(0)), None,
                    length=length)
                return jnp.sum(tok)

            acc, _ = jax.lax.scan(
                lambda a, s: (a + one(s), ()),
                jnp.int32(0), jnp.arange(repeats, dtype=jnp.int32))
            return acc
        return dec_loop

    K = 256
    R_DEC = 3
    dec_loop = make_dec_loop(1, K, R_DEC)
    float(dec_loop(dec_prepared, xk, xv))
    t0 = time.perf_counter()
    float(dec_loop(dec_prepared, xk, xv))
    dec_s = (time.perf_counter() - t0) / (K * R_DEC)

    # headline is now available; everything further is best-effort
    rtf = 30.0 / (enc_s + N_DEC_TOKENS * dec_s)
    baseline_rtf = 30.0 / ((BASELINE_ENC_MS + N_DEC_TOKENS * BASELINE_DEC_MS) / 1e3)
    detail = {
        "enc_ms": round(enc_s * 1e3, 2),
        "dec_ms_per_token": round(dec_s * 1e3, 3),
        "baseline_enc_ms": BASELINE_ENC_MS,
        "baseline_dec_ms": BASELINE_DEC_MS,
        "baseline_rtf": round(baseline_rtf, 1),
        "device": str(jax.devices()[0]),
        "relay_rtt_ms": relay_rtt_ms,
    }

    def emit():
        """Print the current (monotonically richer) result line; the
        wrapper keeps only the LAST one, so a watchdog kill mid-section
        still yields every column measured so far."""
        print(json.dumps({
            "metric": f"rtf_{MODEL.replace('-', '_')}",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / baseline_rtf, 3),
            "detail": dict(detail, **({"errors": errors} if errors else {})),
        }), flush=True)

    emit()                      # headline locked in

    sections: dict[str, object] = {}

    def _try(name, fn):
        # register only — sections run in PRIORITY order at the bottom
        sections[name] = fn

    def _run(name):
        fn = sections.get(name)
        if fn is None:
            return
        if time.monotonic() >= impl_deadline:
            errors[name] = "skipped (budget)"
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — one column never sinks the rest
            errors[name] = repr(e)[:300]
            print(f"bench section {name} failed: {e!r}", file=sys.stderr)
        emit()                  # checkpoint the artifact after every section

    # ---- batch-of-5 decode (reference's Bch5 column) ----
    def bch5():
        xk5 = jnp.repeat(xk, 5, axis=1)
        xv5 = jnp.repeat(xv, 5, axis=1)
        dec5_loop = make_dec_loop(5, K, 2)
        float(dec5_loop(dec_prepared, xk5, xv5))
        t0 = time.perf_counter()
        float(dec5_loop(dec_prepared, xk5, xv5))
        detail["bch5_ms_per_token"] = round(
            (time.perf_counter() - t0) / (K * 2) * 1e3, 3)
    _try("bch5", bch5)

    # ---- prompt processing (PP column): 256 tokens in one pass ----
    def pp_col():
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
        detail["pp_ms_per_token"] = round((time.perf_counter() - t0) / 256 * 1e3, 4)
    _try("pp", pp_col)

    # ---- batched serving throughput: B windows, enc + 200 tokens each ----
    B = 16
    melB = jnp.zeros((B, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)
    dec_int8_full = M.quantize_decoder_int8(dec_prepared)

    def make_batched_round(quant_cross):
        # staged-width self-KV (128 -> 256), same as the production
        # no-context batched path (decode/batch.py::_kv_stage_widths):
        # masked tail columns are exact softmax zeros, so the narrow
        # stages are bit-identical while reading less self-KV per step
        # the hand-rolled 128->256 stage pair below is only bit-identical
        # while every decoded position fits the widened cache
        assert N_DEC_TOKENS <= 256, "staged widths assume N_DEC_TOKENS <= 256"

        @jax.jit
        def batched_round(p, melB):
            enc = M.encode(cfg, p["encoder"], melB)
            xkB, xvB = M.cross_kv(cfg, p["decoder"], enc)
            if quant_cross:
                xkB, xvB = M.quantize_cross_kv(xkB), M.quantize_cross_kv(xvB)
            kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16, width=128)
            tok = jnp.zeros((B, 1), jnp.int32)

            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, p["decoder"], tok, kv_k, kv_v, head, xkB, xvB)
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()

            carry = (tok, kv_k, kv_v, jnp.int32(0))
            carry, _ = jax.lax.scan(body, carry, None,
                                    length=min(128, N_DEC_TOKENS))
            if N_DEC_TOKENS > 128:
                tok, kv_k, kv_v, head = carry
                carry = (tok, M.widen_kv_cache(kv_k, 256),
                         M.widen_kv_cache(kv_v, 256), head)
                carry, _ = jax.lax.scan(body, carry, None,
                                        length=N_DEC_TOKENS - 128)
            return jnp.sum(carry[0])
        return batched_round

    def batched():
        fn = make_batched_round(False)
        p = {"encoder": params["encoder"], "decoder": dec_prepared}
        float(fn(p, melB))
        t0 = time.perf_counter()
        float(fn(p, melB))
        detail["batched16_audio_sec_per_sec"] = round(
            B * 30.0 / (time.perf_counter() - t0), 1)
    _try("batched16", batched)

    enc8_params = None

    def get_enc8():
        nonlocal enc8_params
        if enc8_params is None:
            from open_whisper_kit_tpu.ops.encoder_int8 import (
                prepare_encoder_int8)
            enc8_params = prepare_encoder_int8(cfg, params["encoder"])
        return enc8_params

    def enc_int8():
        # W8A8 MXU encoder (ops/encoder_int8): the VERDICT r4 #1 lever —
        # the bf16 encoder is compute-bound at ~57% MFU; int8 systolic
        # peak is ~2x. Numerics pinned in tests/test_encoder_int8.py.
        e8 = get_enc8()

        @jax.jit
        def enc8_loop(e8, mel0):
            def body(x, _):
                out = M.encode(cfg, e8, x)
                x2 = mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6
                return x2, ()
            x, _ = jax.lax.scan(body, mel0, None, length=N_ENC)
            return jnp.sum(x)

        float(enc8_loop(e8, mel))
        t0 = time.perf_counter()
        float(enc8_loop(e8, mel))
        detail["enc_int8_ms"] = round((time.perf_counter() - t0) / N_ENC * 1e3, 2)
    _try("enc_int8", enc_int8)

    def batched_q8():
        # quantized serving mode: int8 ENCODER + int8 logits planes +
        # int8 cross-KV (decoder_int8 / cross_kv_int8 / encoder_int8;
        # q8_0-level numerics end to end)
        fn = make_batched_round(True)
        p = {"encoder": get_enc8(), "decoder": dec_int8_full}
        float(fn(p, melB))
        t0 = time.perf_counter()
        float(fn(p, melB))
        detail["batched16_int8_audio_sec_per_sec"] = round(
            B * 30.0 / (time.perf_counter() - t0), 1)
    _try("batched16_int8", batched_q8)

    # ---- true end-to-end: whisper_full on 30 s of audio (mel + windows +
    # fused device decode + segment assembly) ----
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams, SamplingStrategy

    ctx = F.WhisperContext.from_preset(MODEL, dtype=jnp.bfloat16)
    audio = np.random.default_rng(0).standard_normal(16000 * 30).astype(np.float32) * 0.1

    def e2e_best_of_3(fp, key):
        F.whisper_full(ctx, fp, audio)      # warm
        best = 1e9
        for _ in range(3):                  # relay jitter: take the best
            t0 = time.perf_counter()
            F.whisper_full(ctx, fp, audio)
            best = min(best, time.perf_counter() - t0)
        detail[key] = round(30.0 / best, 1)

    def e2e_greedy():
        fp = FullParams(print_progress=False)
        fp.greedy.best_of = 1
        fp.temperature_inc = 0
        e2e_best_of_3(fp, "e2e_whisper_full_rtf")
    _try("e2e_greedy", e2e_greedy)

    def e2e_int4():
        # same pipeline in the W4 serving mode (megakernel="int4")
        fp4 = FullParams(print_progress=False, megakernel="int4")
        fp4.greedy.best_of = 1
        fp4.temperature_inc = 0
        e2e_best_of_3(fp4, "e2e_whisper_full_int4_rtf")
    _try("e2e_int4", e2e_int4)

    def e2e_int4_enc8():
        # full quantized serving: W8A8 encoder + int4 megakernel decoder
        ctx8 = get_ctx8()
        fp = FullParams(print_progress=False, megakernel="int4")
        fp.greedy.best_of = 1
        fp.temperature_inc = 0
        F.whisper_full(ctx8, fp, audio)      # warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            F.whisper_full(ctx8, fp, audio)
            best = min(best, time.perf_counter() - t0)
        detail["e2e_whisper_full_int4_enc8_rtf"] = round(30.0 / best, 1)
    _try("e2e_int4_enc8", e2e_int4_enc8)

    _ctx8_cache = {}

    def get_ctx8():
        # share ctx's device-resident tree: a second from_preset would
        # host-init + upload another ~600 MB through the tunnel. Only the
        # encoder plane pytree differs (M.encode dispatches on it), and
        # prepare_encoder_int8 runs device-side on the shared weights.
        if "c" not in _ctx8_cache:
            import copy
            from open_whisper_kit_tpu.ops.encoder_int8 import (
                prepare_encoder_int8)
            c8 = copy.copy(ctx)
            c8.params = dict(ctx.params)
            c8.params["encoder"] = prepare_encoder_int8(
                cfg, ctx.params["encoder"])
            c8._mask_cache = {}
            c8._mega = None
            _ctx8_cache["c"] = c8
        return _ctx8_cache["c"]

    def e2e_120s():
        # steady-state serving e2e: a 120 s clip amortizes the per-call
        # relay RTT (recorded above as relay_rtt_ms; one RTT is ~11% of
        # the 30 s clip's wall at 170x RTF but ~3% here) — this is the
        # number a long-file user sees, with identical per-window work
        audio_l = np.random.default_rng(7).standard_normal(
            16000 * 120).astype(np.float32) * 0.1
        fp = FullParams(print_progress=False)
        fp.greedy.best_of = 1
        fp.temperature_inc = 0
        F.whisper_full(ctx, fp, audio_l)     # warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            F.whisper_full(ctx, fp, audio_l)
            best = min(best, time.perf_counter() - t0)
        detail["e2e_120s_rtf"] = round(120.0 / best, 1)

        fp4 = FullParams(print_progress=False, megakernel="int4")
        fp4.greedy.best_of = 1
        fp4.temperature_inc = 0
        ctx8 = get_ctx8()
        F.whisper_full(ctx8, fp4, audio_l)   # warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            F.whisper_full(ctx8, fp4, audio_l)
            best = min(best, time.perf_counter() - t0)
        detail["e2e_120s_int4_enc8_rtf"] = round(120.0 / best, 1)
    _try("e2e_120s", e2e_120s)

    def e2e_beam5():
        # beam-5 quality mode end-to-end, through the beam megakernel
        # (origin-table lineage, int4 planes — the Bch5 serving path).
        fpb = FullParams(print_progress=False, megakernel="int4",
                         strategy=SamplingStrategy.BEAM_SEARCH)
        fpb.beam_search.beam_size = 5
        fpb.temperature_inc = 0
        e2e_best_of_3(fpb, "e2e_whisper_full_beam5_int4_rtf")
    _try("e2e_beam5", e2e_beam5)

    # ---- decoder with runtime int8 logits (decoder_int8 path) ----
    def dec_int8():
        dec8_loop = make_dec_loop(1, K, R_DEC)
        float(dec8_loop(dec_int8_full, xk, xv))
        t0 = time.perf_counter()
        float(dec8_loop(dec_int8_full, xk, xv))
        detail["dec_int8_ms_per_token"] = round(
            (time.perf_counter() - t0) / (K * R_DEC) * 1e3, 3)
    _try("dec_int8", dec_int8)

    # ---- single-kernel decoder (ops/decode_megakernel): all layers + logits
    # in one pallas_call, weights as int8/int4 planes dequantized inline
    # (the FullParams.megakernel W8/W4 serving paths) ----
    from open_whisper_kit_tpu.ops import decode_megakernel as MK
    L = cfg.n_text_layer
    S = cfg.n_text_state
    Tc = cfg.n_text_ctx
    xk_nat = jnp.transpose(xk[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)
    xv_nat = jnp.transpose(xv[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)

    @jax.jit
    def mega_loop(mp, te, pe, xkn, xvn):
        def one(seed):
            nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
            nv = jnp.zeros((L, Tc, S), jnp.bfloat16)

            def body(carry, i):
                tok, nk, nv = carry
                x0 = (te[tok] + pe[i])[None].astype(jnp.bfloat16)
                logits, nk, nv = MK.mega_decode_step(cfg, mp, x0, nk, nv, i,
                                                     xkn, xvn)
                return (jnp.argmax(logits[0]).astype(jnp.int32), nk, nv), ()

            (tok, _, _), _ = jax.lax.scan(
                body, (seed, nk, nv), jnp.arange(K))
            return tok

        acc, _ = jax.lax.scan(lambda a, s: (a + one(s), ()),
                              jnp.int32(0),
                              jnp.arange(R_DEC, dtype=jnp.int32))
        return acc

    def mega_int8():
        mp = MK.prepare_mega(cfg, dec_prepared, quant="all")
        args = (mp, dec_prepared["te"], dec_prepared["pe"], xk_nat, xv_nat)
        float(mega_loop(*args))
        t0 = time.perf_counter()
        float(mega_loop(*args))
        detail["dec_mega_int8_ms_per_token"] = round(
            (time.perf_counter() - t0) / (K * R_DEC) * 1e3, 3)
    _try("mega_int8", mega_int8)

    mp4 = None

    def mega_int4():
        # int4 mode (FullParams.megakernel="int4" W4 serving path)
        nonlocal mp4
        mp4 = MK.prepare_mega(cfg, dec_prepared, quant="int4")
        args4 = (mp4, dec_prepared["te"], dec_prepared["pe"], xk_nat, xv_nat)
        float(mega_loop(*args4))
        t0 = time.perf_counter()
        float(mega_loop(*args4))
        detail["dec_mega_int4_ms_per_token"] = round(
            (time.perf_counter() - t0) / (K * R_DEC) * 1e3, 3)
    _try("mega_int4", mega_int4)

    # ---- beam-5 megakernel: all beams in one kernel launch through one
    # weight stream; per-step beam reorder is an origin-table update
    # (lineage masking — NO physical KV gather per step; see
    # ops/decode_megakernel.beam_attn_bias). tools/bench_beam_ab.py is
    # the A/B harness — the XLA batched step pays a physical reorder and
    # measures ~2.0 ms/token on the same workload. ----
    def mega_beam5():
        if mp4 is None:
            raise RuntimeError("int4 mega params unavailable")
        BB = 5
        src = jnp.asarray((np.arange(BB) + 1) % BB, jnp.int32)

        R_B = 2

        @jax.jit
        def mega_beam_loop(mp, te, pe, xkn, xvn):
            def one(seed):
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
                    body, (jnp.full((BB,), seed, jnp.int32), nk, nv, origin),
                    jnp.arange(K))
                return jnp.sum(toks)

            acc, _ = jax.lax.scan(lambda a, s: (a + one(s), ()),
                                  jnp.int32(0),
                                  jnp.arange(R_B, dtype=jnp.int32))
            return acc

        argsb = (mp4, dec_prepared["te"], dec_prepared["pe"], xk_nat, xv_nat)
        float(mega_beam_loop(*argsb))
        t0 = time.perf_counter()
        float(mega_beam_loop(*argsb))
        detail["dec_mega_beam5_ms_per_token"] = round(
            (time.perf_counter() - t0) / (K * R_B) * 1e3, 3)
    _try("mega_beam5", mega_beam5)

    # ---- diarization: offline RTF through the device-resident AOSC loop
    # (full-size 117M SortFormer, random weights — same compute as real).
    # Baseline: ~110x RT CoreML/ANE (streaming-sortformer/README.md:21).
    # 10 MINUTES of audio (VERDICT r4 #7: the 2-minute clip's ~457 ms
    # wall measurement swung 2.4x between runs); both runs reported so
    # the artifact itself shows the spread. ----
    def sortformer_rtf():
        from open_whisper_kit_tpu.models.sortformer import model as SM
        from open_whisper_kit_tpu.models.sortformer.streaming import (
            SortformerDiarizer)
        scfg = SM.SortformerConfig()
        dz = SortformerDiarizer(scfg, SM.init_params(scfg, seed=0))
        SECS = 600
        sf_audio = np.random.default_rng(1).standard_normal(
            16000 * SECS).astype(np.float32) * 0.1
        dz.diarize(sf_audio, device_state=True)       # warm
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            dz.diarize(sf_audio, device_state=True)
            runs.append(time.perf_counter() - t0)
        detail["sortformer_rtf_offline"] = round(SECS / min(runs), 1)
        detail["sortformer_rtf_run2"] = round(SECS / max(runs), 1)
        # per-chunk cost: the AOSC machine consumes 188 x 80 ms frames per
        # iteration (StreamConfig.chunk_len) — audio-length-invariant work
        n_chunks = -(-int(SECS / 0.08) // 188)
        detail["sortformer_ms_per_chunk"] = round(
            min(runs) / n_chunks * 1e3, 2)
        detail["sortformer_baseline_rtf"] = BASELINE_SORTFORMER_RTF
    _try("sortformer", sortformer_rtf)

    # ---- streaming latency (VERDICT r4 #8): replay a synthetic WAV
    # through the streaming transcriber at the 2 s preset; p50/p95 ms
    # from chunk arrival to emitted partial (the stream.cpp step_ms
    # contract made measurable, examples/stream/stream.cpp:18-44) ----
    def stream_latency():
        from open_whisper_kit_tpu.decode.stream import (
            StreamingTranscriber, StreamParams)
        ctx_s = F.WhisperContext.from_preset(
            "base.en" if "base.en" in M.PRESETS else "base",
            dtype=jnp.bfloat16)
        sp = StreamParams(step_ms=2000, length_ms=8000, keep_ms=200,
                          no_context=True, no_fallback=True)
        st = StreamingTranscriber(ctx_s, sp)
        s_audio = np.random.default_rng(5).standard_normal(
            16000 * 30).astype(np.float32) * 0.1
        # warm the compile path with the first few feeds, then measure
        lat = []
        chunk = 16000 // 4                        # 250 ms feeds
        for i in range(0, len(s_audio), chunk):
            t0 = time.perf_counter()
            ev = st.feed(s_audio[i:i + chunk])
            dt = (time.perf_counter() - t0) * 1e3
            if ev:                                # a step ran and emitted
                lat.append(dt)
        lat = lat[1:]                             # drop the compile feed
        if lat:
            lat.sort()
            detail["stream_p50_latency_ms"] = round(
                lat[len(lat) // 2], 1)
            detail["stream_p95_latency_ms"] = round(
                lat[min(len(lat) - 1, int(len(lat) * 0.95))], 1)
            detail["stream_steps_measured"] = len(lat)
    _try("stream_latency", stream_latency)

    # ---- speculative decoding MEASURED end-to-end (VERDICT r4 #5):
    # peaked synthetic target (the beam-A/B fixture recipe: 6x token
    # embedding -> peaked softmax) + a weight-perturbed draft of the
    # same shape; real accept-rate, real ms, output == plain greedy by
    # the speculative contract (pinned in tests/test_speculative.py).
    # Real-weight turbo spec numbers join the acceptance runway. ----
    def spec_e2e():
        ctx_t = F.WhisperContext.from_preset("tiny.en", dtype=jnp.bfloat16)
        ctx_t.params["decoder"]["te"] = ctx_t.params["decoder"]["te"] * 6.0
        ctx_d = F.WhisperContext.from_preset("tiny.en", dtype=jnp.bfloat16)
        ctx_d.params["decoder"]["te"] = ctx_d.params["decoder"]["te"] * 6.0
        key = jax.random.PRNGKey(0)

        def perturb(w):
            nonlocal key
            if not hasattr(w, "dtype") or w.dtype not in (jnp.bfloat16,
                                                          jnp.float32):
                return w
            key, k2 = jax.random.split(key)
            return w + (0.02 * jnp.abs(w)
                        * jax.random.normal(k2, w.shape, w.dtype))
        ctx_d.params = jax.tree.map(perturb, ctx_d.params)
        ctx_t.set_draft(ctx_d)

        s_audio = np.random.default_rng(6).standard_normal(
            16000 * 30).astype(np.float32) * 0.1
        fp = FullParams(print_progress=False, speculative=4)
        fp.greedy.best_of = 1
        fp.temperature_inc = 0
        res = F.whisper_full(ctx_t, fp, s_audio)     # warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            res = F.whisper_full(ctx_t, fp, s_audio)
            best = min(best, time.perf_counter() - t0)
        t = res.timings
        detail["spec_e2e_rtf_tinyen_peaked"] = round(30.0 / best, 1)
        if t.n_sample > 0:
            detail["spec_accept_rate"] = round(
                t.n_spec_accepted / max(1, t.n_sample), 3)
        # the plain-greedy A/B on the same target
        fp0 = FullParams(print_progress=False)
        fp0.greedy.best_of = 1
        fp0.temperature_inc = 0
        F.whisper_full(ctx_t, fp0, s_audio)
        t0 = time.perf_counter()
        F.whisper_full(ctx_t, fp0, s_audio)
        detail["plain_e2e_rtf_tinyen_peaked"] = round(
            30.0 / (time.perf_counter() - t0), 1)
    _try("spec_e2e", spec_e2e)

    # ---- multi-size bench matrix (VERDICT r4 #3): the reference's
    # bench-all table rows (scripts/bench-all-gg.txt:114-167) — per size:
    # Enc ms, Dec bf16/int8/int4 ms per token, Bch5, PP ----
    def matrix():
        from open_whisper_kit_tpu.ops import decode_megakernel as MKx
        Kx = 64
        # reference M2 Ultra Metal FA=1 rows (Enc/Dec/Bch5/PP ms,
        # scripts/bench-all-gg.txt:144-167) for side-by-side judging
        detail["mx_baseline_m2ultra_fa1"] = {
            "tiny": [6.19, 0.93, 0.21, 0.01],
            "base": [10.89, 1.31, 0.32, 0.02],
            "small": [32.06, 2.41, 0.64, 0.04],
            "medium": [89.22, 5.14, 1.46, 0.09],
            "large_v2": [170.73, 7.50, 2.12, 0.16],
        }
        for preset in ("tiny", "base", "small", "medium", "large-v2"):
            if time.monotonic() >= impl_deadline:
                errors[f"matrix_{preset}"] = "skipped (budget)"
                continue
            try:
                mcfg = M.PRESETS[preset]
                mparams = M.init_params(mcfg, seed=0, dtype=jnp.bfloat16,
                                        device=not FORCE_CPU)
                mdec = M.prepare_decoder(mparams["decoder"])
                mmel = jnp.asarray(rng.standard_normal(
                    (1, 2 * mcfg.n_audio_ctx, mcfg.n_mels)).astype(np.float32))

                @jax.jit
                def m_enc_loop(enc_params, mel0, mcfg=mcfg):
                    def body(x, _):
                        out = M.encode(mcfg, enc_params, x)
                        return mel0 + jnp.mean(out).astype(
                            mel0.dtype) * 1e-6, ()
                    x, _ = jax.lax.scan(body, mel0, None, length=4)
                    return jnp.sum(x)

                float(m_enc_loop(mparams["encoder"], mmel))
                t0 = time.perf_counter()
                float(m_enc_loop(mparams["encoder"], mmel))
                key = preset.replace("-", "_").replace(".", "_")
                detail[f"mx_{key}_enc_ms"] = round(
                    (time.perf_counter() - t0) / 4 * 1e3, 2)

                menc = M.encode(mcfg, mparams["encoder"], mmel)
                mxk, mxv = M.cross_kv(mcfg, mdec, menc)

                def dec_loop_n(batch, mcfg=mcfg):
                    # cross-KV passed as ARGUMENTS: closing over a device
                    # array bakes it into the HLO as a constant, and the
                    # remote compile helper rejects the oversized request
                    # body (HTTP 413) from small upward
                    @jax.jit
                    def loop(d, xkb, xvb):
                        kv_k, kv_v = M.init_kv_cache(mcfg, batch,
                                                     dtype=jnp.bfloat16)
                        tok0 = jnp.zeros((batch, 1), jnp.int32)

                        def body(carry, _):
                            tok, kv_k, kv_v, head = carry
                            logits, kv_k, kv_v, _ = M.decode_impl(
                                mcfg, d, tok, kv_k, kv_v, head, xkb, xvb)
                            tok = jnp.argmax(
                                logits[:, -1], -1).astype(jnp.int32)[:, None]
                            return (tok, kv_k, kv_v, head + 1), ()

                        (tok, _, _, _), _ = jax.lax.scan(
                            body, (tok0, kv_k, kv_v, jnp.int32(0)), None,
                            length=Kx)
                        return jnp.sum(tok)
                    return loop

                lp = dec_loop_n(1)
                float(lp(mdec, mxk, mxv))
                t0 = time.perf_counter()
                float(lp(mdec, mxk, mxv))
                detail[f"mx_{key}_dec_ms"] = round(
                    (time.perf_counter() - t0) / Kx * 1e3, 3)

                lp5 = dec_loop_n(5)
                mxk5 = jnp.repeat(mxk, 5, axis=1)
                mxv5 = jnp.repeat(mxv, 5, axis=1)
                float(lp5(mdec, mxk5, mxv5))
                t0 = time.perf_counter()
                float(lp5(mdec, mxk5, mxv5))
                detail[f"mx_{key}_bch5_ms"] = round(
                    (time.perf_counter() - t0) / Kx * 1e3, 3)

                @jax.jit
                def m_pp(d, mxk, mxv, mcfg=mcfg):
                    kv_k, kv_v = M.init_kv_cache(mcfg, 1, dtype=jnp.bfloat16)
                    toks = jnp.zeros((1, 256), jnp.int32)
                    logits, _, _, _ = M.decode_impl(
                        mcfg, d, toks, kv_k, kv_v, jnp.int32(0), mxk, mxv)
                    return jnp.sum(logits[:, -1])

                float(m_pp(mdec, mxk, mxv))
                t0 = time.perf_counter()
                float(m_pp(mdec, mxk, mxv))
                detail[f"mx_{key}_pp_ms"] = round(
                    (time.perf_counter() - t0) / 256 * 1e3, 4)

                # int8 + int4 single-kernel decode (grouped for L > 8)
                to_nat = MKx.hm_to_natural
                mxkn, mxvn = to_nat(mxk), to_nat(mxv)
                Lm, Sm, Tcm = (mcfg.n_text_layer, mcfg.n_text_state,
                               mcfg.n_text_ctx)
                for qmode, tag in (("all", "int8"), ("int4", "int4")):
                    if time.monotonic() >= impl_deadline:
                        break
                    if qmode == "int4" and Sm % 256:
                        continue        # tiny: lane-slice constraint
                    mpq = MKx.prepare_mega(mcfg, mdec, quant=qmode)

                    @jax.jit
                    def mq_loop(mp, te, pe, xkn, xvn, mcfg=mcfg, Lm=Lm,
                                Sm=Sm, Tcm=Tcm):
                        nk = jnp.zeros((Lm, Tcm, Sm), jnp.bfloat16)
                        nv = jnp.zeros((Lm, Tcm, Sm), jnp.bfloat16)

                        def body(carry, i):
                            tok, nk, nv = carry
                            x0 = (te[tok] + pe[i])[None].astype(jnp.bfloat16)
                            logits, nk, nv = MKx.mega_decode_step(
                                mcfg, mp, x0, nk, nv, i, xkn, xvn)
                            return (jnp.argmax(logits[0]).astype(jnp.int32),
                                    nk, nv), ()

                        (tok, _, _), _ = jax.lax.scan(
                            body, (jnp.int32(0), nk, nv), jnp.arange(Kx))
                        return tok

                    args = (mpq, mdec["te"], mdec["pe"], mxkn, mxvn)
                    float(mq_loop(*args))
                    t0 = time.perf_counter()
                    float(mq_loop(*args))
                    detail[f"mx_{key}_dec_{tag}_ms"] = round(
                        (time.perf_counter() - t0) / Kx * 1e3, 3)
            except Exception as e:  # noqa: BLE001 — a size never sinks the rest
                errors[f"matrix_{preset}"] = repr(e)[:200]
            emit()                  # checkpoint after every size
    _try("matrix", matrix)

    # ---- deep-decoder grouped megakernel (medium, L=24 -> 3 chained
    # <=8-layer kernels) vs its XLA step — the models the reference is
    # slowest on (large-v2 Dec. 7.50 ms/token FA=1, bench-all-gg.txt:161).
    # Runs LAST among compute sections: ~2 extra cold compiles. ----
    def grouped_medium():
        mcfg = M.PRESETS["medium"]
        mparams = M.init_params(mcfg, seed=0, dtype=jnp.bfloat16,
                                device=not FORCE_CPU)
        mdec = M.prepare_decoder(mparams["decoder"])
        from open_whisper_kit_tpu.ops import decode_megakernel as MKm
        Lm, Sm, Tcm = (mcfg.n_text_layer, mcfg.n_text_state,
                       mcfg.n_text_ctx)
        menc = jnp.asarray(rng.standard_normal(
            (1, mcfg.n_audio_ctx, mcfg.n_audio_state)), jnp.bfloat16)
        mxk, mxv = M.cross_kv(mcfg, mdec, menc)
        to_nat = lambda a: jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(
            Lm, -1, Sm)
        mxkn, mxvn = to_nat(mxk), to_nat(mxv)
        mp8 = MKm.prepare_mega(mcfg, mdec, quant="all")
        Km = 128

        @jax.jit
        def xla_loop(d, xk, xv):
            kv_k, kv_v = M.init_kv_cache(mcfg, 1, dtype=jnp.bfloat16)

            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    mcfg, d, tok, kv_k, kv_v, head, xk, xv)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()

            (tok, _, _, _), _ = jax.lax.scan(
                body, (jnp.zeros((1, 1), jnp.int32), kv_k, kv_v,
                       jnp.int32(0)), None, length=Km)
            return jnp.sum(tok)

        @jax.jit
        def grouped_loop(mp, te, pe, xkn, xvn):
            nk = jnp.zeros((Lm, Tcm, Sm), jnp.bfloat16)
            nv = jnp.zeros((Lm, Tcm, Sm), jnp.bfloat16)

            def body(carry, i):
                tok, nk, nv = carry
                x0 = (te[tok] + pe[i])[None].astype(jnp.bfloat16)
                logits, nk, nv = MKm.mega_decode_step(mcfg, mp, x0, nk, nv,
                                                      i, xkn, xvn)
                return (jnp.argmax(logits[0]).astype(jnp.int32), nk, nv), ()

            (tok, _, _), _ = jax.lax.scan(
                body, (jnp.int32(0), nk, nv), jnp.arange(Km))
            return tok

        float(xla_loop(mdec, mxk, mxv))
        t0 = time.perf_counter()
        float(xla_loop(mdec, mxk, mxv))
        detail["dec_medium_xla_ms_per_token"] = round(
            (time.perf_counter() - t0) / Km * 1e3, 3)
        args = (mp8, mdec["te"], mdec["pe"], mxkn, mxvn)
        float(grouped_loop(*args))
        t0 = time.perf_counter()
        float(grouped_loop(*args))
        detail["dec_medium_grouped_int8_ms_per_token"] = round(
            (time.perf_counter() - t0) / Km * 1e3, 3)
        # reference medium Dec. column: 5.14 ms/token M2 Ultra FA=1
        # (scripts/bench-all-gg.txt:156; large-v2 is 7.50)
        detail["baseline_medium_dec_ms"] = 5.14
    _try("grouped_medium", grouped_medium)


    # priority order (VERDICT r3 #1c): headline already emitted, then
    # megakernel serving numbers -> beam -> end-to-end -> sortformer ->
    # extras. Budget exhaustion skips from wherever we are.
    for name in ("mega_int8", "mega_int4", "mega_beam5",
                 "enc_int8",
                 "e2e_greedy", "e2e_int4", "e2e_int4_enc8", "e2e_beam5",
                 "e2e_120s",
                 "batched16", "batched16_int8",
                 "sortformer", "stream_latency", "spec_e2e",
                 "bch5", "pp", "dec_int8",
                 "matrix", "grouped_medium"):
        _run(name)
    emit()                      # final, richest artifact line


if __name__ == "__main__":
    main()
