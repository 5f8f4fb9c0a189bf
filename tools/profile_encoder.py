"""Locate where encoder wall time goes on hardware: matmuls vs attention
vs elementwise (LN/gelu/residual), each as an amortized chained loop with
ONE result fetch (relay RTT ~5-30 ms poisons anything shorter — measured
26 ms on a bad session; see docs/PERFORMANCE.md round-5 notes).

Shapes mirror models/whisper/model.encode at the given preset: T padded
to the encoder's 128-multiple, the per-block matmul set
QKV (S,3S) / O (S,S) / MLP (S,4S)+(4S,S), attention at n_audio_head.

Usage: python tools/profile_encoder.py [preset] [batch]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.ops import encoder_int8 as E8
from open_whisper_kit_tpu.ops.attention import mha_full
from open_whisper_kit_tpu.ops.layers import layer_norm
from open_whisper_kit_tpu.utils.cache import enable_compile_cache

PRESET = sys.argv[1] if len(sys.argv) > 1 else "large-v3-turbo"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SKIP_FULL = "--components" in sys.argv


def timed(fn, *args, n=1):
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    enable_compile_cache(None)
    cfg = M.PRESETS[PRESET]
    S, H, L = cfg.n_audio_state, cfg.n_audio_head, cfg.n_audio_layer
    T = 2 * cfg.n_audio_ctx // 2          # post-conv length (n_audio_ctx)
    Tp = -(-T // 128) * 128
    Mrows = BATCH * Tp
    rng = np.random.default_rng(0)

    rf = jax.jit(lambda x: x * 2.0)
    float(rf(jnp.float32(1.0)))
    rtts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(rf(jnp.float32(float(i))))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[3]
    print(f"relay rtt ~{rtt * 1e3:.1f} ms", flush=True)

    # ---- 1. full encoder, both variants, N passes one fetch
    # (tools/bench_enc8_ab.py gives the same numbers; skip with
    # --components when that already ran — init_params alone uploads
    # hundreds of MB through the tunnel) ----
    N_FULL = 16

    def full_loop(p):
        @jax.jit
        def loop(p, mel0):
            def body(x, _):
                out = M.encode(cfg, p, x)
                return mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6, ()
            x, _ = jax.lax.scan(body, mel0, None, length=N_FULL)
            return jnp.sum(x)
        return loop

    if not SKIP_FULL:
        print("init_params...", flush=True)
        params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
        mel = jnp.asarray(rng.standard_normal(
            (BATCH, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
        enc8 = E8.prepare_encoder_int8(cfg, params["encoder"])
        t_bf = timed(full_loop(params["encoder"]), params["encoder"], mel,
                     n=N_FULL) - rtt / N_FULL
        t_w8 = timed(full_loop(enc8), enc8, mel, n=N_FULL) - rtt / N_FULL
        print(f"full encode  bf16 {t_bf * 1e3:7.2f} ms   "
              f"w8a8 {t_w8 * 1e3:7.2f} ms", flush=True)

    print("building matmul stack...", flush=True)
    # ---- 2. matmul-only stack: the 4 projections x L layers chained ----
    N_MM = 8
    w_qkv = jnp.asarray(rng.standard_normal((S, 3 * S)) * 0.02, jnp.bfloat16)
    w_o = jnp.asarray(rng.standard_normal((S, S)) * 0.02, jnp.bfloat16)
    w_m0 = jnp.asarray(rng.standard_normal((S, 4 * S)) * 0.02, jnp.bfloat16)
    w_m1 = jnp.asarray(rng.standard_normal((4 * S, S)) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((Mrows, S)) * 0.1, jnp.bfloat16)

    @jax.jit
    def mm_bf(x, w_qkv, w_o, w_m0, w_m1):
        def body(x, _):
            qkv = jnp.dot(x, w_qkv)
            o = jnp.dot(qkv[:, :S], w_o)
            h = jnp.dot(o, w_m0)
            y = jnp.dot(h, w_m1)
            m = jnp.max(jnp.abs(y))
            return (y / (m + 1.0)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, None, length=L * N_MM)
        return jnp.max(x)

    print("compiling mm_bf...", flush=True)
    t = timed(mm_bf, x0, w_qkv, w_o, w_m0, w_m1, n=N_MM) - rtt / N_MM
    fl = 2 * Mrows * S * (3 * S + S + 4 * S + 4 * S) * L
    print(f"matmuls-only bf16 {t * 1e3:7.2f} ms/stack  {fl / t / 1e12:6.1f} T/s",
          flush=True)

    q_qkv, s_qkv = E8.quantize_w_cols(w_qkv)
    q_o, s_o = E8.quantize_w_cols(w_o)
    q_m0, s_m0 = E8.quantize_w_cols(w_m0)
    q_m1, s_m1 = E8.quantize_w_cols(w_m1)

    @jax.jit
    def mm_w8(x, q_qkv, s_qkv, q_o, s_o, q_m0, s_m0, q_m1, s_m1):
        def body(x, _):
            qkv = E8.w8a8_matmul(x, q_qkv, s_qkv, False)
            o = E8.w8a8_matmul(qkv[:, :S], q_o, s_o, False)
            h = E8.w8a8_matmul(o, q_m0, s_m0, False)
            y = E8.w8a8_matmul(h, q_m1, s_m1, False)
            m = jnp.max(jnp.abs(y.astype(jnp.float32)))
            return (y / (m + 1.0)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, None, length=L * N_MM)
        return jnp.max(x)

    print("compiling mm_w8...", flush=True)
    t = timed(mm_w8, x0, q_qkv, s_qkv, q_o, s_o, q_m0, s_m0, q_m1, s_m1,
              n=N_MM) - rtt / N_MM
    print(f"matmuls-only w8a8 {t * 1e3:7.2f} ms/stack  {fl / t / 1e12:6.1f} T/s",
          flush=True)

    # ---- 3. attention-only stack ----
    N_AT = 8
    xa = jnp.asarray(rng.standard_normal((BATCH, Tp, S)) * 0.1, jnp.bfloat16)
    scale = 1.0 / np.sqrt(cfg.d_audio_head)

    @jax.jit
    def at_loop(x):
        def body(x, _):
            a = mha_full(x, x, x, H, scale, kv_valid=T)
            m = jnp.max(jnp.abs(a.astype(jnp.float32)))
            return (a / (m + 1.0)).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, None, length=L * N_AT)
        return jnp.max(x)

    print("compiling attention loop...", flush=True)
    t = timed(at_loop, xa, n=N_AT) - rtt / N_AT
    print(f"attention-only    {t * 1e3:7.2f} ms/stack", flush=True)

    # ---- 4. elementwise residue: LN x2 + gelu + residual adds ----
    N_EW = 8
    g = jnp.ones((S,), jnp.float32)
    b = jnp.zeros((S,), jnp.float32)
    h4 = jnp.asarray(rng.standard_normal((Mrows, 4 * S)) * 0.1, jnp.bfloat16)

    @jax.jit
    def ew_loop(x, h4):
        def body(c, _):
            x, h4 = c
            a = layer_norm(x, g, b, cfg.eps)
            bq = layer_norm(a.astype(jnp.bfloat16), g, b, cfg.eps)
            hh = jax.nn.gelu(h4.astype(jnp.float32), approximate=True)
            x = (x + bq.astype(jnp.bfloat16)
                 + jnp.mean(hh).astype(jnp.bfloat16))
            return (x, h4), ()
        (x, _), _ = jax.lax.scan(body, (x, h4), None, length=L * N_EW)
        return jnp.max(x)

    print("compiling elementwise loop...", flush=True)
    t = timed(ew_loop, x0, h4, n=N_EW) - rtt / N_EW
    print(f"elementwise (2xLN+gelu+res) {t * 1e3:7.2f} ms/stack", flush=True)


if __name__ == "__main__":
    main()
