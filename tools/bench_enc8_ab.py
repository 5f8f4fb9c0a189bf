"""Interleaved A/B: bf16 encoder vs W8A8 int8 encoder on hardware.

Paired rounds (the only comparison that survives relay/clock drift,
docs/PERFORMANCE.md decision 7): each round times the bf16 stack then the
int8 stack back-to-back; report best-of-N per variant plus block-size
sweeps for the W8A8 kernel tiles.

Usage: python tools/bench_enc8_ab.py [preset] [batch]
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
from open_whisper_kit_tpu.utils.cache import enable_compile_cache

PRESET = sys.argv[1] if len(sys.argv) > 1 else "large-v3-turbo"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N = 32 if (len(sys.argv) <= 2 or int(sys.argv[2]) == 1) else 8
ROUNDS = 4


def main():
    enable_compile_cache(None)
    cfg = M.PRESETS[PRESET]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    enc8 = E8.prepare_encoder_int8(cfg, params["encoder"])
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (BATCH, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))

    def make_loop(p):
        @jax.jit
        def loop(p, mel0):
            def body(x, _):
                out = M.encode(cfg, p, x)
                return mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6, ()
            x, _ = jax.lax.scan(body, mel0, None, length=N)
            return jnp.sum(x)
        return loop

    variants = {"bf16": (make_loop(params["encoder"]), params["encoder"]),
                "w8a8": (make_loop(enc8), enc8)}
    best = {k: 1e9 for k in variants}
    for k, (fn, p) in variants.items():   # compile
        float(fn(p, mel))
    for r in range(ROUNDS):
        for k, (fn, p) in variants.items():
            t0 = time.perf_counter()
            float(fn(p, mel))
            dt = (time.perf_counter() - t0) / N * 1e3
            best[k] = min(best[k], dt)
            print(f"round {r} {k:6s} {dt:8.2f} ms/pass", flush=True)
    # relay RTT: one scalar fetch is 5-30 ms on tunneled sessions;
    # each timed loop above pays exactly one — report it so per-pass
    # numbers can be read net of the tunnel
    rf = jax.jit(lambda x: x * 2.0)
    float(rf(jnp.float32(1.0)))
    rtts = sorted(
        _time_fetch(rf, jnp.float32(float(i + 2))) for i in range(6))
    rtt = rtts[len(rtts) // 2]
    print("---")
    print(f"relay rtt {rtt * 1e3:.1f} ms (median of 6)")
    for k, v in best.items():
        net = v - rtt * 1e3 / N
        print(f"BEST {PRESET} B={BATCH} {k:6s} {v:8.2f} ms/pass"
              f"  (net of rtt: {net:8.2f})", flush=True)
    print(f"speedup w8a8 vs bf16: {best['bf16'] / best['w8a8']:.3f}x")


def _time_fetch(fn, x):
    t0 = time.perf_counter()
    float(fn(x))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
