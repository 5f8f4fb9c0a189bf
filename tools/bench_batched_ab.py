"""Interleaved A/B for the batched16 serving round (VERDICT target >=900
audio-sec/sec): encoder x decoder quantization variants.

Variants (each one full enc+cross+200-token round at B=16):
  base      bf16 encoder, int8-logits decoder, int8 cross-KV
  enc8      W8A8 encoder, int8-logits decoder, int8 cross-KV
  enc8_w8   W8A8 encoder, int8-ALL decoder (scope="all"), int8 cross-KV
Paired rounds, best-of-N per variant (docs/PERFORMANCE.md decision 7).

Usage: python tools/bench_batched_ab.py [batch] [rounds]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_TOK = 200


def main():
    enable_compile_cache(None)
    cfg = M.PRESETS["large-v3-turbo"]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    dec8_logits = M.quantize_decoder_int8(dec, scope="logits")
    dec8_all = M.quantize_decoder_int8(dec, scope="all")
    enc8 = E8.prepare_encoder_int8(cfg, params["encoder"])
    melB = jnp.zeros((B, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)

    def make_round():
        @jax.jit
        def batched_round(p, melB):
            enc = M.encode(cfg, p["encoder"], melB)
            xkB, xvB = M.cross_kv(cfg, p["decoder"], enc)
            xkB, xvB = M.quantize_cross_kv(xkB), M.quantize_cross_kv(xvB)
            kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                         width=128)
            tok = jnp.zeros((B, 1), jnp.int32)

            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, p["decoder"], tok, kv_k, kv_v, head, xkB, xvB)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()

            carry = (tok, kv_k, kv_v, jnp.int32(0))
            carry, _ = jax.lax.scan(body, carry, None, length=128)
            tok, kv_k, kv_v, head = carry
            carry = (tok, M.widen_kv_cache(kv_k, 256),
                     M.widen_kv_cache(kv_v, 256), head)
            carry, _ = jax.lax.scan(body, carry, None, length=N_TOK - 128)
            return jnp.sum(carry[0])
        return batched_round

    fn = make_round()
    variants = {
        "base": {"encoder": params["encoder"], "decoder": dec8_logits},
        "enc8": {"encoder": enc8, "decoder": dec8_logits},
        "enc8_w8": {"encoder": enc8, "decoder": dec8_all},
    }
    best = {k: 1e9 for k in variants}
    for k, p in variants.items():
        float(fn(p, melB))          # compile
    for r in range(ROUNDS):
        for k, p in variants.items():
            t0 = time.perf_counter()
            float(fn(p, melB))
            dt = time.perf_counter() - t0
            best[k] = min(best[k], dt)
            print(f"round {r} {k:8s} {dt*1e3:7.1f} ms "
                  f"{B*30.0/dt:7.1f} audio-s/s", flush=True)
    print("---")
    for k, v in best.items():
        print(f"BEST B={B} {k:8s} {B*30.0/v:7.1f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
