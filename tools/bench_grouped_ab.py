"""Interleaved in-process A/B: GROUPED megakernel chain vs the XLA decode
step for DEEP decoders (n_text_layer > 8: the models the round-2 kernel
gate excluded — exactly where the reference decoder is slowest, e.g.
large-v2 Dec. 7.50 ms/token FA=1, scripts/bench-all-gg.txt:161).

Variants per model (default: medium L=24, large-v2 L=32):

  A   : XLA decode_impl step, dense bf16 (the current production path)
  A8  : XLA decode_impl step, decoder_int8 scope="logits"
  G8  : grouped mega_decode_step chain, int8-all planes
  G4  : grouped mega_decode_step chain, int4 planes

plus a 4-step argmax parity check of G8 against A.
Run alone on the TPU (one job at a time; docs/PERFORMANCE.md discipline).

Usage: python tools/bench_grouped_ab.py [medium|large-v2|small] [K]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from open_whisper_kit_tpu.utils.cache import enable_compile_cache
from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.ops import decode_megakernel as MK

enable_compile_cache()


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "medium"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = M.PRESETS[model]
    print(f"model={model} L={cfg.n_text_layer} S={cfg.n_text_state} "
          f"groups={-(-cfg.n_text_layer // MK.MEGA_GROUP)} K={K}")

    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    L, S, Tc, Ta = (cfg.n_text_layer, cfg.n_text_state, cfg.n_text_ctx,
                    cfg.n_audio_ctx)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, Ta, cfg.n_audio_state)),
                          jnp.bfloat16)
    xk, xv = M.cross_kv(cfg, dec, enc_out)
    to_nat = lambda a: jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)
    xk_nat, xv_nat = to_nat(xk), to_nat(xv)

    dec8 = M.quantize_decoder_int8(dec, scope="logits")
    mp8 = MK.prepare_mega(cfg, dec, quant="all")
    mp4 = MK.prepare_mega(cfg, dec, quant="int4")

    # ---- XLA loop ----
    def make_xla_loop(d):
        @jax.jit
        def loop(d, xk, xv):
            kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, d, tok, kv_k, kv_v, head, xk, xv)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()
            (tok, _, _, _), _ = jax.lax.scan(
                body, (jnp.zeros((1, 1), jnp.int32), kv_k, kv_v,
                       jnp.int32(0)), None, length=K)
            return jnp.sum(tok)
        return functools.partial(loop, d, xk, xv)

    # ---- grouped megakernel loop ----
    def make_mega_loop(mp):
        @jax.jit
        def loop(mp, te, pe, xkn, xvn):
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
        return functools.partial(loop, mp, dec["te"], dec["pe"],
                                 xk_nat, xv_nat)

    variants = {
        "A  (xla bf16)": make_xla_loop(dec),
        "A8 (xla w8-logits)": make_xla_loop(dec8),
        "G8 (grouped int8-all)": make_mega_loop(mp8),
        "G4 (grouped int4)": make_mega_loop(mp4),
    }

    # parity: 4 steps G8 vs A at matched inputs
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
    tok = 0
    agree = 0
    for i in range(4):
        x0 = (dec["te"][jnp.asarray([tok])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        lg, nk, nv = MK.mega_decode_step(cfg, mp8, x0, nk, nv, jnp.int32(i),
                                         xk_nat, xv_nat)
        lr, kv_k, kv_v, _ = M.decode_impl(
            cfg, dec, jnp.asarray([[tok]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        ga, ra = int(jnp.argmax(lg[0])), int(jnp.argmax(lr[0, 0]))
        agree += ga == ra
        tok = ra
    print(f"parity: argmax agreement {agree}/4 (int8 vs bf16 — near-ties "
          f"may flip; >=3 expected)")

    # warm all, then interleaved rounds
    for name, fn in variants.items():
        t0 = time.perf_counter()
        float(fn())
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s")
    times = {n: [] for n in variants}
    for _ in range(5):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn())
            times[name].append((time.perf_counter() - t0) / K * 1e3)
    print(f"\n{model} ms/token (best of 5 interleaved rounds):")
    for name, ts in times.items():
        print(f"  {name:24s} {min(ts):7.3f}  (all: "
              + " ".join(f"{t:.3f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
