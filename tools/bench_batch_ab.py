"""Interleaved in-process A/B: XLA batched greedy decode vs the
batched-stream megakernel (per-row chunked cross, one weight stream).

Measures ms/token for B=8 large-v3-turbo lockstep decode with PER-STREAM
cross-KV (the transcribe_batched serving workload):

  A   : XLA batched decode_impl step (bf16)
  A8  : XLA batched step with int8 cross-KV planes (cross_kv_int8)
  B8  : mega_decode_step_batch, int8-all weight planes
  B4  : mega_decode_step_batch, int4 weight planes

plus a 4-step logits parity check of the kernel against the XLA step.
Run alone on the TPU (one job at a time; docs/PERFORMANCE.md discipline).
"""

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

B = 8
K = 64
MODEL = "large-v3-turbo"


def main():
    cfg = M.PRESETS[MODEL]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    L, S, Tc, Ta = (cfg.n_text_layer, cfg.n_text_state, cfg.n_text_ctx,
                    cfg.n_audio_ctx)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((B, Ta, cfg.n_audio_state)),
                          jnp.bfloat16)
    xk_b, xv_b = M.cross_kv(cfg, dec, enc_out)      # (L,B,H,Ta,dh)
    to_nat_b = lambda a: jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(
        L, B, a.shape[3], S)
    xk_nat, xv_nat = to_nat_b(xk_b), to_nat_b(xv_b)
    xk_q8 = M.quantize_cross_kv(xk_b)
    xv_q8 = M.quantize_cross_kv(xv_b)
    te, pe = dec["te"], dec["pe"]

    @jax.jit
    def xla_loop(dec, xk, xv):
        kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        toks = jnp.zeros((B,), jnp.int32)

        def body(carry, i):
            toks, kv_k, kv_v = carry
            logits, kv_k, kv_v, _ = M.decode_impl(
                cfg, dec, toks[:, None], kv_k, kv_v, i, xk, xv)
            return (jnp.argmax(logits[:, 0], -1).astype(jnp.int32),
                    kv_k, kv_v), ()

        (toks, _, _), _ = jax.lax.scan(
            body, (toks, kv_k, kv_v), jnp.arange(K))
        return toks

    import functools

    @functools.partial(jax.jit, static_argnames=("tac", "pvt"))
    def mega_loop(mp, te, pe, xkn, xvn, tac=512, pvt=True):
        nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
        nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
        toks = jnp.zeros((B,), jnp.int32)

        def body(carry, i):
            toks, nk, nv = carry
            x0 = (te[toks] + pe[i][None, :]).astype(jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step_batch(
                cfg, mp, x0, nk, nv, i, xkn, xvn, tac=tac,
                attend_pv_t=pvt)
            return (jnp.argmax(logits, -1).astype(jnp.int32), nk, nv), ()

        (toks, _, _), _ = jax.lax.scan(
            body, (toks, nk, nv), jnp.arange(K))
        return toks

    # ---- parity (4 steps, dense bf16 planes vs XLA) ----
    print("parity check...", flush=True)
    kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    mp_dense = MK.prepare_mega(cfg, dec, quant="none")
    toks = np.arange(B, dtype=np.int32) * 101 + 1
    for i in range(4):
        logits_x, kv_k, kv_v, _ = M.decode_impl(
            cfg, dec, jnp.asarray(toks[:, None]), kv_k, kv_v,
            jnp.int32(i), xk_b, xv_b)
        x0 = (te[jnp.asarray(toks)] + pe[i][None, :]).astype(jnp.bfloat16)
        logits_m, nk, nv = MK.mega_decode_step_batch(
            cfg, mp_dense, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat)
        rx = np.asarray(logits_x[:, 0], np.float32)
        rm = np.asarray(logits_m, np.float32)
        scale = np.abs(rx).max() + 1e-6
        md = np.abs(rx - rm).max() / scale
        overlap = np.mean([len(set(np.argsort(rx[b])[-8:])
                               & set(np.argsort(rm[b])[-8:])) / 8.0
                           for b in range(B)])
        print(f"  step {i}: rel maxdiff {md:.4f} top8 overlap {overlap:.2f}",
              flush=True)
        assert md < 3e-2 and overlap >= 0.5, "batch kernel diverges"
        toks = np.asarray(rm.argmax(1), np.int32)
    del mp_dense, kv_k, kv_v, nk, nv

    mp8 = MK.prepare_mega(cfg, dec, quant="all")
    mp4 = MK.prepare_mega(cfg, dec, quant="int4")
    loops = {
        "xla_b8_q8cross": lambda: xla_loop(dec, xk_q8, xv_q8),
        # tac=256 pads Ta=1500 to 1536 (+2.4%); 512 pads to 2048 (+33%
        # masked cross DMA + dots) — 256 is the new wrapper default
        "mega_b8_int4_tac256": lambda: mega_loop(mp4, te, pe, xk_nat,
                                                 xv_nat, tac=256),
        "mega_b8_int8_tac256": lambda: mega_loop(mp8, te, pe, xk_nat,
                                                 xv_nat, tac=256),
        "mega_b8_int4_tac512": lambda: mega_loop(mp4, te, pe, xk_nat,
                                                 xv_nat, tac=512),
        "mega_b8_int4_tac512_rowpv": lambda: mega_loop(
            mp4, te, pe, xk_nat, xv_nat, tac=512, pvt=False),
    }

    print("warmup/compile...", flush=True)
    for name, f in loops.items():
        t0 = time.perf_counter()
        np.asarray(f())
        print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)

    results = {name: [] for name in loops}
    for rep in range(4):
        for name, f in loops.items():
            t0 = time.perf_counter()
            np.asarray(f())
            dt = (time.perf_counter() - t0) / K * 1e3
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/token "
                  f"({dt/B*1e3:.0f} us/stream)", flush=True)

    print(f"\n=== best-of ms/token (B={B} streams, per-stream cross) ===",
          flush=True)
    for name, v in results.items():
        print(f"{name}: {min(v):.3f} ({min(v)/B*1e3:.0f} us/stream-token)",
              flush=True)


if __name__ == "__main__":
    main()


