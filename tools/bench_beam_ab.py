"""Interleaved in-process A/B: XLA batched beam-5 step vs the beam megakernel.

Measures ms/token for B=5 large-v3-turbo decode with a per-step beam
reorder (rolled permutation — the kv gather every real beam step pays):

  A  : XLA batched decode_impl step (the round-1 bch5 column)
  B8 : mega_decode_step_beam, int8-all planes
  B4 : mega_decode_step_beam, int4 planes

plus a 4-step logits parity check of the kernel against the XLA step.
Run alone on the TPU (one job at a time; docs/PERFORMANCE.md discipline).
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

B = 5
K = 64          # timed steps per measurement
MODEL = "large-v3-turbo"


def main():
    cfg = M.PRESETS[MODEL]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    L, S, Tc, Ta = (cfg.n_text_layer, cfg.n_text_state, cfg.n_text_ctx,
                    cfg.n_audio_ctx)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, Ta, cfg.n_audio_state)),
                          jnp.bfloat16)
    xk, xv = M.cross_kv(cfg, dec, enc_out)          # (L,1,H,Ta,dh)
    xk_b = jnp.repeat(xk, B, axis=1)
    xv_b = jnp.repeat(xv, B, axis=1)
    to_nat = lambda a: jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)
    xk_nat, xv_nat = to_nat(xk), to_nat(xv)
    te, pe = dec["te"], dec["pe"]
    src = jnp.asarray((np.arange(B) + 1) % B, jnp.int32)   # rolled reorder

    @jax.jit
    def xla_loop(dec, xk_b, xv_b):
        kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
        toks = jnp.zeros((B,), jnp.int32)

        def body(carry, i):
            toks, kv_k, kv_v = carry
            kv_k = jnp.take(kv_k, src, axis=1)
            kv_v = jnp.take(kv_v, src, axis=1)
            logits, kv_k, kv_v, _ = M.decode_impl(
                cfg, dec, toks[:, None], kv_k, kv_v, i, xk_b, xv_b)
            return (jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32),
                    kv_k, kv_v), ()

        (toks, _, _), _ = jax.lax.scan(
            body, (toks, kv_k, kv_v), jnp.arange(K))
        return toks

    def make_mega_loop(mp, reord=False, pvt=True, blocked=True):
        """reord=True: physical per-step KV gather on the slot axis +
        identity-origin bias; reord=False: origin-table lineage, caches
        never move. Caches are TIME-MAJOR (L, Tc, B, S). pvt toggles the
        transposed-PV attention epilogue."""
        @functools.partial(jax.jit,
                           static_argnames=("reord", "pvt", "blocked"))
        def loop(mp, te, pe, xkn, xvn, reord=False, pvt=True,
                 blocked=True):
            nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
            nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
            toks = jnp.zeros((B,), jnp.int32)
            origin_id = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
            origin = origin_id

            def body(carry, i):
                toks, nk, nv, origin = carry
                x0 = (te[toks] + pe[i][None, :]).astype(jnp.bfloat16)
                if reord:
                    nk = jnp.take(nk, src, axis=2)
                    nv = jnp.take(nv, src, axis=2)
                    bias = MK.beam_attn_bias(origin_id, i, Tc)
                    logits, nk, nv = MK.mega_decode_step_beam(
                        cfg, mp, x0, nk, nv, i, xkn, xvn, attn_bias=bias,
                        attend_pv_t=pvt, self_blocked=blocked)
                else:
                    origin = jnp.take(origin, src, axis=0).at[:, i].set(
                        jnp.arange(B, dtype=jnp.int32))
                    bias = MK.beam_attn_bias(origin, i, Tc)
                    logits, nk, nv = MK.mega_decode_step_beam(
                        cfg, mp, x0, nk, nv, i, xkn, xvn, attn_bias=bias,
                        attend_pv_t=pvt, self_blocked=blocked)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        nk, nv, origin), ()

            (toks, _, _, _), _ = jax.lax.scan(
                body, (toks, nk, nv, origin), jnp.arange(K))
            return toks

        return lambda mp_: loop(mp_, te, pe, xk_nat, xv_nat, reord=reord,
                                pvt=pvt, blocked=blocked)

    # ---- parity (4 steps, bf16 weights, dense planes vs XLA) ----
    print("parity check...", flush=True)
    kv_k, kv_v = M.init_kv_cache(cfg, B, dtype=jnp.bfloat16)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    mp_dense = MK.prepare_mega(cfg, dec, quant="none")
    toks = np.array([1, 7, 42, 100, 5000], np.int32)
    for i in range(4):
        logits_x, kv_k, kv_v, _ = M.decode_impl(
            cfg, dec, jnp.asarray(toks[:, None]), kv_k, kv_v,
            jnp.int32(i), xk_b, xv_b)
        x0 = (te[jnp.asarray(toks)] + pe[i][None, :]).astype(jnp.bfloat16)
        origin_p = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
        bias_p = MK.beam_attn_bias(origin_p, jnp.int32(i), Tc)
        logits_m, nk, nv = MK.mega_decode_step_beam(
            cfg, mp_dense, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            attn_bias=bias_p)
        rx = np.asarray(logits_x[:, 0], np.float32)
        rm = np.asarray(logits_m, np.float32)
        scale = np.abs(rx).max() + 1e-6
        md = np.abs(rx - rm).max() / scale
        # random-weight logits have near-degenerate argmax; bf16 rounding
        # differences between the two implementations legitimately flip it.
        # Gate on relative diff + top-8 set overlap instead.
        overlap = np.mean([len(set(np.argsort(rx[b])[-8:])
                               & set(np.argsort(rm[b])[-8:])) / 8.0
                           for b in range(B)])
        print(f"  step {i}: rel maxdiff {md:.4f} top8 overlap {overlap:.2f}",
              flush=True)
        assert md < 3e-2 and overlap >= 0.5, "beam kernel diverges"
        toks = np.asarray(rm.argmax(1), np.int32)
    del mp_dense, kv_k, kv_v, nk, nv

    mp8 = MK.prepare_mega(cfg, dec, quant="all")
    mp4 = MK.prepare_mega(cfg, dec, quant="int4")
    loops = {
        "xla_bch5": lambda: xla_loop(dec, xk_b, xv_b),
        "mega_beam5_int4_static": (
            lambda f=make_mega_loop(mp4, pvt=False, blocked=False): f(mp4)),
        "mega_beam5_int4_blocked_rowpv": (
            lambda f=make_mega_loop(mp4, pvt=False): f(mp4)),
        "mega_beam5_int8_static": (
            lambda f=make_mega_loop(mp8, pvt=False, blocked=False): f(mp8)),
    }

    print("warmup/compile...", flush=True)
    for name, f in loops.items():
        t0 = time.perf_counter()
        np.asarray(f())
        print(f"  {name}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)

    results = {name: [] for name in loops}
    for rep in range(4):                 # interleaved rounds
        for name, f in loops.items():
            t0 = time.perf_counter()
            np.asarray(f())
            dt = (time.perf_counter() - t0) / K * 1e3
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/token", flush=True)

    print("\n=== best-of ms/token (B=5) ===", flush=True)
    for name, v in results.items():
        print(f"{name}: {min(v):.3f}", flush=True)


if __name__ == "__main__":
    main()
