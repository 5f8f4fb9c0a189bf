"""Speculative-decode component A/B on the TPU (random weights).

Acceptance rate needs REAL weights, so this harness measures the
MECHANICAL components of a speculative round and models the per-token
cost as a function of acceptance:

  t_target : target (large-v3-turbo) per-token step, int4 megakernel —
             the plain-greedy baseline the speculative path must beat.
  t_draft  : draft (tiny) per-token step, XLA vs int8 megakernel — the
             dominant dispatch count of a round is the gamma+1 draft
             steps (decode/device_speculative.py).
  t_verify : ONE (gamma+1)-token target verify pass (XLA decode_impl),
             which replaces gamma+1 sequential target steps.

Modeled round cost = (gamma+1)*t_draft + t_verify; expected emissions
per round at per-token acceptance a = sum_{j=0..gamma-1} a^j + a^gamma
(j matched drafts then a correction, or all gamma matched plus the free
bonus token).  Run alone on the TPU (one job at a time).
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

K = 128          # steps per timed loop
GAMMA = 4
TARGET = "large-v3-turbo"
DRAFT = "tiny"


def _setup(preset):
    cfg = M.PRESETS[preset]
    params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((1, cfg.n_audio_ctx,
                                           cfg.n_audio_state)), jnp.bfloat16)
    xk, xv = M.cross_kv(cfg, dec, enc)
    return cfg, dec, xk, xv


def _time(fn_steps):
    fn, steps = fn_steps
    fn()                          # compile + warm
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3     # ms per step


def mega_loop(cfg, dec, xk, xv, quant):
    L, S = cfg.n_text_layer, cfg.n_text_state
    xkn, xvn = MK.hm_to_natural(xk), MK.hm_to_natural(xv)
    mp = MK.prepare_mega(cfg, dec, quant=quant)
    te, pe = dec["te"], dec["pe"]

    @jax.jit
    def loop(mp, te, pe, xkn, xvn):
        nk = jnp.zeros((L, cfg.n_text_ctx, S), jnp.bfloat16)
        nv = jnp.zeros((L, cfg.n_text_ctx, S), jnp.bfloat16)

        def body(carry, i):
            tok, nk, nv = carry
            x0 = (te[tok][None] + pe[i][None]).astype(jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step(cfg, mp, x0, nk, nv, i,
                                                 xkn, xvn)
            return (jnp.argmax(logits[0]).astype(jnp.int32), nk, nv), ()

        (tok, _, _), _ = jax.lax.scan(body, (jnp.int32(0), nk, nv),
                                      jnp.arange(K))
        return tok

    return (lambda: loop(mp, te, pe, xkn, xvn).block_until_ready()), K


def mega_verify_loop(cfg, dec, xk, xv, quant, T):
    """Sequential T-row megakernel verify passes (the speculative
    target's shape with tmega), as many as fit the KV cache."""
    L, S = cfg.n_text_layer, cfg.n_text_state
    xkn, xvn = MK.hm_to_natural(xk), MK.hm_to_natural(xv)
    mp = MK.prepare_mega(cfg, dec, quant=quant)
    te, pe = dec["te"], dec["pe"]
    steps = min(K, cfg.n_text_ctx // T - 1)

    @jax.jit
    def loop(mp, te, pe, xkn, xvn):
        nk = jnp.zeros((L, cfg.n_text_ctx, S), jnp.bfloat16)
        nv = jnp.zeros((L, cfg.n_text_ctx, S), jnp.bfloat16)

        def body(carry, i):
            tok, nk, nv = carry
            pos = i * T + jnp.arange(T)
            x0 = (te[jnp.broadcast_to(tok, (T,))] + pe[pos]).astype(
                jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step(cfg, mp, x0, nk, nv,
                                                 i * T, xkn, xvn)
            return (jnp.argmax(logits[-1]).astype(jnp.int32), nk, nv), ()

        (tok, _, _), _ = jax.lax.scan(body, (jnp.int32(0), nk, nv),
                                      jnp.arange(steps))
        return tok

    return (lambda: loop(mp, te, pe, xkn, xvn).block_until_ready()), steps


def xla_loop(cfg, dec, xk, xv, T=1):
    """Sequential T-token decode_impl passes (T=1: draft step shape;
    T=gamma+1: the verify-pass shape), as many as fit the KV cache."""
    steps = min(K, cfg.n_text_ctx // T - 1)

    @jax.jit
    def loop(dec, xk, xv):
        kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)

        def body(carry, i):
            tok, kv_k, kv_v = carry
            toks = jnp.broadcast_to(tok, (1, T))
            lg, kv_k, kv_v, _ = M.decode_impl(cfg, dec, toks, kv_k, kv_v,
                                              i * T, xk, xv)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), kv_k, kv_v), ()

        (tok, _, _), _ = jax.lax.scan(
            body, (jnp.int32(0), kv_k, kv_v), jnp.arange(steps))
        return tok

    return (lambda: loop(dec, xk, xv).block_until_ready()), steps


def main():
    print(f"devices: {jax.devices()}")
    tcfg, tdec, txk, txv = _setup(TARGET)
    dcfg, ddec, dxk, dxv = _setup(DRAFT)

    t_target = _time(mega_loop(tcfg, tdec, txk, txv, "int4"))
    t_verify_xla = _time(xla_loop(tcfg, tdec, txk, txv, T=GAMMA + 1))
    t_verify_mega = _time(mega_verify_loop(tcfg, tdec, txk, txv, "int4",
                                           T=GAMMA + 1))
    t_draft_xla = _time(xla_loop(dcfg, ddec, dxk, dxv, T=1))
    t_draft_mega = _time(mega_loop(dcfg, ddec, dxk, dxv, "all"))

    print(f"t_target  (turbo int4 mega step)      : {t_target:8.3f} ms/token")
    print(f"t_verify  (turbo {GAMMA + 1}-token XLA)        : {t_verify_xla:8.3f} ms/pass")
    print(f"t_verify  (turbo {GAMMA + 1}-row int4 mega)    : {t_verify_mega:8.3f} ms/pass")
    print(f"t_draft   (tiny XLA step)             : {t_draft_xla:8.3f} ms/token")
    print(f"t_draft   (tiny int8 mega step)       : {t_draft_mega:8.3f} ms/token")

    print("\nmodeled speculative ms/token (round = (g+1)*draft + verify):")
    print("accept   XLA/XLA  mega/XLA  mega/mega   vs plain int4 mega")
    for a in (0.5, 0.7, 0.8, 0.9, 1.0):
        emitted = sum(a ** j for j in range(GAMMA)) + a ** GAMMA
        combos = ((t_draft_xla, t_verify_xla), (t_draft_mega, t_verify_xla),
                  (t_draft_mega, t_verify_mega))
        costs = [((GAMMA + 1) * td + tv) / emitted for td, tv in combos]
        print(f"{a:5.2f}  {costs[0]:9.3f} {costs[1]:9.3f} {costs[2]:10.3f}"
              f"   x{t_target / costs[2]:4.2f}")


if __name__ == "__main__":
    main()
