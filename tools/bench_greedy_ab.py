"""Interleaved in-process A/B: greedy int4 megakernel with the
transposed-PV attention epilogue (attend_pv_t=True, V^T p^T at dh-row
MXU utilization) vs the row-major PV form (False).

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

K = 128
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
    xk, xv = M.cross_kv(cfg, dec, enc_out)
    to_nat = lambda a: jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(L, -1, S)
    xk_nat, xv_nat = to_nat(xk), to_nat(xv)
    te, pe = dec["te"], dec["pe"]
    mp4 = MK.prepare_mega(cfg, dec, quant="int4")

    @functools.partial(jax.jit, static_argnames=("pvt",))
    def loop(mp, te, pe, xkn, xvn, pvt=True):
        nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
        nv = jnp.zeros((L, Tc, S), jnp.bfloat16)

        def body(carry, i):
            tok, nk, nv = carry
            x0 = (te[tok][None] + pe[i][None]).astype(jnp.bfloat16)
            logits, nk, nv = MK.mega_decode_step(
                cfg, mp, x0, nk, nv, i, xkn, xvn, attend_pv_t=pvt)
            return (jnp.argmax(logits[0]).astype(jnp.int32), nk, nv), ()

        (tok, _, _), _ = jax.lax.scan(
            body, (jnp.int32(0), nk, nv), jnp.arange(K))
        return tok

    # parity
    print("parity check...", flush=True)
    ra = int(loop(mp4, te, pe, xk_nat, xv_nat, pvt=True))
    rb = int(loop(mp4, te, pe, xk_nat, xv_nat, pvt=False))
    print(f"  final tokens: pvt={ra} rowmajor={rb}", flush=True)

    loops = {
        "mega_int4_pvt": lambda: loop(mp4, te, pe, xk_nat, xv_nat, pvt=True),
        "mega_int4_rowmajor": lambda: loop(mp4, te, pe, xk_nat, xv_nat,
                                           pvt=False),
    }
    results = {name: [] for name in loops}
    for rep in range(5):
        for name, f in loops.items():
            t0 = time.perf_counter()
            int(f())
            dt = (time.perf_counter() - t0) / K * 1e3
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f} ms/token", flush=True)

    print("\n=== best-of ms/token (greedy int4) ===", flush=True)
    for name, v in results.items():
        print(f"{name}: {min(v):.3f}", flush=True)


if __name__ == "__main__":
    main()
