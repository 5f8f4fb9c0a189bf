"""bench-all: the scripts/bench-all.sh analog.

Produces the reference's markdown table (Enc. / Dec. / Bch5 / PP per model)
across whisper presets plus SortFormer diarization speed, with random
weights of the real shapes (numbers measure compute, not accuracy).

    python tools/bench_all.py [--models tiny,base,...] [--diarize]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_MODELS = ["tiny", "base", "small", "medium", "large-v2",
                  "large-v3-turbo"]


def bench_whisper(models: list[str]):
    import jax
    import jax.numpy as jnp

    from open_whisper_kit_tpu.models.whisper import model as M

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} | jax {jax.__version__}\n")
    print("| Model | Enc. ms | Dec. ms/tok | Bch5 ms/tok | PP ms/tok |")
    print("| ---   | ---     | ---         | ---         | ---       |")

    for name in models:
        cfg = M.PRESETS[name]
        params = M.init_params(cfg, seed=0, dtype=jnp.bfloat16)
        mel = jnp.zeros((1, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)

        N = 8

        @jax.jit
        def enc_loop(enc, mel0):
            def body(x, _):
                out = M.encode(cfg, enc, x)
                return mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6, ()
            x, _ = jax.lax.scan(body, mel0, None, length=N)
            return jnp.sum(x)

        float(enc_loop(params["encoder"], mel))
        t0 = time.perf_counter()
        float(enc_loop(params["encoder"], mel))
        enc_ms = (time.perf_counter() - t0 - 0.025) / N * 1e3

        enc_out = M.encode(cfg, params["encoder"], mel)
        xk, xv = M.cross_kv(cfg, params["decoder"], enc_out)

        def dec_bench(batch, length=128):
            xkb = jnp.repeat(xk, batch, axis=1) if batch > 1 else xk
            xvb = jnp.repeat(xv, batch, axis=1) if batch > 1 else xv

            @jax.jit
            def loop(dp, xk_, xv_):
                kv_k, kv_v = M.init_kv_cache(cfg, batch, dtype=jnp.bfloat16)
                tok = jnp.zeros((batch, 1), jnp.int32)

                def body(carry, _):
                    tok, kv_k, kv_v, head = carry
                    logits, kv_k, kv_v, _ = M.decode_impl(
                        cfg, dp, tok, kv_k, kv_v, head, xk_, xv_)
                    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                    return (tok, kv_k, kv_v, head + 1), ()

                (tok, _, _, _), _ = jax.lax.scan(
                    body, (tok, kv_k, kv_v, jnp.int32(0)), None, length=length)
                return jnp.sum(tok)

            float(loop(params["decoder"], xkb, xvb))
            t0 = time.perf_counter()
            float(loop(params["decoder"], xkb, xvb))
            return (time.perf_counter() - t0 - 0.025) / length * 1e3

        dec_ms = dec_bench(1)
        bch5_ms = dec_bench(5)

        @jax.jit
        def pp(dp):
            kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
            toks = jnp.zeros((1, 256), jnp.int32)
            logits, _, _, _ = M.decode_impl(cfg, dp, toks, kv_k, kv_v,
                                            jnp.int32(0), xk, xv)
            return jnp.sum(logits[:, -1])

        float(pp(params["decoder"]))
        t0 = time.perf_counter()
        float(pp(params["decoder"]))
        pp_ms = (time.perf_counter() - t0 - 0.025) / 256 * 1e3

        print(f"| {name:>15} | {enc_ms:7.2f} | {dec_ms:11.3f} "
              f"| {bch5_ms:11.3f} | {pp_ms:9.4f} |", flush=True)


def bench_diarize():
    import jax.numpy as jnp

    from open_whisper_kit_tpu.models.sortformer import model as SM
    from open_whisper_kit_tpu.models.sortformer import streaming as SS

    cfg = SM.SortformerConfig()
    params = SM.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    d = SS.SortformerDiarizer(cfg, params)

    audio = np.random.default_rng(0).standard_normal(16000 * 60).astype(np.float32) * 0.1
    d.diarize(audio[:16000 * 40])  # warm the compile buckets
    t0 = time.perf_counter()
    probs = d.diarize(audio)
    dt = time.perf_counter() - t0
    print(f"\nSortFormer diarization (117M, offline preset): "
          f"{60 / dt:.1f}x real-time ({probs.shape[0]} frames in {dt:.2f}s)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--diarize", action="store_true")
    args = ap.parse_args(argv)
    bench_whisper([m for m in args.models.split(",") if m])
    if args.diarize:
        bench_diarize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
