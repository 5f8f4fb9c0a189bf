"""whisper-bench: encoder / decoder / batch / prompt + memcpy + mul_mat.

Mirror of examples/bench/bench.cpp (-w 0 model bench, -w 1 memcpy,
-w 2 mul_mat) producing the Enc./Dec./Bch5/PP columns of
scripts/bench-all-gg.txt. Timed regions chain N iterations with data
dependencies inside one jit so dispatch overhead cancels.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _bench_model(model_path: str | None, preset: str | None):
    import jax
    import jax.numpy as jnp

    from ..models.whisper import model as M

    if model_path:
        from ..io.ggml_whisper import load_checkpoint
        ck = load_checkpoint(model_path)
        cfg = M.WhisperConfig.from_hparams(ck.hparams)
        if ck.n_loaded:
            params = M.params_from_checkpoint(ck, dtype=jnp.bfloat16)
        else:
            params = M.init_params(cfg, dtype=jnp.bfloat16)
        name = ck.hparams.model_type
    else:
        cfg = M.PRESETS[preset or "tiny"]
        params = M.init_params(cfg, dtype=jnp.bfloat16)
        name = preset or "tiny"

    mel = jnp.zeros((1, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)

    N_ENC = 4

    @jax.jit
    def enc_loop(enc_params, mel0):
        def body(x, _):
            out = M.encode(cfg, enc_params, x)
            return mel0 + jnp.mean(out).astype(mel0.dtype) * 1e-6, ()
        x, _ = jax.lax.scan(body, mel0, None, length=N_ENC)
        return jnp.sum(x)

    float(enc_loop(params["encoder"], mel))
    t0 = time.perf_counter()
    float(enc_loop(params["encoder"], mel))
    enc_ms = (time.perf_counter() - t0) / N_ENC * 1e3

    enc_out = M.encode(cfg, params["encoder"], mel)
    xk, xv = M.cross_kv(cfg, params["decoder"], enc_out)

    def dec_bench(batch, length=128):
        xkb = jnp.repeat(xk, batch, axis=1) if batch > 1 else xk
        xvb = jnp.repeat(xv, batch, axis=1) if batch > 1 else xv

        @jax.jit
        def loop(dec_params, xk, xv):
            kv_k, kv_v = M.init_kv_cache(cfg, batch, dtype=jnp.bfloat16)
            tok = jnp.zeros((batch, 1), jnp.int32)

            def body(carry, _):
                tok, kv_k, kv_v, head = carry
                logits, kv_k, kv_v, _ = M.decode_impl(
                    cfg, dec_params, tok, kv_k, kv_v, head, xk, xv)
                tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (tok, kv_k, kv_v, head + 1), ()

            (tok, _, _, _), _ = jax.lax.scan(
                body, (tok, kv_k, kv_v, jnp.int32(0)), None, length=length)
            return jnp.sum(tok)

        float(loop(params["decoder"], xkb, xvb))
        t0 = time.perf_counter()
        float(loop(params["decoder"], xkb, xvb))
        return (time.perf_counter() - t0) / length * 1e3

    dec_ms = dec_bench(1)
    bch5_ms = dec_bench(5)

    @jax.jit
    def pp(dec_params):
        kv_k, kv_v = M.init_kv_cache(cfg, 1, dtype=jnp.bfloat16)
        toks = jnp.zeros((1, 256), jnp.int32)
        logits, _, _, _ = M.decode_impl(cfg, dec_params, toks, kv_k, kv_v,
                                        jnp.int32(0), xk, xv)
        return jnp.sum(logits[:, -1])

    float(pp(params["decoder"]))
    t0 = time.perf_counter()
    float(pp(params["decoder"]))
    pp_ms = (time.perf_counter() - t0) / 256 * 1e3

    dev = str(jax.devices()[0])
    print(f"| {dev} | {name:>16} | {enc_ms:8.2f} | {dec_ms:8.2f} "
          f"| {bch5_ms:8.2f} | {pp_ms:8.4f} |")
    print("|  (columns: Enc. ms, Dec. ms/tok, Bch5 ms/tok, PP ms/tok)")


def _bench_memcpy():
    import jax
    import jax.numpy as jnp

    n = 1 << 28  # 1 GB of f32
    x = jnp.ones((n // 4,), jnp.float32)

    @jax.jit
    def copy_loop(x):
        def body(c, _):
            return c * 1.0000001, ()
        y, _ = jax.lax.scan(body, x, None, length=8)
        return jnp.sum(y[:1])

    float(copy_loop(x))
    t0 = time.perf_counter()
    float(copy_loop(x))
    dt = (time.perf_counter() - t0) / 8
    gbps = 2 * (n / 1e9) / dt  # read + write
    print(f"memcpy (on-device, 1 GB r+w): {gbps:7.2f} GB/s")


def _bench_mul_mat():
    import jax
    import jax.numpy as jnp

    for size in (512, 1024, 2048, 4096):
        for dtype, label in ((jnp.float32, "F32"), (jnp.bfloat16, "BF16")):
            a = jnp.ones((size, size), dtype)
            b = jnp.ones((size, size), dtype)

            @jax.jit
            def mm_loop(a, b):
                def body(c, _):
                    return jnp.dot(c, b, preferred_element_type=c.dtype), ()
                y, _ = jax.lax.scan(body, a, None, length=8)
                return jnp.sum(y[:1, :1].astype(jnp.float32))

            float(mm_loop(a, b))
            t0 = time.perf_counter()
            float(mm_loop(a, b))
            dt = (time.perf_counter() - t0) / 8
            gflops = 2 * size ** 3 / dt / 1e9
            print(f"  {size:4d} x {size:4d}: {label}: {gflops:9.1f} GFLOPS")


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser(prog="whisper-bench")
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("--preset", default=None,
                    help="model preset with random weights (tiny..large-v3-turbo)")
    ap.add_argument("-w", "--what", type=int, default=0,
                    help="0=model, 1=memcpy, 2=mul_mat")
    ap.add_argument("-t", "--threads", type=int, default=4)  # compat no-op
    ap.add_argument("-fa", "--flash-attn", action="store_true")
    args = ap.parse_args(argv)

    if args.what == 1:
        _bench_memcpy()
    elif args.what == 2:
        _bench_mul_mat()
    else:
        _bench_model(args.model, args.preset)
    return 0


if __name__ == "__main__":
    sys.exit(main())
