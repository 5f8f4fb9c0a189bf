"""Probe: does the v5e MXU run s8 x s8 -> s32 at ~2x the bf16 rate, and
from which layer (XLA dot_general vs a Pallas kernel)?

Round-3 shelved encoder quantization because XLA s8 dot_general measured
no speedup; VERDICT r4 ask #1 needs enc_ms <= 14, which requires the
int8 MXU path. This isolates the question on the encoder's own dominant
compute: the MLP pair x@W1 -> gelu -> @W2 at large-v3-turbo shapes
((1536,1280)@(1280,5120)@(5120,1280) = 40.3 GOP/iter), chained
x_{i+1} = f(x_i) so nothing dead-code-eliminates, full outputs written.

The W8A8 variant pays the REAL serving costs too: per-row activation
quantization between every matmul (amax/round/clip at f32), per-row x
per-col scale epilogue.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, F = 1536, 1280, 5120
NITER = 32
GOP = 2 * M * K * F * 2 / 1e9  # both matmuls

rng = np.random.default_rng(0)
X0 = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
W1 = jnp.asarray(rng.standard_normal((K, F)) * K ** -0.5, jnp.bfloat16)
W2 = jnp.asarray(rng.standard_normal((F, K)) * F ** -0.5, jnp.bfloat16)


def quant_rows(x):
    """(M,K) float -> int8 rows + f32 per-row scale (symmetric)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = amax / 127.0
    q = jnp.clip(jnp.round(x32 / jnp.where(s == 0, 1.0, s)), -127, 127)
    return q.astype(jnp.int8), s


def quant_cols(w):
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    s = amax / 127.0
    q = jnp.clip(jnp.round(w32 / jnp.where(s == 0, 1.0, s)), -127, 127)
    return q.astype(jnp.int8), s


W1q, W1s = quant_cols(W1)
W2q, W2s = quant_cols(W2)
W1q, W1s, W2q, W2s = map(jax.device_put, (W1q, W1s, W2q, W2s))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / NITER


def chain(step):
    @jax.jit
    def loop(x, *ws):
        def body(x, _):
            y = step(x, *ws)
            # renormalize so values stay sane across 32 iterations
            y = (y * jax.lax.rsqrt(jnp.mean(jnp.square(
                y.astype(jnp.float32))) + 1e-6)).astype(jnp.bfloat16)
            return y, ()
        x, _ = jax.lax.scan(body, x, None, length=NITER)
        return x
    return loop


# ---- XLA bf16 baseline ----
def step_bf16(x, w1, w2):
    h = jax.nn.gelu(jnp.dot(x, w1, preferred_element_type=jnp.float32),
                    approximate=True).astype(jnp.bfloat16)
    return jnp.dot(h, w2, preferred_element_type=jnp.float32)


# ---- XLA W8A8 ----
def step_xla_s8(x, w1q, w1s, w2q, w2s):
    xq, xs = quant_rows(x)
    h = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = jax.nn.gelu(h.astype(jnp.float32) * xs * w1s, approximate=True)
    hq, hs = quant_rows(h)
    o = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return o.astype(jnp.float32) * hs * w2s


# ---- Pallas matmuls ----
def _mm_bf16_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)


def _mm_s8_kernel(a_ref, as_ref, b_ref, bs_ref, o_ref):
    o = jax.lax.dot_general(a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[:] = (o.astype(jnp.float32) * as_ref[:] * bs_ref[:]
                ).astype(jnp.bfloat16)


def pallas_mm_bf16(bm, bn, nk, nn):
    return pl.pallas_call(
        _mm_bf16_kernel,
        grid=(M // bm, nn // bn),
        in_specs=[pl.BlockSpec((bm, nk), lambda i, j: (i, 0)),
                  pl.BlockSpec((nk, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, nn), jnp.bfloat16))


def pallas_mm_s8(bm, bn, nk, nn):
    return pl.pallas_call(
        _mm_s8_kernel,
        grid=(M // bm, nn // bn),
        in_specs=[pl.BlockSpec((bm, nk), lambda i, j: (i, 0)),
                  pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
                  pl.BlockSpec((nk, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((1, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, nn), jnp.bfloat16))


def make_step_pallas_bf16(bm, bn):
    mm1 = pallas_mm_bf16(bm, bn, K, F)
    mm2 = pallas_mm_bf16(bm, bn, F, K)

    def step(x, w1, w2):
        h = jax.nn.gelu(mm1(x, w1).astype(jnp.float32),
                        approximate=True).astype(jnp.bfloat16)
        return mm2(h, w2)
    return step


def make_step_pallas_s8(bm, bn):
    mm1 = pallas_mm_s8(bm, bn, K, F)
    mm2 = pallas_mm_s8(bm, bn, F, K)

    def step(x, w1q, w1s, w2q, w2s):
        xq, xs = quant_rows(x)
        h = jax.nn.gelu(mm1(xq, xs, w1q, w1s).astype(jnp.float32),
                        approximate=True)
        hq, hs = quant_rows(h)
        return mm2(hq, hs, w2q, w2s)
    return step


def report(name, dt):
    print(f"{name:36s} {dt*1e6:8.1f} us  {GOP/dt/1e3:7.1f} TOP/s", flush=True)


if __name__ == "__main__":
    print(f"MLP pair ({M},{K})x({K},{F})x({F},{K}), {NITER} chained iters",
          flush=True)
    report("XLA bf16", timeit(chain(step_bf16), X0, W1, W2))
    report("XLA W8A8 (incl act quant)",
           timeit(chain(step_xla_s8), X0, W1q, W1s, W2q, W2s))
    for bm, bn in ((512, 512), (256, 512), (512, 1024), (768, 640)):
        try:
            report(f"pallas bf16 {bm}x{bn}",
                   timeit(chain(make_step_pallas_bf16(bm, bn)), X0, W1, W2))
        except Exception as e:  # noqa: BLE001
            print(f"pallas bf16 {bm}x{bn}: {e!r}"[:160], flush=True)
        try:
            report(f"pallas W8A8 {bm}x{bn}",
                   timeit(chain(make_step_pallas_s8(bm, bn)),
                          X0, W1q, W1s, W2q, W2s))
        except Exception as e:  # noqa: BLE001
            print(f"pallas W8A8 {bm}x{bn}: {e!r}"[:160], flush=True)
