"""Measured-negative experiment kernels, kept for the record.

Both kernels here are CORRECT (oracle-tested) but measured SLOWER than
the paths that ship; they are NOT wired into any default route. They
stay importable so the A/B harnesses and regression tests can re-run
the comparison when hardware or Mosaic changes the trade-off.

* cross_attention_q8_nat — fused batched int8 cross-attention, natural
  (Ta, S) layout. Exact vs the XLA q8 einsum but 1.43 ms vs 0.558 ms at
  B=16 turbo (docs/PERFORMANCE.md "Batched decode"): per-head small dots
  + unpipelined in-cell converts lose to XLA's fused int8 einsum.
* cross_attention_q8 — the earlier head-major variant; 64-byte DMA rows
  cap it at ~49 GB/s effective (docstring below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross_q8_nat_kernel(n_head: int, dh: int, ta_valid: int, Tap: int,
                         scale: float):
    """Per-batch-row int8 cross-attention cell, NATURAL (Ta, S) layout:
    one (Tap, S) int8 slab per K/V per cell — full 128+-lane DMA rows
    (the layout fix the head-major kernel's docstring calls for), heads
    sliced 64-wide in VMEM like decode_megakernel's attend."""
    def kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref):
        q = q_ref[0]                                   # (8, S) bf16
        outs = []
        for h in range(n_head):
            hs = slice(h * dh, (h + 1) * dh)
            kq = kq_ref[0, :, hs].astype(jnp.bfloat16)  # (Tap, dh)
            s = jax.lax.dot_general(q[:, hs], kq, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ks_ref[0, h][None, :] * scale)    # fold K scales
            if ta_valid < Tap:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < ta_valid, s, -jnp.inf)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            pv = (p * vs_ref[0, h][None, :]).astype(jnp.bfloat16)
            outs.append(jnp.dot(pv, vq_ref[0, :, hs].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
    return kernel


def cross_attention_q8_nat(q: jnp.ndarray, kq: jnp.ndarray, ks: jnp.ndarray,
                           vq: jnp.ndarray, vs: jnp.ndarray, n_head: int,
                           scale: float, ta_valid: int | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused batched int8 cross-attention, natural layout (one pallas_call
    per layer; grid (B,) cells stream one stream's (Ta, S) K/V slabs).

    q (B, 1, S) bf16; kq/vq (B, Tap, S) int8; ks/vs (B, Hs, Tap) f32
    per-(position, head) scales, head-on-sublane transposed
    (models/whisper/model.py::QuantKVNat). Returns (B, 1, S) f32-accurate
    bf16. The dequantized K/V never exist in HBM: int8 slabs DMA at full
    lane width and convert in VMEM — the batched-serving lever
    (docs/PERFORMANCE.md 'Batched decode', VERDICT r3 ask #4)."""
    from jax.experimental import pallas as pl

    B, Tq, S = q.shape
    assert Tq == 1, "decode-step kernel (M=1)"
    dh = S // n_head
    Tap = kq.shape[1]
    Hs = ks.shape[1]
    qp = jnp.zeros((B, 8, S), jnp.bfloat16).at[:, 0, :].set(
        q[:, 0].astype(jnp.bfloat16))

    out = pl.pallas_call(
        _cross_q8_nat_kernel(n_head, dh,
                             Tap if ta_valid is None else int(ta_valid),
                             Tap, float(scale)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Tap, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hs, Tap), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Tap, S), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Hs, Tap), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, S), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 8, S), q.dtype),
        interpret=interpret,
    )(qp, kq, ks, vq, vs)
    return out[:, 0:1, :]


def _cross_q8_kernel(ta_valid: int, Tap: int, scale: float):
    """Per-(batch, head) int8 cross-attention cell: K/V stay int8 until the
    VMEM tile, per-position scales fold into scores / probabilities (the
    dequantized planes never exist in HBM)."""
    def kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref):
        q = q_ref[0, 0]                                # (8, dh) bf16
        kq = kq_ref[0, 0].astype(jnp.bfloat16)         # (Tap, dh)
        ks = ks_ref[0, 0, 0]                           # (Tap,) f32
        s = jax.lax.dot_general(q, kq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks[None, :] * scale                    # (8, Tap)
        if ta_valid < Tap:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < ta_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        pv = (p * vs_ref[0, 0, 0][None, :]).astype(jnp.bfloat16)
        o_ref[0, 0] = jnp.dot(pv, vq_ref[0, 0].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
    return kernel


def cross_attention_q8(q: jnp.ndarray, kq: jnp.ndarray, ks: jnp.ndarray,
                       vq: jnp.ndarray, vs: jnp.ndarray, n_head: int,
                       scale: float, interpret: bool = False) -> jnp.ndarray:
    """Batched M=1 cross-attention over int8 K/V planes (one pallas_call
    per layer; grid (B, H) cells stream one head's K/V tile each).

    q (B, 1, S) bf16; kq/vq (B, H, Ta, dh) int8; ks/vs (B, H, Ta) f32
    per-position scales (models/whisper/model.py::QuantKV). Returns
    (B, 1, S).

    STATUS: NOT WIRED - measured SLOWER in-situ. Isolated A/B said 2.3x
    over the XLA einsum (1.50 vs 3.47 ms at B=16/H=20/Ta=1500), but the
    full batched q8 decode round went 0.706 -> 1.290 s (checksum-equal
    tokens). Cause: head-major (Ta, dh=64) int8 cells make every DMA row
    64 bytes wide (~49 GB/s effective). A faster variant needs the
    natural (Ta, S) layout (128+-lane rows, the decode_megakernel trick),
    i.e. a QuantKV layout change; parked until that lever is taken.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tq, S = q.shape
    assert Tq == 1, "decode-step kernel (M=1)"
    dh = S // n_head
    Ta = kq.shape[2]
    Tap = -(-Ta // 32) * 32                      # int8 sublane tiling
    if Tap != Ta:                                # loop-invariant: hoisted
        pad4 = ((0, 0), (0, 0), (0, Tap - Ta), (0, 0))
        pad3 = ((0, 0), (0, 0), (0, Tap - Ta))
        kq = jnp.pad(kq, pad4)
        vq = jnp.pad(vq, pad4)
        ks = jnp.pad(ks, pad3)
        vs = jnp.pad(vs, pad3)

    qp = jnp.zeros((B, n_head, 8, dh), jnp.bfloat16).at[:, :, 0, :].set(
        q.astype(jnp.bfloat16).reshape(B, n_head, dh))
    ks = ks[:, :, None, :]                       # (B, H, 1, Tap) for tiling
    vs = vs[:, :, None, :]

    out = pl.pallas_call(
        _cross_q8_kernel(Ta, Tap, float(scale)),
        grid=(B, n_head),
        in_specs=[
            pl.BlockSpec((1, 1, 8, dh), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tap, dh), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Tap), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tap, dh), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, Tap), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, dh), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_head, 8, dh), q.dtype),
        interpret=interpret,
    )(qp, kq, ks, vq, vs)
    return out[:, :, 0, :].reshape(B, 1, S)
