"""Single-kernel per-token decoder ("megakernel").

The per-token decode step is HBM-bandwidth bound (~315 MB of bf16 weights
per token for large-v3-turbo), but as a chain of ~30 XLA ops it leaves
gaps: each fusion re-synchronizes, the logits matmul cannot start
prefetching while the MLP runs, and small elementwise stages serialize
against weight reads. This kernel runs the ENTIRE decoder stack — all L
layers (self-attention with KV-cache append, cross-attention, MLP) plus
the final layernorm and vocab projection — as ONE pallas_call:

* Weights stay in HBM (`pl.ANY`) and are streamed through double-buffered
  VMEM tiles with manual async DMA, so the DMA engine never idles between
  matvecs of different stages (the gap XLA cannot close across fusions).
* The self-KV cache and cross-KV use the *natural* (T, S=H*dh) layout —
  the new K/V rows are written with plain row stores (no head-major
  relayout on the hot path) and attention contracts 64-wide head slices
  directly, the same no-transpose trick as ops/attention._mha_packed.
* The KV cache is aliased in/out: the kernel writes exactly one (1, S)
  row per cache per layer — HBM write traffic per token is ~10 KB, not a
  cache copy.

Semantics mirror models/whisper/model.py::decode_impl at M=1 (greedy
decode, logits at the last position only), which itself mirrors
whisper_build_graph_decoder (reference src/whisper.cpp:2458-2836): Q/K
pre-scaled by d**-0.25, cross K pre-scaled at build, f32 layernorm stats,
tanh-approximate GELU, bf16 residual stream.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _pick_tn(n: int, cap: int = 768) -> int:
    """Largest multiple of 128 that divides n (<= cap); weight tile width."""
    for t in range(cap // 128, 0, -1):
        tn = t * 128
        if n % tn == 0:
            return tn
    raise ValueError(f"N={n} not a multiple of 128")


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("qkv_w", "qkv_b", "o_w", "o_b", "cq_w",
                                "cq_b", "co_w", "co_b", "mlp0_w", "mlp0_b",
                                "mlp1_w", "mlp1_b", "lnw", "lnb", "teT"),
                   meta_fields=())
@dataclasses.dataclass
class MegaParams:
    """Decoder weights arranged for the megakernel (all bf16).

    Stacked (L, ...) weight planes are the SAME arrays as the prepared
    decoder blocks (no copy); lnw/lnb pack the 3 per-layer layernorms plus
    the final one as rows [3*il+0: attn, +1: cross, +2: mlp, last: final].
    teT is the transposed, 512-column-padded vocab projection."""
    qkv_w: jnp.ndarray   # (L, S, 3S)
    qkv_b: jnp.ndarray   # (L, 3S)
    o_w: jnp.ndarray     # (L, S, S)
    o_b: jnp.ndarray     # (L, S)
    cq_w: jnp.ndarray    # (L, S, S)
    cq_b: jnp.ndarray    # (L, S)
    co_w: jnp.ndarray    # (L, S, S)
    co_b: jnp.ndarray    # (L, S)
    mlp0_w: jnp.ndarray  # (L, S, 4S)
    mlp0_b: jnp.ndarray  # (L, 4S)
    mlp1_w: jnp.ndarray  # (L, 4S, S)
    mlp1_b: jnp.ndarray  # (L, S)
    lnw: jnp.ndarray     # (3L+1, S)
    lnb: jnp.ndarray     # (3L+1, S)
    teT: jnp.ndarray     # (S, Vp)

    @property
    def n_layer(self) -> int:
        return self.qkv_w.shape[0]


def prepare_mega(cfg, dec) -> MegaParams:
    """Prepared decoder params (after model.prepare_decoder) -> MegaParams.

    Reuses the stacked block arrays in place; only lnw/lnb/teT are built.
    """
    b = dec["blocks"]
    if "qkv_w" not in b:
        raise ValueError("run prepare_decoder first (fused qkv required)")
    L = cfg.n_text_layer
    bf = jnp.bfloat16
    lnw_rows, lnb_rows = [], []
    for il in range(L):
        lnw_rows += [b["attn_ln_w"][il], b["cross_ln_w"][il],
                     b["mlp_ln_w"][il]]
        lnb_rows += [b["attn_ln_b"][il], b["cross_ln_b"][il],
                     b["mlp_ln_b"][il]]
    lnw_rows.append(dec["ln_w"])
    lnb_rows.append(dec["ln_b"])
    te = dec["te"]
    V = te.shape[0]
    Vp = -(-V // 512) * 512
    teT = jnp.pad(te.T.astype(bf), ((0, 0), (0, Vp - V)))
    cast = lambda x: x.astype(bf)
    return MegaParams(
        qkv_w=cast(b["qkv_w"]), qkv_b=cast(b["qkv_b"]),
        o_w=cast(b["o_w"]), o_b=cast(b["o_b"]),
        cq_w=cast(b["cq_w"]), cq_b=cast(b["cq_b"]),
        co_w=cast(b["co_w"]), co_b=cast(b["co_b"]),
        mlp0_w=cast(b["mlp0_w"]), mlp0_b=cast(b["mlp0_b"]),
        mlp1_w=cast(b["mlp1_w"]), mlp1_b=cast(b["mlp1_b"]),
        lnw=jnp.stack([cast(r) for r in lnw_rows]),
        lnb=jnp.stack([cast(r) for r in lnb_rows]),
        teT=teT)


def _ln_rows(x32, w, b, eps):
    """f32 layernorm over the last axis (ggml_norm's f32 stats)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32)[None, :] + b.astype(jnp.float32)[None, :]


def _make_kernel(cfg, Ta: int, Tc: int, Vp: int, eps: float,
                 ta_valid: int | None = None):
    """Build the kernel body. Static dims: L layers, S model width, H heads
    of dh=S/H, Ta cross length (16-aligned), Tc self-cache capacity, Vp
    padded vocab. ta_valid: real cross length (pad rows masked).

    All weight matvecs consume ONE continuous, fully unrolled tile stream
    with lookahead-2 triple-buffered DMA: tile i+1 and i+2 are already in
    flight when tile i is consumed, ACROSS stage and layer boundaries, so
    the DMA engine never drains at a matvec boundary (the stall that
    limited the loop-per-matvec v1 to 602 us/token)."""
    if ta_valid is None:
        ta_valid = Ta
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = cfg.n_text_layer
    S = cfg.n_text_state
    H = cfg.n_text_head
    dh = S // H
    M = 8                                    # sublane-padded token rows
    kqscale = float(dh) ** -0.25
    NB = 3                                   # tile buffer slots
    LOOKAHEAD = 2                            # tiles in flight ahead of use
                                             # (A/B: NB=5/LA=4 measured the
                                             # same 506-511 us — the queue
                                             # never drains at depth 2)
    TN_QKV = _pick_tn(3 * S, cap=1280)
    TN_SQ = _pick_tn(S, cap=1280)            # o/cq/co tiles
    TN_M0 = _pick_tn(4 * S, cap=1280)
    TN_M1 = _pick_tn(S, cap=256)             # mlp1: K=4S rows, narrow tiles
    TN_TE = _pick_tn(Vp, cap=1024)
    TN_MAX = max(TN_QKV, TN_SQ, TN_M0, TN_TE)
    Tcp = -(-Tc // 16) * 16                  # bf16 sublane padding
    Tap = -(-Ta // 16) * 16

    def attend(q16, kbuf, vbuf, n_valid, scale):
        """Packed-slice attention: q16 (M, S) bf16, kbuf/vbuf (Tpad, S)
        natural layout; returns (M, S) bf16. Head slices contract 64-wide
        directly (ops/attention._packed_kernel trick: no transposes)."""
        outs = []
        for h in range(H):
            qa = q16[:, h * dh:(h + 1) * dh]
            ka = kbuf[:, h * dh:(h + 1) * dh]
            va = vbuf[:, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(
                qa, ka, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale      # (M, Tpad)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
            outs.append(jnp.dot(p, va, preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)

    def kernel(head_ref,                       # SMEM (1,1) i32
               x_ref,                          # VMEM (M, S) bf16
               lnw_ref, lnb_ref,               # VMEM (3L+1, S) bf16
               qkvb_ref, ob_ref, cqb_ref, cob_ref, m0b_ref, m1b_ref,
               qkvw_ref, ow_ref, cqw_ref, cow_ref, m0w_ref, m1w_ref,
               teT_ref,                        # HBM  (S, Vp) bf16
               kvk_ref, kvv_ref,               # HBM  (L, Tc, S) bf16 aliased
               xk_ref, xv_ref,                 # HBM  (L, Ta, S) bf16
               logits_ref,                     # out VMEM (M, Vp) f32
               okvk_ref, okvv_ref,             # out HBM aliased
               wbuf, wbuf2,                    # (NB,S,TN_MAX) / (NB,4S,TN_M1)
               abuf,                           # (M, 4S) f32 matvec outputs
               kbuf, vbuf,                     # (Tcp, S) self-cache tiles
               ckbuf, cvbuf,                   # (2, Tap, S) cross double-buf
               wsem, wsem2, ksem, csem, wrsem):  # DMA semaphores
        # okvk/okvv alias kvk/kvv (same HBM buffer on hardware); reads go
        # through the input refs, the new-row DMAs through the output refs
        # so interpret mode (separate copies) stays correct too.
        head = head_ref[0, 0]

        # ---- static tile schedules (program order == consume order) ----
        tiles_a, tiles_b = [], []
        for il in range(L):
            for (wref, n_out, tn) in ((qkvw_ref.at[il], 3 * S, TN_QKV),
                                      (ow_ref.at[il], S, TN_SQ),
                                      (cqw_ref.at[il], S, TN_SQ),
                                      (cow_ref.at[il], S, TN_SQ),
                                      (m0w_ref.at[il], 4 * S, TN_M0)):
                for t in range(n_out // tn):
                    tiles_a.append((wref, t * tn, tn))
            for t in range(S // TN_M1):
                tiles_b.append((m1w_ref.at[il], t * TN_M1))
        for t in range(Vp // TN_TE):
            tiles_a.append((teT_ref, t * TN_TE, TN_TE))

        def dma_a(i):
            wref, off, tn = tiles_a[i]
            return pltpu.make_async_copy(
                wref.at[:, pl.ds(off, tn)],
                wbuf.at[i % NB, pl.ds(0, S), pl.ds(0, tn)],
                wsem.at[i % NB])

        def dma_b(i):
            wref, off = tiles_b[i]
            return pltpu.make_async_copy(
                wref.at[:, pl.ds(off, TN_M1)],
                wbuf2.at[i % NB], wsem2.at[i % NB])

        st = {"a_started": 0, "a_next": 0, "b_started": 0, "b_next": 0}

        def a_ensure(n):
            while st["a_started"] < min(n, len(tiles_a)):
                dma_a(st["a_started"]).start()
                st["a_started"] += 1

        def b_ensure(n):
            while st["b_started"] < min(n, len(tiles_b)):
                dma_b(st["b_started"]).start()
                st["b_started"] += 1

        def consume_a(x16, out_ref, n_out, tn):
            """out_ref[:, :n_out] = x16 @ W for the next n_out//tn tiles."""
            for t in range(n_out // tn):
                i = st["a_next"]
                st["a_next"] += 1
                a_ensure(i + 1 + LOOKAHEAD)
                dma_a(i).wait()
                w = wbuf[i % NB, pl.ds(0, S), pl.ds(0, tn)]
                out_ref[:, pl.ds(t * tn, tn)] = jnp.dot(
                    x16, w, preferred_element_type=jnp.float32)

        def consume_b(x16, out_ref):
            for t in range(S // TN_M1):
                i = st["b_next"]
                st["b_next"] += 1
                b_ensure(i + 1 + LOOKAHEAD)
                dma_b(i).wait()
                out_ref[:, pl.ds(t * TN_M1, TN_M1)] = jnp.dot(
                    x16, wbuf2[i % NB], preferred_element_type=jnp.float32)

        def cross_dma(il, slot):
            return (pltpu.make_async_copy(xk_ref.at[il], ckbuf.at[slot],
                                          csem.at[2 * slot]),
                    pltpu.make_async_copy(xv_ref.at[il], cvbuf.at[slot],
                                          csem.at[2 * slot + 1]))

        for d in cross_dma(0, 0):
            d.start()
        a_ensure(1 + LOOKAHEAD)

        x32 = x_ref[:].astype(jnp.float32)     # (M, S) residual stream

        for il in range(L):                    # static unroll
            slot, nslot = il % 2, (il + 1) % 2

            # self-cache read: overlaps the qkv matvec below
            rk = pltpu.make_async_copy(kvk_ref.at[il],
                                       kbuf.at[pl.ds(0, Tc), :], ksem.at[0])
            rv = pltpu.make_async_copy(kvv_ref.at[il],
                                       vbuf.at[pl.ds(0, Tc), :], ksem.at[1])
            rk.start()
            rv.start()

            # ---- self-attention ----
            h16 = _ln_rows(x32, lnw_ref[3 * il], lnb_ref[3 * il],
                           eps).astype(jnp.bfloat16)
            consume_a(h16, abuf, 3 * S, TN_QKV)
            qkv = (abuf[:, pl.ds(0, 3 * S)].astype(jnp.bfloat16)
                   + qkvb_ref[il][None, :])
            q = qkv[:, :S] * jnp.bfloat16(kqscale)
            k = qkv[:, S:2 * S] * jnp.bfloat16(kqscale)
            v = qkv[:, 2 * S:]

            rk.wait()
            rv.wait()
            # Mosaic requires sublane-aligned stores and DMA slices: patch
            # row `head` via an aligned 8-row read-modify-write in VMEM,
            # then write that same (already-consistent) 8-row block back to
            # the HBM cache — 20 KB/layer instead of a cache copy
            blk0 = pl.multiple_of((head // 8) * 8, 8)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (8, S), 0) == head - blk0
            kbuf[pl.ds(blk0, 8), :] = jnp.where(
                rsel, k[0:1, :], kbuf[pl.ds(blk0, 8), :])
            vbuf[pl.ds(blk0, 8), :] = jnp.where(
                rsel, v[0:1, :], vbuf[pl.ds(blk0, 8), :])
            wk = pltpu.make_async_copy(kbuf.at[pl.ds(blk0, 8), :],
                                       okvk_ref.at[il, pl.ds(blk0, 8), :],
                                       wrsem.at[0])
            wv = pltpu.make_async_copy(vbuf.at[pl.ds(blk0, 8), :],
                                       okvv_ref.at[il, pl.ds(blk0, 8), :],
                                       wrsem.at[1])
            wk.start()
            wv.start()

            a_ensure(st["a_next"] + 1 + LOOKAHEAD)
            a16 = attend(q, kbuf[:], vbuf[:], head + 1, 1.0)
            consume_a(a16, abuf, S, TN_SQ)
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + ob_ref[il][None, :])).astype(jnp.float32)

            # ---- cross-attention ----
            if il + 1 < L:                     # prefetch next layer's cross
                for d in cross_dma(il + 1, nslot):
                    d.start()

            h16 = _ln_rows(x32, lnw_ref[3 * il + 1], lnb_ref[3 * il + 1],
                           eps).astype(jnp.bfloat16)
            consume_a(h16, abuf, S, TN_SQ)
            cq = (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                  + cqb_ref[il][None, :])

            for d in cross_dma(il, slot):
                d.wait()
            a_ensure(st["a_next"] + 1 + LOOKAHEAD)
            ca16 = attend(cq, ckbuf[slot], cvbuf[slot], ta_valid, kqscale)
            consume_a(ca16, abuf, S, TN_SQ)
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + cob_ref[il][None, :])).astype(jnp.float32)

            # ---- MLP ----
            h16 = _ln_rows(x32, lnw_ref[3 * il + 2], lnb_ref[3 * il + 2],
                           eps).astype(jnp.bfloat16)
            b_ensure(st["b_next"] + 1 + LOOKAHEAD)   # mlp1 tiles in flight
            consume_a(h16, abuf, 4 * S, TN_M0)
            g = jax.nn.gelu(
                (abuf[:, pl.ds(0, 4 * S)].astype(jnp.bfloat16)
                 + m0b_ref[il][None, :]).astype(jnp.float32),
                approximate=True).astype(jnp.bfloat16)
            consume_b(g, abuf)
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + m1b_ref[il][None, :])).astype(jnp.float32)

            wk.wait()                          # kbuf/vbuf reused next layer
            wv.wait()

        # ---- final LN + vocab projection ----
        xf = _ln_rows(x32, lnw_ref[3 * L], lnb_ref[3 * L],
                      eps).astype(jnp.bfloat16)
        consume_a(xf, logits_ref, Vp, TN_TE)

    return kernel, dict(M=M, NB=NB, TN_MAX=TN_MAX, TN_M1=TN_M1,
                        Tcp=Tcp, Tap=Tap)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret"),
                   donate_argnames=("kv_k", "kv_v"))
def mega_decode_step(cfg, mp: MegaParams, x0: jnp.ndarray,
                     kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                     kv_head: jnp.ndarray,
                     xk: jnp.ndarray, xv: jnp.ndarray,
                     interpret: bool = False):
    """One greedy decode step for ONE token (B=1).

    x0: (1, S) bf16 token embedding + positional embedding row.
    kv_k/kv_v: (L, Tc, S) bf16 natural-layout self-KV cache (donated).
    xk/xv: (L, Ta, S) bf16 natural-layout cross KV (xk pre-scaled d**-0.25).
    Returns (logits (1, V) f32, kv_k, kv_v) with the new K/V rows written
    at row kv_head of each layer's cache.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = cfg.n_text_state
    Tc = kv_k.shape[1]
    Ta = xk.shape[1]
    V = cfg.n_vocab
    Vp = mp.teT.shape[1]
    eps = float(cfg.eps)

    # Mosaic DMAs need 16-aligned slabs; the pad is loop-invariant, so XLA
    # hoists it out of any surrounding decode loop (one copy per window)
    Tap = -(-Ta // 16) * 16
    if Tap != Ta:
        xk = jnp.pad(xk, ((0, 0), (0, Tap - Ta), (0, 0)))
        xv = jnp.pad(xv, ((0, 0), (0, Tap - Ta), (0, 0)))

    kernel, dims = _make_kernel(cfg, Tap, Tc, Vp, eps, ta_valid=Ta)
    M = dims["M"]
    x = jnp.zeros((M, S), jnp.bfloat16).at[0:1].set(x0.astype(jnp.bfloat16))
    head2d = jnp.reshape(kv_head.astype(jnp.int32), (1, 1))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    # weights/caches must stay in HBM: pl.ANY lets Mosaic place small
    # operands (the kv cache) in VMEM, where dynamic single-row writes
    # hit sublane-alignment limits; DMA row writes to HBM are unrestricted
    anym = lambda: pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    bf = jnp.bfloat16

    logits, kv_k, kv_v = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # head
            vmem(),                                   # x
            vmem(), vmem(),                           # lnw, lnb
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),  # biases
            anym(), anym(), anym(), anym(), anym(), anym(),  # layer weights
            anym(),                                   # teT
            anym(), anym(),                           # kv caches
            anym(), anym(),                           # cross kv
        ],
        out_specs=(vmem(), anym(), anym()),
        out_shape=(
            jax.ShapeDtypeStruct((M, Vp), jnp.float32),
            jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
            jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
        ),
        input_output_aliases={17: 1, 18: 2},
        scratch_shapes=[
            pltpu.VMEM((dims["NB"], S, dims["TN_MAX"]), bf),   # wbuf
            pltpu.VMEM((dims["NB"], 4 * S, dims["TN_M1"]), bf),  # wbuf2
            pltpu.VMEM((M, 4 * S), jnp.float32),             # abuf
            pltpu.VMEM((dims["Tcp"], S), bf),                # kbuf
            pltpu.VMEM((dims["Tcp"], S), bf),                # vbuf
            pltpu.VMEM((2, dims["Tap"], S), bf),             # ckbuf
            pltpu.VMEM((2, dims["Tap"], S), bf),             # cvbuf
            pltpu.SemaphoreType.DMA((dims["NB"],)),          # wsem
            pltpu.SemaphoreType.DMA((dims["NB"],)),          # wsem2
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((4,)),                   # csem
            pltpu.SemaphoreType.DMA((2,)),                   # wrsem
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # scratch exceeds the 16 MB default scoped-vmem cap (cross-KV
            # double buffers dominate at ~15 MB); v5e has 128 MB VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(head2d, x, mp.lnw, mp.lnb,
      mp.qkv_b, mp.o_b, mp.cq_b, mp.co_b, mp.mlp0_b, mp.mlp1_b,
      mp.qkv_w, mp.o_w, mp.cq_w, mp.co_w, mp.mlp0_w, mp.mlp1_w,
      mp.teT, kv_k, kv_v, xk, xv)

    return logits[0:1, :V], kv_k, kv_v
