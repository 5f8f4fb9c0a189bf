"""Tensor-parallel decode step: the megakernel's weight stream sharded
over the mesh's `tp` axis.

The monolithic megakernel (ops/decode_megakernel.py) is DMA-floor bound —
bytes are time — and on a mesh it runs REPLICATED: N chips decode exactly
as fast as one. This module is the reference split-buffer hook's TPU
analog (ggml/include/ggml-backend.h:199-201, whisper.cpp's
tensor_split): every matmul weight is COLUMN-sharded over `tp`, so each
chip streams 1/tp of the bytes per token, with tiny (8 x N) activation
all-gathers at stage boundaries.

Why column-parallel everywhere (not Megatron's column+row pairs with
psum): an output element of a column shard is a FULL-K dot — exactly the
arithmetic the single-chip kernel performs for that column — so tp=2
output is bit-for-bit identical to tp=1. A row-parallel psum adds
partials in a different association order and loses that property. The
price is one extra all-gather per layer (6 vs Megatron's 2 + psum), each
moving only an (8, <=4S) bf16/f32 slab over ICI.

Per-device matmuls stream int8 planes through the fused dequant-matvec
kernel (ops/quant_matmul._qmm) — per-stage pallas calls rather than the
monolithic cross-stage DMA pipeline; fusing the sharded stream into one
kernel per layer group (in-kernel ICI collectives via remote DMA) is the
known follow-up once multi-chip hardware exists to A/B it.

Sharding map (device d of tp, Hd = H/tp heads, Sd = S/tp):
  qkv_w  (S, 3S)  -> columns permuted to [q_d | k_d | v_d] blocks, d-th
  o_w    (S, S)   -> output columns [d*Sd, (d+1)*Sd)
  cq_w, co_w      -> same as qkv (head cols) / o
  mlp0_w (S, 4S)  -> hidden columns 1/tp
  mlp1_w (4S, S)  -> output columns 1/tp (K = 4S stays whole)
  teT    (S, Vp)  -> vocab columns 1/tp
  self-KV (L,Tc,S), cross-KV (L,Ta,S) natural layout -> S axis 1/tp
  (head-contiguous: the natural layout is [h0 dh | h1 dh | ...])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .quant_matmul import _qmm


def _permute_qkv_cols(w: jnp.ndarray, S: int, tp: int) -> jnp.ndarray:
    """(..., 3S) fused-qkv columns -> per-device blocks [q_d|k_d|v_d]."""
    Sd = S // tp
    idx = np.concatenate([
        np.concatenate([np.arange(p * S + d * Sd, p * S + (d + 1) * Sd)
                        for p in range(3)])
        for d in range(tp)])
    return jnp.take(w, jnp.asarray(idx), axis=-1)


def prepare_mega_tp(cfg, dec, tp: int) -> dict:
    """Prepared decoder params (after model.prepare_decoder) -> stacked
    int8 planes laid out for `tp`-way column sharding. Reuses the
    megakernel's quantizer (decode_megakernel._to_planes, q8_0-level
    numerics; checkpoint QuantLinear planes pass through losslessly)."""
    from .decode_megakernel import _to_planes

    b = dec["blocks"]
    if "qkv_w" not in b:
        raise ValueError("run prepare_decoder first (fused qkv required)")
    S = cfg.n_text_state
    if cfg.n_text_head % tp:
        raise ValueError(f"tp={tp} must divide n_text_head={cfg.n_text_head}")
    bf = jnp.bfloat16

    def planes(name, perm_qkv=False):
        p = _to_planes(b[name])
        qs, sc = p.qs, p.sc
        if perm_qkv:
            qs = _permute_qkv_cols(qs, S, tp)
            sc = _permute_qkv_cols(sc, S, tp)
        return qs, sc

    qkv_qs, qkv_sc = planes("qkv_w", perm_qkv=True)
    o_qs, o_sc = planes("o_w")
    cq_qs, cq_sc = planes("cq_w", perm_qkv=False)
    co_qs, co_sc = planes("co_w")
    m0_qs, m0_sc = planes("mlp0_w")
    m1_qs, m1_sc = planes("mlp1_w")

    te = dec["te"]
    V = te.shape[0]
    Vp = -(-V // (512 * tp)) * (512 * tp)   # tp-divisible padded vocab
    teT = _to_planes(jnp.pad(te.T.astype(jnp.float32), ((0, 0), (0, Vp - V))))

    L = cfg.n_text_layer
    lnw = jnp.stack([b["attn_ln_w"], b["cross_ln_w"], b["mlp_ln_w"]],
                    axis=1).astype(bf)        # (L, 3, S)
    lnb = jnp.stack([b["attn_ln_b"], b["cross_ln_b"], b["mlp_ln_b"]],
                    axis=1).astype(bf)

    return {
        "tp": tp, "n_vocab": V, "vp": Vp,
        "qkv_qs": qkv_qs, "qkv_sc": qkv_sc,
        "qkv_b": _permute_qkv_cols(b["qkv_b"].astype(bf), S, tp),
        "o_qs": o_qs, "o_sc": o_sc, "o_b": b["o_b"].astype(bf),
        "cq_qs": cq_qs, "cq_sc": cq_sc, "cq_b": b["cq_b"].astype(bf),
        "co_qs": co_qs, "co_sc": co_sc, "co_b": b["co_b"].astype(bf),
        "mlp0_qs": m0_qs, "mlp0_sc": m0_sc, "mlp0_b": b["mlp0_b"].astype(bf),
        "mlp1_qs": m1_qs, "mlp1_sc": m1_sc, "mlp1_b": b["mlp1_b"].astype(bf),
        "lnw": lnw, "lnb": lnb,
        "ln_w": dec["ln_w"].astype(bf), "ln_b": dec["ln_b"].astype(bf),
        "teT_qs": teT.qs, "teT_sc": teT.sc,
    }


def tp_param_specs(mp: dict) -> dict:
    """PartitionSpec per entry of a prepare_mega_tp dict (column axes on
    'tp'; biases of column-sharded weights shard with them)."""
    col = P(None, None, "tp")      # (L, K, N) planes: shard N
    bias = P(None, "tp")           # (L, N)
    specs = {
        "qkv_qs": col, "qkv_sc": col, "qkv_b": bias,
        "o_qs": col, "o_sc": col, "o_b": bias,
        "cq_qs": col, "cq_sc": col, "cq_b": bias,
        "co_qs": col, "co_sc": col, "co_b": bias,
        "mlp0_qs": col, "mlp0_sc": col, "mlp0_b": bias,
        "mlp1_qs": col, "mlp1_sc": col, "mlp1_b": bias,
        "lnw": P(None, None, None), "lnb": P(None, None, None),
        "ln_w": P(None), "ln_b": P(None),
        "teT_qs": P(None, "tp"), "teT_sc": P(None, "tp"),
    }
    return specs


def _interp() -> bool:
    return jax.devices()[0].platform == "cpu"


def _mm(x: jnp.ndarray, qs: jnp.ndarray, sc: jnp.ndarray) -> jnp.ndarray:
    """(R, K) bf16 @ int8 planes (K, Nd) -> (R, Nd) f32 via the fused
    dequant-matvec kernel (per-device column shard)."""
    return _qmm(x.astype(jnp.bfloat16), qs, sc, interpret=_interp())


def _ln(x32, w, b, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def _attn_local(q, kc, vc, n_head_local, dh, scale, mask):
    """Local-head attention over the natural-layout cache shard.
    q (R, Sd) f32, kc/vc (Tc, Sd) bf16, mask (R, Tc) additive f32."""
    R = q.shape[0]
    Tc = kc.shape[0]
    qh = q.reshape(R, n_head_local, dh).astype(jnp.float32)
    kh = kc.reshape(Tc, n_head_local, dh).astype(jnp.float32)
    vh = vc.reshape(Tc, n_head_local, dh).astype(jnp.float32)
    scores = jnp.einsum("rhd,thd->hrt", qh, kh) * scale
    scores = scores + mask[None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hrt,thd->rhd", probs, vh)
    return out.reshape(R, n_head_local * dh)


def mega_decode_step_tp(cfg, mp: dict, x0: jnp.ndarray,
                        kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                        kv_head: jnp.ndarray,
                        xk: jnp.ndarray, xv: jnp.ndarray,
                        mesh: Mesh = None, axis: str = "tp"):
    """TP decode step: semantics of decode_megakernel.mega_decode_step
    (R consecutive tokens, natural-layout KV, logits at every row), with
    the weight stream column-sharded over `mesh`'s `axis`.

    x0 (R, S) bf16 embedding rows (replicated); kv_k/kv_v (L, Tc, S)
    natural self-KV (S axis sharded on device); xk/xv (L, Ta, S) cross-KV
    (xk pre-scaled d**-0.25; S axis sharded). Returns (logits (R, V) f32
    replicated, kv_k, kv_v).
    """
    tp, V = int(mp["tp"]), int(mp["n_vocab"])
    mpa = {k: v for k, v in mp.items() if k in tp_param_specs(mp)}
    return _step_tp(cfg, mpa, x0, kv_k, kv_v, kv_head, xk, xv,
                    mesh=mesh, axis=axis, tp=tp, n_vocab=V)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "axis", "tp", "n_vocab"),
                   donate_argnames=("kv_k", "kv_v"))
def _step_tp(cfg, mp: dict, x0: jnp.ndarray,
             kv_k: jnp.ndarray, kv_v: jnp.ndarray, kv_head: jnp.ndarray,
             xk: jnp.ndarray, xv: jnp.ndarray,
             mesh: Mesh, axis: str, tp: int, n_vocab: int):
    from jax import shard_map

    V = n_vocab
    S = cfg.n_text_state
    H = cfg.n_text_head
    dh = cfg.d_text_head
    Hd = H // tp
    L = cfg.n_text_layer
    R = x0.shape[0]
    eps = float(cfg.eps)
    kqscale = float(dh) ** -0.25
    Tc = kv_k.shape[1]

    def gather(y):
        return jax.lax.all_gather(y, axis, axis=-1, tiled=True)

    def body(mpd, x0, kv_k, kv_v, kv_head, xk, xv):
        positions = kv_head + jnp.arange(R)
        # causal-with-cache mask (decode_impl's): col <= pos
        col = jnp.arange(Tc)[None, :]
        mask = jnp.where(col <= positions[:, None], 0.0,
                         -jnp.inf).astype(jnp.float32)
        x = x0.astype(jnp.float32)

        new_k, new_v = [], []
        for il in range(L):
            h = _ln(x, mpd["lnw"][il, 0], mpd["lnb"][il, 0], eps)
            qkv = (_mm(h, mpd["qkv_qs"][il], mpd["qkv_sc"][il])
                   + mpd["qkv_b"][il].astype(jnp.float32))
            Sd = qkv.shape[-1] // 3
            q = qkv[:, :Sd] * kqscale
            k = (qkv[:, Sd:2 * Sd] * kqscale).astype(jnp.bfloat16)
            v = qkv[:, 2 * Sd:].astype(jnp.bfloat16)
            kc = jax.lax.dynamic_update_slice(kv_k[il], k, (kv_head, 0))
            vc = jax.lax.dynamic_update_slice(kv_v[il], v, (kv_head, 0))
            new_k.append(kc)
            new_v.append(vc)
            a = _attn_local(q, kc, vc, Hd, dh, 1.0, mask)
            a_full = gather(a.astype(jnp.bfloat16))           # (R, S)
            o = (_mm(a_full, mpd["o_qs"][il], mpd["o_sc"][il])
                 + mpd["o_b"][il].astype(jnp.float32))
            x = x + gather(o.astype(jnp.float32))

            h = _ln(x, mpd["lnw"][il, 1], mpd["lnb"][il, 1], eps)
            cq = (_mm(h, mpd["cq_qs"][il], mpd["cq_sc"][il])
                  + mpd["cq_b"][il].astype(jnp.float32))
            ca = _attn_local(cq, xk[il], xv[il], Hd, dh, kqscale,
                             jnp.zeros((R, xk.shape[1]), jnp.float32))
            ca_full = gather(ca.astype(jnp.bfloat16))
            co = (_mm(ca_full, mpd["co_qs"][il], mpd["co_sc"][il])
                  + mpd["co_b"][il].astype(jnp.float32))
            x = x + gather(co.astype(jnp.float32))

            h = _ln(x, mpd["lnw"][il, 2], mpd["lnb"][il, 2], eps)
            hid = jax.nn.gelu(
                _mm(h, mpd["mlp0_qs"][il], mpd["mlp0_sc"][il])
                + mpd["mlp0_b"][il].astype(jnp.float32), approximate=True)
            hid_full = gather(hid.astype(jnp.bfloat16))       # (R, 4S)
            m1 = (_mm(hid_full, mpd["mlp1_qs"][il], mpd["mlp1_sc"][il])
                  + mpd["mlp1_b"][il].astype(jnp.float32))
            x = x + gather(m1.astype(jnp.float32))

        x = _ln(x, mpd["ln_w"], mpd["ln_b"], eps)
        logits = _mm(x, mpd["teT_qs"], mpd["teT_sc"])         # (R, Vp/tp)
        logits = gather(logits)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    if mesh is None or tp == 1:
        # single-device semantics: gather is identity
        devs = np.asarray(jax.devices()[:1]).reshape(1)
        mesh = Mesh(devs, (axis,))

    specs = tp_param_specs(mp)
    kv_spec = P(None, None, axis)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(None, None), kv_spec, kv_spec, P(),
                  kv_spec, kv_spec),
        out_specs=(P(None, None), kv_spec, kv_spec),
        check_vma=False,
    )(mp, x0, kv_k, kv_v, kv_head, xk, xv)
    logits, kv_k, kv_v = out
    return logits[:, :V], kv_k, kv_v
