"""Single-kernel per-token decoder ("megakernel").

The per-token decode step is HBM-bandwidth bound (~315 MB of bf16 weights
per token for large-v3-turbo). This kernel runs the ENTIRE decoder stack -
all L layers (self-attention with KV-cache append, cross-attention, MLP)
plus the final layernorm and the vocab projection - as ONE pallas_call:

* Weights stay in HBM and stream through a fully unrolled, lookahead-2
  triple-buffered DMA pipeline that is CONTINUOUS across stage and layer
  boundaries: tiles i+1/i+2 (possibly of the *next* matvec or layer) are
  in flight while tile i multiplies, so the DMA engine never drains at a
  matvec boundary.
* Each weight is independently either dense bf16 or int8 planes
  (per-32-row-block scales, the ops/quant_matmul layout). Int8 tiles are
  dequantized inline in VMEM right before the MXU - this is the decisive
  capability over the XLA path, where per-layer int8 lost its bandwidth
  win to 24 separate kernel launches per step (docs/PERFORMANCE.md).
* The self-KV cache and cross-KV use the *natural* (T, S=H*dh) layout -
  new K/V rows are written with one aligned 8-row block DMA per layer and
  attention contracts 64-wide head slices in place (the
  ops/attention._mha_packed no-transpose trick).
* The KV cache is aliased in/out - HBM write traffic per token is ~10 KB.

Semantics mirror models/whisper/model.py::decode_impl at M=1 (greedy
decode, logits at the last position only), which itself mirrors
whisper_build_graph_decoder (reference src/whisper.cpp:2458-2836): Q/K
pre-scaled by d**-0.25, cross K pre-scaled at build, f32 layernorm stats,
tanh-approximate GELU, bf16 residual stream.

Measured (single-process A/B, large-v3-turbo on v5e, docs/PERFORMANCE.md):
dense mode 510 vs 606 us/token against the isolated XLA step, parity
inside the fused segment loop (XLA overlaps the logit rules); the int8
modes are where the kernel wins outright.

Beyond greedy (B=1), the same weight stream carries up to 8 rows:
* mega_decode_step_beam — B beams (whisper.cpp Bch5 analog) with
  origin-table lineage instead of physical KV reorder (beam_attn_bias).
* mega_decode_step_batch — B INDEPENDENT streams (whisper_full_parallel
  analog) with per-stream cross-KV streamed through a chunked
  flash-style online softmax.
Both use a TIME-MAJOR (L, Tc, B, S) self-cache so the blocked self-
attend (lax.fori_loop over 128-row time blocks) touches only the
decoded prefix, and one (B, S) slab write appends all rows per layer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")
QK = 32            # quant block size along the contraction dim
MEGA_GROUP = 8     # max layers fully unrolled per pallas_call; deeper
                   # decoders chain grouped calls (mega_decode_step)


def _pick_tn(n: int, cap: int = 1280) -> int:
    """Largest multiple of 128 that divides n (<= cap); weight tile width."""
    for t in range(cap // 128, 0, -1):
        tn = t * 128
        if n % tn == 0:
            return tn
    raise ValueError(f"N={n} not a multiple of 128")


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("qs", "sc"), meta_fields=())
@dataclasses.dataclass
class QPlanes:
    """Int8 weight planes for one stacked weight: qs (..., K, N) int8,
    sc (..., K//32, N) f32 per-block scales (ops/quant_matmul layout)."""
    qs: jnp.ndarray
    sc: jnp.ndarray


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("qs", "sc"), meta_fields=())
@dataclasses.dataclass
class Q4Planes:
    """Int4 weight planes, SPLIT-HALF packed: qs (..., K//2, N) uint8 where
    the low nibble holds rows [0, K/2) and the high nibble rows [K/2, K)
    (each nibble is value+8, q4_0-style symmetric). sc (..., K//32, N) f32
    per-32-row-block scales over the ORIGINAL row order.

    Split-half (not the even/odd interleave of quant_matmul.QuantLinear4)
    because in-kernel the activation then splits into two CONTIGUOUS lane
    halves x[:, :K/2] / x[:, K/2:] - Mosaic can't lane-stride x[:, 0::2]."""
    qs: jnp.ndarray
    sc: jnp.ndarray


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("qkv_w", "qkv_b", "o_w", "o_b", "cq_w",
                                "cq_b", "co_w", "co_b", "mlp0_w", "mlp0_b",
                                "mlp1_w", "mlp1_b", "lnw", "lnb", "teT"),
                   meta_fields=())
@dataclasses.dataclass
class MegaParams:
    """Decoder weights arranged for the megakernel.

    Weight fields (`*_w`, `teT`) are each EITHER a dense bf16 array or
    QPlanes (int8 + scales). Stacked (L, ...) dense planes are the SAME
    arrays as the prepared decoder blocks (no copy); lnw/lnb pack the 3
    per-layer layernorms plus the final one as rows [3*il+0: attn,
    +1: cross, +2: mlp, last: final]. teT is the transposed,
    512-column-padded vocab projection."""
    qkv_w: object        # (L, S, 3S)
    qkv_b: jnp.ndarray   # (L, 3S)
    o_w: object          # (L, S, S)
    o_b: jnp.ndarray     # (L, S)
    cq_w: object         # (L, S, S)
    cq_b: jnp.ndarray    # (L, S)
    co_w: object         # (L, S, S)
    co_b: jnp.ndarray    # (L, S)
    mlp0_w: object       # (L, S, 4S)
    mlp0_b: jnp.ndarray  # (L, 4S)
    mlp1_w: object       # (L, 4S, S)
    mlp1_b: jnp.ndarray  # (L, S)
    lnw: jnp.ndarray     # (3L+1, S)
    lnb: jnp.ndarray     # (3L+1, S)
    teT: object          # (S, Vp)

    @property
    def n_layer(self) -> int:
        return getattr(self.qkv_w, "qs", self.qkv_w).shape[0]

    @property
    def vp(self) -> int:
        return getattr(self.teT, "qs", self.teT).shape[-1]


def _to_planes(w) -> QPlanes:
    """Dense stacked weight OR QuantLinear -> unpadded QPlanes."""
    from .quant_matmul import QuantLinear, _quantize_planes
    if isinstance(w, QuantLinear):
        n = w.n_out
        return QPlanes(qs=w.qs[..., :n], sc=w.scales[..., :n])
    qs, sc = _quantize_planes(w)
    return QPlanes(qs=qs, sc=sc)


@jax.jit
def _quantize_planes4(w: jnp.ndarray):
    """Dense (..., K, N) float -> split-half int4 planes (see Q4Planes).

    Scales are stored bf16: they are 1/32 of the byte stream but still
    ~20 MB/token at turbo scale, and their rounding (<=2^-8 relative) is
    noise against the int4 grid itself (~2%). ggml's q4_0 stores f16."""
    *lead, K, N = w.shape
    x32 = w.astype(jnp.float32).reshape(*lead, K // QK, QK, N)
    amax = jnp.max(jnp.abs(x32), axis=-2)                    # (..., K/32, N)
    scale = (amax / 7.0).astype(jnp.bfloat16)
    s32 = scale.astype(jnp.float32)
    inv = jnp.where(s32 > 0, 1.0 / jnp.where(s32 == 0, 1.0, s32), 0.0)
    q = jnp.clip(jnp.round(x32 * inv[..., None, :]), -8, 7) + 8
    q = q.reshape(*lead, K, N).astype(jnp.uint8)
    lo = q[..., :K // 2, :]
    hi = q[..., K // 2:, :]
    return (lo | (hi << 4)), scale


def _to_planes4(w) -> Q4Planes:
    """Dense stacked weight OR QuantLinear/QuantLinear4 -> Q4Planes
    (quantized checkpoints are dequantized first; for q4_0 sources the
    int4 grid round-trips to within one re-rounding)."""
    from .quant_matmul import QuantLinear, QuantLinear4, dequantize_dense
    if isinstance(w, (QuantLinear, QuantLinear4)):
        w = dequantize_dense(w, dtype=jnp.float32)
    qs, sc = _quantize_planes4(w)
    return Q4Planes(qs=qs, sc=sc)


def prepare_mega(cfg, dec, quant: str = "none") -> MegaParams:
    """Prepared decoder params (after model.prepare_decoder) -> MegaParams.

    quant: "none"  - everything dense bf16 (reuses the block arrays).
           "logits" - layer weights dense, vocab projection int8 (reuses
             dec["te_logits"] planes when present, so numerics are
             IDENTICAL to the decoder_int8 scope="logits" XLA path).
           "all"   - every weight int8 (q8_0-level error, the W8 serving
             mode; reuses checkpoint QuantLinear planes where present,
             runtime-quantizes dense ones).
           "int4" - every weight split-half int4 (q4_0-level error, the W4
             serving mode; ~80 MB of weight stream per token instead of
             159 int8 / 317 bf16 - the decode step is DMA-floor bound, so
             bytes are time).
    """
    from .quant_matmul import QuantLinear

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

    def _pad_sc(planes):
        # Mosaic HBM DMA slices need 8-aligned sublane extents; scale
        # planes have K//32 rows, which is NOT a multiple of 8 for
        # S=384 models (tiny) — pad rows once here, the kernel copies
        # the padded slab and dequantizes only the real rows
        r = planes.sc.shape[-2]
        rp = -(-r // 8) * 8
        if rp == r:
            return planes
        pad = [(0, 0)] * planes.sc.ndim
        pad[-2] = (0, rp - r)
        return type(planes)(qs=planes.qs, sc=jnp.pad(planes.sc, pad))

    def weight(name):
        w = b[name]
        if quant == "all":
            return _pad_sc(_to_planes(w))
        if quant == "int4":
            return _pad_sc(_to_planes4(w))
        if isinstance(w, QuantLinear):   # quant checkpoint, dense-mode ask
            raise ValueError(f"{name} is quantized; use quant='all'")
        return w.astype(bf)

    te = dec["te"]
    V = te.shape[0]
    Vp = -(-V // 512) * 512
    if quant == "int4":
        teT = _pad_sc(_to_planes4(jnp.pad(te.T.astype(jnp.float32),
                                          ((0, 0), (0, Vp - V)))))
    elif quant in ("logits", "all"):
        tl = dec.get("te_logits")
        if isinstance(tl, QuantLinear) and tl.qs.shape[-1] == Vp:
            teT = _pad_sc(QPlanes(qs=tl.qs, sc=tl.scales))  # XLA-path planes
        else:
            teT = _pad_sc(_to_planes(jnp.pad(te.T.astype(jnp.float32),
                                             ((0, 0), (0, Vp - V)))))
    else:
        teT = jnp.pad(te.T.astype(bf), ((0, 0), (0, Vp - V)))

    def bias(name):
        return b[name].astype(bf)

    return MegaParams(
        qkv_w=weight("qkv_w"), qkv_b=bias("qkv_b"),
        o_w=weight("o_w"), o_b=bias("o_b"),
        cq_w=weight("cq_w"), cq_b=bias("cq_b"),
        co_w=weight("co_w"), co_b=bias("co_b"),
        mlp0_w=weight("mlp0_w"), mlp0_b=bias("mlp0_b"),
        mlp1_w=weight("mlp1_w"), mlp1_b=bias("mlp1_b"),
        lnw=jnp.stack([r.astype(bf) for r in lnw_rows]),
        lnb=jnp.stack([r.astype(bf) for r in lnb_rows]),
        teT=teT)


def hm_to_natural(a: jnp.ndarray, pad16: bool = False) -> jnp.ndarray:
    """Head-major (L, 1, H, T, Dh) KV -> the kernel's natural (L, T, S)
    bf16 layout. `pad16` rounds the row count up to a 16 multiple — for
    SELF-KV carry buffers only (Mosaic DMA slabs want 16-aligned row
    extents; rows past `head` are masked by n_valid). NEVER pad
    cross-KV with this: the kernel pads cross internally while masking
    with the true ta_valid — zero-padding the operand instead would
    admit phantom zero-score columns into the cross softmax."""
    L, _, H, T, Dh = a.shape
    a = jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(
        L, T, H * Dh).astype(jnp.bfloat16)
    if pad16:
        t16 = -(-T // 16) * 16
        if t16 != T:
            a = jnp.pad(a, ((0, 0), (0, t16 - T), (0, 0)))
    return a


BT = 128           # self-attention time-block rows (beam/batch modes)


def beam_attn_bias(origin: jnp.ndarray, head, Tc: int,
                   M: int = 8) -> jnp.ndarray:
    """Origin (lineage) table -> additive attention bias for the beam
    megakernel's blocked, time-major self-attention.

    origin: (B, Tc) int32; origin[b, t] = index of the CACHE SLOT that
    holds beam b's K/V row for decode position t. Maintained by the beam
    loop instead of physically gathering the per-beam caches on every
    reorder (the reference's whisper_kv_cache_seq_cp / reorder_kv):
        origin = origin[src] ;  origin = origin.at[:, head].set(arange(B))
    — an O(B*Tc) int32 shuffle instead of O(L*B*Tc*S) bf16 traffic.
    For INDEPENDENT streams (batch mode) pass the identity origin
    (broadcast arange(B)): each row owns its slot.

    head: current decode row (this step attends t <= head).
    Returns (nblk*M, BT*B) f32 of 0 / -inf, block-major to match the
    kernel's per-block slices: element [t*M + row, tl*B + j] gates row
    `row` attending slot j at time t*BT + tl. Rows >= B (sublane
    padding) reuse beam B-1's lineage so their softmax stays finite
    (outputs discarded).
    """
    B, Tc0 = origin.shape
    assert Tc0 == Tc
    Tcp = -(-Tc // BT) * BT
    nblk = Tcp // BT
    org = jnp.pad(origin, ((0, M - B), (0, Tcp - Tc)), constant_values=-1)
    org = jnp.where(jnp.arange(M)[:, None] >= B, org[B - 1][None, :], org)
    ok = ((org[:, :, None] == jnp.arange(B)[None, None, :])
          & (jnp.arange(Tcp)[None, :, None] <= head))       # (M, Tcp, B)
    ok = ok.reshape(M, nblk, BT, B).transpose(1, 0, 2, 3)
    return jnp.where(ok.reshape(nblk * M, BT * B), 0.0, NEG_INF).astype(
        jnp.float32)


def _ln_rows(x32, w, b, eps):
    """f32 layernorm over the last axis (ggml_norm's f32 stats)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32)[None, :] + b.astype(jnp.float32)[None, :]


# stage table: (field name, K multiplier, N multiplier, stream)
_STAGES = (("qkv_w", 1, 3, "A"), ("o_w", 1, 1, "A"), ("cq_w", 1, 1, "A"),
           ("co_w", 1, 1, "A"), ("mlp0_w", 1, 4, "A"), ("mlp1_w", 4, 1, "B"))


def _make_kernel(cfg, Ta: int, Tc: int, Vp: int, eps: float,
                 qmap: dict, ta_valid: int | None = None,
                 tile_boost: bool = True, n_beams: int = 1,
                 use_bias: bool = False, per_row_cross: bool = False,
                 attend_pv_t: bool = False, tac: int = 128,
                 self_blocked: bool = True,
                 layer_range: tuple[int, int] | None = None,
                 with_logits: bool = True, n_tokens: int = 1):
    """Build the kernel body. Static dims: L layers, S model width, H heads
    of dh=S/H, Ta cross length (16-aligned), Tc self-cache capacity, Vp
    padded vocab; qmap: field name -> None | "int8" | "int4" (plane kind).
    ta_valid: real cross length (pad rows masked).

    n_beams > 1 (beam mode, whisper.cpp:7301-7352's Bch5 analog): the
    B <= 8 live beams ride the M=8 sublane rows, so every matvec and the
    cross-attention (whose KV is SHARED across beams — the big
    amortization vs the XLA batched step) are unchanged; only
    self-attention splits per beam, against per-beam caches
    kv (L, B, Tc, S) with a per-beam row patch + write-back.

    per_row_cross (batched-serving mode): the M rows are B INDEPENDENT
    audio streams, so each row has its OWN cross-KV (L, B, Ta, S). The
    full per-stream cross set (~63 MB/layer at turbo B=8) cannot be
    VMEM-resident, so cross-attention goes BLOCKED: (B, Tac)-row time
    chunks stream through a double buffer and a flash-style online
    softmax (running max / sum / output per head, register-resident)
    accumulates across chunks. Ta must be a multiple of Tac (wrapper
    pads). This is the whisper_full_parallel serving analog: one weight
    stream feeds B streams (decode/batch.py wires it).

    n_tokens > 1 (VERIFY mode, the speculative decoder's multi-token
    target pass): rows 0..n_tokens-1 are CONSECUTIVE positions
    head..head+n_tokens-1 of ONE stream (B == 1), riding the same M=8
    sublane rows the beam mode uses for alternatives. All n_tokens new
    K/V rows are patched into the cache before the self-attend, and the
    attend's valid-column mask becomes per-row causal (row r sees
    head+1+r columns) — each row's math is then IDENTICAL to the
    single-token kernel's at that position, so verify logits are
    bit-equal to n_tokens sequential mega_decode_step calls.

    layer_range (lo, hi) + with_logits (GROUPED mode, models with
    n_text_layer > 8): the kernel runs only layers [lo, hi) of the FULL
    stacked weight/cache operands (no slicing — layer indexing is static
    per call), and when with_logits=False it emits the (M, S) bf16
    residual stream instead of logits; the wrapper chains group calls
    with the self-KV cache aliased straight through. The inter-group
    bf16 handoff is LOSSLESS: the monolithic kernel's residual stream is
    bf16-rounded at every add already."""
    if ta_valid is None:
        ta_valid = Ta
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = cfg.n_text_layer                     # TOTAL layers (lnw final row)
    lo, hi = layer_range if layer_range is not None else (0, L)
    S = cfg.n_text_state
    H = cfg.n_text_head
    dh = S // H
    M = 8                                    # sublane-padded token rows
    B = n_beams
    assert 1 <= B <= M
    R = n_tokens
    assert 1 <= R <= M and (R == 1 or B == 1)
    kqscale = float(dh) ** -0.25
    NB = 3                                   # tile buffer slots
    LOOKAHEAD = 2                            # tiles in flight ahead of use
                                             # (A/B: NB=5/LA=4 measured the
                                             # same - depth 2 never drains)
    # int8 tiles carry half the bytes of bf16 ones, so per-tile fixed cost
    # (semaphore waits, M=8 matvec issue) doubles as a fraction; double the
    # tile caps for quantized fields to keep the tile count down
    def cap2(base):
        return lambda q: base * 2 if q else base
    CAPS = {"qkv_w": cap2(1280), "o_w": cap2(1280), "cq_w": cap2(1280),
            "co_w": cap2(1280), "mlp0_w": cap2(1280),
            "mlp1_w": lambda q: 640 if q else 256, "teT": cap2(1024)}
    NOUT = {"qkv_w": 3 * S, "o_w": S, "cq_w": S, "co_w": S,
            "mlp0_w": 4 * S, "mlp1_w": S, "teT": Vp}
    TN = {f: _pick_tn(NOUT[f], cap=CAPS[f](qmap[f] and tile_boost))
          for f in NOUT}
    a_fields = ["qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "teT"]
    TN_A_D = max((TN[f] for f in a_fields if not qmap[f]), default=0)
    TN_A_Q = max((TN[f] for f in a_fields if qmap[f] == "int8"), default=0)
    TN_A_Q4 = max((TN[f] for f in a_fields if qmap[f] == "int4"), default=0)
    if B > 1:
        # time-major blocked self-attention: pad the cache to whole
        # BT-row time blocks; lineage masking REQUIRES the bias operand
        assert use_bias
        Tcp = -(-Tc // BT) * BT
        NBK = Tcp // BT                      # max valid time blocks
    else:
        Tcp = -(-Tc // 16) * 16              # bf16 sublane padding
    Tap = -(-Ta // 16) * 16
    TAC = tac                                # cross chunk rows (per stream)
    if per_row_cross:
        assert B > 1
        assert TAC & (TAC - 1) == 0          # power of two (mask shifts)
        assert Tap % TAC == 0, (Tap, TAC)    # wrapper pads Ta to TAC
        NCC = Tap // TAC                     # chunks per layer
    # pool -> (used, K, TN_max); suffix D dense bf16 (K, TN) tiles,
    # Q int8 (K, TN) + (K/32, TN) scales, Q4 packed int4 (K/2, TN) + scales
    pools = {
        "AD": (TN_A_D > 0, S, TN_A_D),
        "AQ": (TN_A_Q > 0, S, TN_A_Q),
        "AQ4": (TN_A_Q4 > 0, S, TN_A_Q4),
        "BD": (not qmap["mlp1_w"], 4 * S, TN["mlp1_w"]),
        "BQ": (qmap["mlp1_w"] == "int8", 4 * S, TN["mlp1_w"]),
        "BQ4": (qmap["mlp1_w"] == "int4", 4 * S, TN["mlp1_w"]),
    }
    dims = dict(M=M, NB=NB, Tcp=Tcp, Tap=Tap, pools=pools, B=B, TAC=TAC)

    def attend(q16, kbuf, vbuf, n_valid, scale, causal=False):
        """Packed-slice attention: q16 (M, S) bf16, kbuf/vbuf (Tpad, S)
        natural layout; returns (M, S) bf16. `causal` (verify mode,
        R > 1): row r's valid width grows to n_valid + r — the rows are
        consecutive positions, not alternatives. Head slices contract
        64-wide directly (ops/attention._packed_kernel trick: no
        transposes).
        PV runs transposed (V^T p^T -> (dh, M); long dim contracts at
        dh-row MXU utilization instead of M=8 — see attend_beams) with
        one (S, M) -> (M, S) relayout in the epilogue; attend_pv_t=False
        keeps the row-major form (A/B: tools/bench_greedy_ab.py)."""
        outs = []
        for h in range(H):
            qa = q16[:, h * dh:(h + 1) * dh]
            ka = kbuf[:, h * dh:(h + 1) * dh]
            va = vbuf[:, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(
                qa, ka, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale      # (M, Tpad)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if R > 1 and causal:
                # verify rows: row r is position head+r, sees r extra cols
                rowi = jnp.minimum(
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), R - 1)
                s = jnp.where(col < n_valid + rowi, s, NEG_INF)
            else:
                s = jnp.where(col < n_valid, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
            if attend_pv_t:
                outs.append(jax.lax.dot_general(
                    va, p, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))         # (dh, M)
            else:
                outs.append(jnp.dot(p, va,
                                    preferred_element_type=jnp.float32))
        if attend_pv_t:
            return jnp.transpose(
                jnp.concatenate(outs, axis=0)).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)

    def attend_beams(q16, kbuf, vbuf, nblk, scale, bias_ref):
        """Per-beam/per-stream self-attention, blocked over TIME: the
        caches live ROW-FLAT time-major in (Tcp*B, S) VMEM (row t*B+b =
        slot b's K/V at time t), so a BT-row time block spans every
        slot and a flash-style online softmax runs ONLY over the `nblk`
        = ceil((head+1)/BT) valid blocks — compute and score width are
        proportional to the actual decode depth instead of the static
        B*Tc concat (which cost ~400 us of M=8 dots at turbo B=5).

        bias_ref (NBK*M, BT*B) f32 (0 / -inf), block-major
        (beam_attn_bias): element [t*M + row, tl*B + j] gates row `row`
        attending cache slot j at time t*BT + tl — this both applies
        the origin-table lineage (beam mode) / block-diagonal ownership
        (batch mode) and masks the head+1 tail inside the last block."""
        # kbuf/vbuf are ROW-FLAT time-major 2D refs (Tcp*B, S): row
        # r = t*B + b holds slot b's K/V at time t, so a BT-row time
        # block is rows [t*BT*B, (t+1)*BT*B) — plain 2D dynamic slices
        # (Mosaic rejects dynamic-offset loads on 3D refs).
        if not self_blocked:
            # static full-width attend (no fori/no dynamic slices): one
            # dot per head over all Tcp*B columns, plain softmax — the
            # A/B baseline for the blocked path (measured: blocked wins
            # by ~4% at shallow heads, 0.824 vs 0.859 ms/token at B=5
            # turbo; the gap grows as segments stay short)
            bias_full = jnp.concatenate(
                [bias_ref[t * M:(t + 1) * M, :] for t in range(Tcp // BT)],
                axis=1)                                      # (M, Tcp*B)
            outs = []
            for h in range(H):
                qa = q16[:, h * dh:(h + 1) * dh]
                ka = kbuf[:, h * dh:(h + 1) * dh]
                va = vbuf[:, h * dh:(h + 1) * dh]
                sfull = jax.lax.dot_general(
                    qa, ka, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                sfull = jnp.where(bias_full < 0, NEG_INF, sfull)
                mm = jnp.max(sfull, axis=1, keepdims=True)
                ee = jnp.exp(sfull - mm)
                pp = (ee / jnp.sum(ee, axis=1, keepdims=True)
                      ).astype(jnp.bfloat16)
                if attend_pv_t:
                    outs.append(jax.lax.dot_general(
                        va, pp, (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                else:
                    outs.append(jnp.dot(
                        pp, va, preferred_element_type=jnp.float32))
            if attend_pv_t:
                return jnp.transpose(
                    jnp.concatenate(outs, axis=0)).astype(jnp.bfloat16)
            return jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)
        outs_t = []                      # per-head o^T (dh, M) accumulators
        for h in range(H):
            qa = q16[:, h * dh:(h + 1) * dh]

            def body(t, carry, h=h, qa=qa):
                m, l, ot = carry
                kb = kbuf[pl.ds(t * (BT * B), BT * B),
                          h * dh:(h + 1) * dh]               # (BT*B, dh)
                vb = vbuf[pl.ds(t * (BT * B), BT * B),
                          h * dh:(h + 1) * dh]
                bb = bias_ref[pl.ds(t * M, M), :]            # (M, BT*B)
                s = jax.lax.dot_general(
                    qa, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                # where, not add: masked cols may hit UNINITIALIZED VMEM
                # rows (Tc..Tcp pad) whose garbage can be NaN — NaN + -inf
                # stays NaN, where() discards it
                s = jnp.where(bb < 0, NEG_INF, s)
                mn = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                a = jnp.exp(m - mn)
                e = jnp.exp(s - mn).astype(jnp.bfloat16)     # (M, BT*B)
                l2 = l * a + jnp.sum(e.astype(jnp.float32), axis=1,
                                     keepdims=True)
                if attend_pv_t:
                    # PV with the LONG dim as the MXU contraction:
                    # V^T @ e^T -> (dh, M). The standard form runs the
                    # MXU at M/128 row utilization; transposed it runs
                    # at dh/128. o stays (dh, M) until the epilogue.
                    pv = jax.lax.dot_general(
                        vb, e, (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (dh, M)
                    o2 = ot * jnp.transpose(a) + pv
                else:
                    o2 = ot * a + jnp.dot(
                        e, vb, preferred_element_type=jnp.float32)
                return mn, l2, o2

            m0 = jnp.full((M, 1), jnp.float32(-1e30))
            l0 = jnp.zeros((M, 1), jnp.float32)
            o0 = (jnp.zeros((dh, M), jnp.float32) if attend_pv_t
                  else jnp.zeros((M, dh), jnp.float32))
            m, l, ot = jax.lax.fori_loop(0, nblk, body, (m0, l0, o0))
            outs_t.append(ot / (jnp.transpose(l) if attend_pv_t else l))
        if attend_pv_t:
            # (S, M) -> one relayout back to row-major per attend
            return jnp.transpose(
                jnp.concatenate(outs_t, axis=0)).astype(jnp.bfloat16)
        return jnp.concatenate(outs_t, axis=1).astype(jnp.bfloat16)

    def kernel(*refs):
        it = iter(refs)
        head_ref = next(it)                    # SMEM (1,1) i32
        x_ref = next(it)                       # VMEM (M, S) bf16
        bias_ref = next(it) if use_bias else None  # VMEM (NBK*M, BT*B) f32
        lnw_ref, lnb_ref = next(it), next(it)  # VMEM (3L+1, S) bf16
        biases = {n: next(it) for n in ("qkv_b", "o_b", "cq_b", "co_b",
                                        "mlp0_b", "mlp1_b")}
        wref, sref = {}, {}
        for name in ("qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w",
                     "teT"):
            wref[name] = next(it)              # HBM qs or dense plane
            if qmap[name]:
                sref[name] = next(it)          # HBM f32 scales
        kvk_ref, kvv_ref = next(it), next(it)  # HBM (L, Tc, S) aliased
        xk_ref, xv_ref = next(it), next(it)    # HBM (L, Ta, S)
        logits_ref = next(it)                  # out VMEM (M, Vp) f32
        okvk_ref, okvv_ref = next(it), next(it)  # out HBM aliased
        # okvk/okvv alias kvk/kvv (same HBM buffer on hardware); reads go
        # through the input refs, the new-row DMAs through the output refs
        # so interpret mode (separate copies) stays correct too.
        pbuf, psbuf, psem, pssem = {}, {}, {}, {}
        for pname, (used, _k, _tn) in pools.items():
            if not used:
                continue
            pbuf[pname] = next(it)
            if not pname.endswith("D"):
                psbuf[pname] = next(it)
        abuf = next(it)                        # (M, 4S) f32 matvec outputs
        kbuf, vbuf = next(it), next(it)        # (Tcp, S) self-cache tiles
        ckbuf, cvbuf = next(it), next(it)      # (2, Tap, S) cross double-buf
        for pname, (used, _k, _tn) in pools.items():
            if not used:
                continue
            psem[pname] = next(it)
            if not pname.endswith("D"):
                pssem[pname] = next(it)
        ksem, csem, wrsem = next(it), next(it), next(it)

        head = head_ref[0, 0]

        # ---- static tile schedules (program order == consume order) ----
        tiles = {"A": [], "B": []}
        pool_count = {p: 0 for p in pools}

        def add_stage(stream, field, il, nk, n_out):
            w = wref[field] if field == "teT" else wref[field].at[il]
            s = None
            if qmap[field]:
                s = sref[field] if field == "teT" else sref[field].at[il]
            pool = stream + {"int8": "Q", "int4": "Q4", None: "D"}[qmap[field]]
            tn = TN[field]
            for t in range(n_out // tn):
                slot = pool_count[pool] % NB
                pool_count[pool] += 1
                tiles[stream].append((field, w, s, t * tn, tn, nk, pool, slot))

        for il in range(lo, hi):
            for name, km, nm, stream in _STAGES:
                add_stage(stream, name, il, km * S, nm * S)
        if with_logits:
            add_stage("A", "teT", None, S, Vp)

        def tile_dmas(stream, i):
            field, w, s, off, tn, nk, pool, slot = tiles[stream][i]
            kr = nk // 2 if qmap[field] == "int4" else nk  # packed rows
            out = [pltpu.make_async_copy(
                w.at[:, pl.ds(off, tn)],
                pbuf[pool].at[slot, pl.ds(0, kr), pl.ds(0, tn)],
                psem[pool].at[slot])]
            if s is not None:
                nsp = -(-(nk // QK) // 8) * 8    # 8-padded scale rows
                out.append(pltpu.make_async_copy(
                    s.at[:, pl.ds(off, tn)],
                    psbuf[pool].at[slot, pl.ds(0, nsp), pl.ds(0, tn)],
                    pssem[pool].at[slot]))
            return out

        st = {"A_started": 0, "A_next": 0, "B_started": 0, "B_next": 0}

        def ensure(stream, n):
            while st[stream + "_started"] < min(n, len(tiles[stream])):
                for d in tile_dmas(stream, st[stream + "_started"]):
                    d.start()
                st[stream + "_started"] += 1

        def consume(stream, x16, out_ref, n_out, tn):
            """out_ref[:, :n_out] = x16 @ W over the next n_out//tn tiles."""
            for t in range(n_out // tn):
                i = st[stream + "_next"]
                st[stream + "_next"] += 1
                ensure(stream, i + 1 + LOOKAHEAD)
                for d in tile_dmas(stream, i):
                    d.wait()
                field, _w, _s, _off, _tn, nk, pool, slot = tiles[stream][i]
                if qmap[field] == "int4":
                    # split-half nibbles: lo = rows [0, nk/2), hi = rows
                    # [nk/2, nk); both dequantized at f32, consumed by TWO
                    # dots against the matching contiguous activation
                    # halves. Bitwise i32 unpack: an arithmetic variant
                    # (floor(q/16) etc.) measured 349 vs 297 us/token -
                    # Mosaic's f32 floor chain costs more than shift/mask.
                    # A zero-point fold (unsigned nibbles, -8 moved into a
                    # per-32-block correction dot) was also tried and
                    # rejected: beam A/B null, and the big-minus-big
                    # cancellation amplifies bf16 rounding ~2x
                    # (docs/ROADMAP.md).
                    k2 = nk // 2
                    nb2 = k2 // QK
                    w32 = pbuf[pool][slot, pl.ds(0, k2),
                                     pl.ds(0, tn)].astype(jnp.int32)
                    nsp = -(-(nk // QK) // 8) * 8
                    sc = psbuf[pool][slot, pl.ds(0, nsp),
                                     pl.ds(0, tn)][:nk // QK].astype(
                                         jnp.float32)
                    lo = ((w32 & 0x0F) - 8).astype(jnp.float32)
                    hi = ((w32 >> 4) - 8).astype(jnp.float32)
                    sc2 = sc.reshape(2, nb2, 1, tn)      # sublane split, no
                    wlo = ((lo.reshape(nb2, QK, tn)      # gather lowering
                            * sc2[0]).reshape(k2, tn).astype(jnp.bfloat16))
                    whi = ((hi.reshape(nb2, QK, tn)
                            * sc2[1]).reshape(k2, tn).astype(jnp.bfloat16))
                    out_ref[:, pl.ds(t * tn, tn)] = (
                        jnp.dot(x16[:, :k2], wlo,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(x16[:, k2:], whi,
                                  preferred_element_type=jnp.float32))
                    continue
                if qmap[field]:
                    q = pbuf[pool][slot, pl.ds(0, nk),
                                   pl.ds(0, tn)].astype(jnp.float32)
                    nsp = -(-(nk // QK) // 8) * 8
                    sc = psbuf[pool][slot, pl.ds(0, nsp),
                                     pl.ds(0, tn)][:nk // QK]
                    w16 = ((q.reshape(nk // QK, QK, tn) * sc[:, None, :])
                           .reshape(nk, tn).astype(jnp.bfloat16))
                else:
                    w16 = pbuf[pool][slot, pl.ds(0, nk), pl.ds(0, tn)]
                out_ref[:, pl.ds(t * tn, tn)] = jnp.dot(
                    x16, w16, preferred_element_type=jnp.float32)

        def cross_dma(il, slot):
            return (pltpu.make_async_copy(xk_ref.at[il], ckbuf.at[slot],
                                          csem.at[2 * slot]),
                    pltpu.make_async_copy(xv_ref.at[il], cvbuf.at[slot],
                                          csem.at[2 * slot + 1]))

        if per_row_cross:
            # (B, TAC)-row cross chunks stream in (il, c) order through the
            # 2-slot double buffer; chunk g+1 is in flight while g computes
            cross_sched = [(il_, c_) for il_ in range(lo, hi)
                           for c_ in range(NCC)]
            cross_state = {"started": 0, "pending": {}}

            def cross_chunk_dmas(il_, c_, slot):
                out = []
                for bb in range(B):
                    out.append(pltpu.make_async_copy(
                        xk_ref.at[il_, bb, pl.ds(c_ * TAC, TAC), :],
                        ckbuf.at[slot, pl.ds(bb * TAC, TAC), :],
                        csem.at[2 * slot]))
                    out.append(pltpu.make_async_copy(
                        xv_ref.at[il_, bb, pl.ds(c_ * TAC, TAC), :],
                        cvbuf.at[slot, pl.ds(bb * TAC, TAC), :],
                        csem.at[2 * slot + 1]))
                return out

            def cross_ensure(n):
                while cross_state["started"] < min(n, len(cross_sched)):
                    g = cross_state["started"]
                    il_, c_ = cross_sched[g]
                    dmas = cross_chunk_dmas(il_, c_, g % 2)
                    for d in dmas:
                        d.start()
                    cross_state["pending"][g] = dmas
                    cross_state["started"] += 1

            def cross_wait(g):
                cross_ensure(g + 2)
                for d in cross_state["pending"].pop(g):
                    d.wait()

            cross_ensure(2)
        else:
            for d in cross_dma(lo, lo % 2):
                d.start()
        ensure("A", 1 + LOOKAHEAD)

        if B > 1 and Tcp > Tc:
            # BT-pad rows are never DMA'd: zero them once so the PV dot's
            # 0-weighted garbage can't be NaN (0 * NaN = NaN)
            kbuf[pl.ds(Tc * B, (Tcp - Tc) * B), :] = jnp.zeros(
                ((Tcp - Tc) * B, S), jnp.bfloat16)
            vbuf[pl.ds(Tc * B, (Tcp - Tc) * B), :] = jnp.zeros(
                ((Tcp - Tc) * B, S), jnp.bfloat16)

        x32 = x_ref[:].astype(jnp.float32)     # (M, S) residual stream

        for il in range(lo, hi):               # static unroll
            slot, nslot = il % 2, (il + 1) % 2

            # self-cache read: overlaps the qkv matvec below. Beam/batch
            # mode reads the whole row-flat time-major (Tc*B, S) slab in
            # one copy (attend_beams layout note).
            if B == 1:
                rks = [pltpu.make_async_copy(kvk_ref.at[il],
                                             kbuf.at[pl.ds(0, Tc), :],
                                             ksem.at[0])]
                rvs = [pltpu.make_async_copy(kvv_ref.at[il],
                                             vbuf.at[pl.ds(0, Tc), :],
                                             ksem.at[1])]
            else:
                rks = [pltpu.make_async_copy(
                    kvk_ref.at[il], kbuf.at[pl.ds(0, Tc * B), :],
                    ksem.at[0])]
                rvs = [pltpu.make_async_copy(
                    kvv_ref.at[il], vbuf.at[pl.ds(0, Tc * B), :],
                    ksem.at[1])]
            for d in rks + rvs:
                d.start()

            # ---- self-attention ----
            h16 = _ln_rows(x32, lnw_ref[3 * il], lnb_ref[3 * il],
                           eps).astype(jnp.bfloat16)
            consume("A", h16, abuf, 3 * S, TN["qkv_w"])
            qkv = (abuf[:, pl.ds(0, 3 * S)].astype(jnp.bfloat16)
                   + biases["qkv_b"][il][None, :])
            q = qkv[:, :S] * jnp.bfloat16(kqscale)
            k = qkv[:, S:2 * S] * jnp.bfloat16(kqscale)
            v = qkv[:, 2 * S:]

            for d in rks + rvs:
                d.wait()
            # Mosaic requires sublane-aligned stores and DMA slices: patch
            # row `head` via an aligned 8-row read-modify-write in VMEM,
            # then write that same (already-consistent) 8-row block back to
            # the HBM cache - 20 KB/layer instead of a cache copy
            blk0 = pl.multiple_of((head // 8) * 8, 8)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (8, S), 0) == head - blk0
            if B == 1 and R == 1:
                kbuf[pl.ds(blk0, 8), :] = jnp.where(
                    rsel, k[0:1, :], kbuf[pl.ds(blk0, 8), :])
                vbuf[pl.ds(blk0, 8), :] = jnp.where(
                    rsel, v[0:1, :], vbuf[pl.ds(blk0, 8), :])
                wk = [pltpu.make_async_copy(kbuf.at[pl.ds(blk0, 8), :],
                                            okvk_ref.at[il, pl.ds(blk0, 8), :],
                                            wrsem.at[0, 0])]
                wv = [pltpu.make_async_copy(vbuf.at[pl.ds(blk0, 8), :],
                                            okvv_ref.at[il, pl.ds(blk0, 8), :],
                                            wrsem.at[1, 0])]
            elif B == 1:
                # verify rows: positions head..head+R-1 always fit a
                # 16-row aligned window (R <= 8); one RMW + one
                # write-back, same pattern as the beam branch below
                wstart = pl.multiple_of(jnp.minimum(
                    (head // 8) * 8, Tc - 16), 8)
                off = head - wstart                      # in [0, 16 - R]
                rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, S), 0)
                kw = kbuf[pl.ds(wstart, 16), :]
                vw = vbuf[pl.ds(wstart, 16), :]
                for r in range(R):
                    kw = jnp.where(rows16 == off + r, k[r:r + 1, :], kw)
                    vw = jnp.where(rows16 == off + r, v[r:r + 1, :], vw)
                kbuf[pl.ds(wstart, 16), :] = kw
                vbuf[pl.ds(wstart, 16), :] = vw
                wk = [pltpu.make_async_copy(
                    kbuf.at[pl.ds(wstart, 16), :],
                    okvk_ref.at[il, pl.ds(wstart, 16), :],
                    wrsem.at[0, 0])]
                wv = [pltpu.make_async_copy(
                    vbuf.at[pl.ds(wstart, 16), :],
                    okvv_ref.at[il, pl.ds(wstart, 16), :],
                    wrsem.at[1, 0])]
            else:
                # row-flat time-major: every slot's new K/V row lives in
                # B CONSECUTIVE rows starting at head*B — one aligned
                # 16-row RMW window covers any B <= 8 span, one
                # write-back DMA replaces B per-beam patches. Window
                # start clamps so it never runs past the Tc*B slab.
                wstart = pl.multiple_of(jnp.minimum(
                    (head * B // 8) * 8, Tc * B - 16), 8)
                off = head * B - wstart                  # in [0, 16)
                rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, S), 0)
                kw = kbuf[pl.ds(wstart, 16), :]
                vw = vbuf[pl.ds(wstart, 16), :]
                for bb in range(B):
                    kw = jnp.where(rows16 == off + bb, k[bb:bb + 1, :], kw)
                    vw = jnp.where(rows16 == off + bb, v[bb:bb + 1, :], vw)
                kbuf[pl.ds(wstart, 16), :] = kw
                vbuf[pl.ds(wstart, 16), :] = vw
                wk = [pltpu.make_async_copy(
                    kbuf.at[pl.ds(wstart, 16), :],
                    okvk_ref.at[il, pl.ds(wstart, 16), :],
                    wrsem.at[0, 0])]
                wv = [pltpu.make_async_copy(
                    vbuf.at[pl.ds(wstart, 16), :],
                    okvv_ref.at[il, pl.ds(wstart, 16), :],
                    wrsem.at[1, 0])]
            for d in wk + wv:
                d.start()

            if B == 1:
                a16 = attend(q, kbuf[:], vbuf[:], head + 1, 1.0,
                             causal=R > 1)
            else:
                # blocked online softmax over valid time blocks only
                nblk = (head + BT) // BT     # ceil((head+1)/BT)
                a16 = attend_beams(q, kbuf, vbuf, nblk, 1.0, bias_ref)
            consume("A", a16, abuf, S, TN["o_w"])
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + biases["o_b"][il][None, :])).astype(jnp.float32)

            # ---- cross-attention ----
            if not per_row_cross and il + 1 < hi:  # prefetch next layer's
                for d in cross_dma(il + 1, nslot):
                    d.start()

            h16 = _ln_rows(x32, lnw_ref[3 * il + 1], lnb_ref[3 * il + 1],
                           eps).astype(jnp.bfloat16)
            consume("A", h16, abuf, S, TN["cq_w"])
            cq = (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                  + biases["cq_b"][il][None, :])

            if per_row_cross:
                # flash-style online softmax over (B, TAC)-row chunks;
                # running (m, l, o^T) per head stay register-resident —
                # ~(M, S) f32 of live state total. PV runs TRANSPOSED
                # (long dim as the contraction; see attend_beams note) —
                # the first-cut row-major form measured 1.93 ms/token vs
                # XLA's 1.52 at B=8, entirely cross-attend MXU waste.
                BIG_NEG = jnp.float32(-1e30)   # not -inf: m starts here and
                                               # exp(s - m) must stay finite
                mrun = [jnp.full((M, 1), BIG_NEG) for _ in range(H)]
                lrun = [jnp.zeros((M, 1), jnp.float32) for _ in range(H)]
                orun = [jnp.zeros((dh, M) if attend_pv_t else (M, dh),
                                  jnp.float32) for _ in range(H)]
                rowb = jnp.minimum(jax.lax.broadcasted_iota(
                    jnp.int32, (M, B * TAC), 0), B - 1)  # pad rows -> B-1
                col = jax.lax.broadcasted_iota(jnp.int32, (M, B * TAC), 1)
                t_in = col & (TAC - 1)                   # TAC power of 2
                b_of = col >> (TAC.bit_length() - 1)     # col // TAC
                for c in range(NCC):
                    g = (il - lo) * NCC + c
                    cross_wait(g)
                    cslot = g % 2
                    valid = (b_of == rowb) & (c * TAC + t_in < ta_valid)
                    for h in range(H):
                        hs = slice(h * dh, (h + 1) * dh)
                        s = jax.lax.dot_general(
                            cq[:, hs], ckbuf[cslot][:, hs],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * kqscale
                        s = jnp.where(valid, s, BIG_NEG)
                        m_new = jnp.maximum(mrun[h],
                                            jnp.max(s, axis=1, keepdims=True))
                        alpha = jnp.exp(mrun[h] - m_new)
                        e = jnp.exp(s - m_new).astype(jnp.bfloat16)
                        lrun[h] = lrun[h] * alpha + jnp.sum(
                            e.astype(jnp.float32), axis=1, keepdims=True)
                        if attend_pv_t:
                            orun[h] = (orun[h] * jnp.transpose(alpha)
                                       + jax.lax.dot_general(
                                           cvbuf[cslot][:, hs], e,
                                           (((0,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32))
                        else:
                            orun[h] = (orun[h] * alpha + jnp.dot(
                                e, cvbuf[cslot][:, hs],
                                preferred_element_type=jnp.float32))
                        mrun[h] = m_new
                if attend_pv_t:
                    ca16 = jnp.transpose(jnp.concatenate(
                        [orun[h] / jnp.transpose(lrun[h]) for h in range(H)],
                        axis=0)).astype(jnp.bfloat16)
                else:
                    ca16 = jnp.concatenate(
                        [orun[h] / lrun[h] for h in range(H)],
                        axis=1).astype(jnp.bfloat16)
            else:
                for d in cross_dma(il, slot):
                    d.wait()
                ca16 = attend(cq, ckbuf[slot], cvbuf[slot], ta_valid,
                              kqscale)
            consume("A", ca16, abuf, S, TN["co_w"])
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + biases["co_b"][il][None, :])).astype(jnp.float32)

            # ---- MLP ----
            h16 = _ln_rows(x32, lnw_ref[3 * il + 2], lnb_ref[3 * il + 2],
                           eps).astype(jnp.bfloat16)
            ensure("B", st["B_next"] + 1 + LOOKAHEAD)  # mlp1 tiles in flight
            consume("A", h16, abuf, 4 * S, TN["mlp0_w"])
            g = jax.nn.gelu(
                (abuf[:, pl.ds(0, 4 * S)].astype(jnp.bfloat16)
                 + biases["mlp0_b"][il][None, :]).astype(jnp.float32),
                approximate=True).astype(jnp.bfloat16)
            consume("B", g, abuf, S, TN["mlp1_w"])
            x32 = (x32.astype(jnp.bfloat16)
                   + (abuf[:, pl.ds(0, S)].astype(jnp.bfloat16)
                      + biases["mlp1_b"][il][None, :])).astype(jnp.float32)

            for d in wk + wv:                  # kbuf/vbuf reused next layer
                d.wait()

        if with_logits:
            # ---- final LN + vocab projection ----
            xf = _ln_rows(x32, lnw_ref[3 * L], lnb_ref[3 * L],
                          eps).astype(jnp.bfloat16)
            consume("A", xf, logits_ref, Vp, TN["teT"])
        else:
            # grouped mode: hand the residual stream to the next group
            logits_ref[:, :] = x32.astype(jnp.bfloat16)

    return kernel, dims


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "tile_boost",
                                    "attend_pv_t", "mesh"),
                   donate_argnames=("kv_k", "kv_v"))
def mega_decode_step(cfg, mp: MegaParams, x0: jnp.ndarray,
                     kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                     kv_head: jnp.ndarray,
                     xk: jnp.ndarray, xv: jnp.ndarray,
                     interpret: bool = False, tile_boost: bool = True,
                     attend_pv_t: bool = False, mesh=None):
    """One decode step for R = x0.shape[0] consecutive tokens (B=1).

    `mesh`: when decoding inside a GSPMD-partitioned program, wrap the
    kernel in a replicated shard_map (parallel/mesh.py) so the opaque
    pallas_call stays legal — every device computes the identical step
    (it would otherwise idle while one device decodes).

    x0: (R, S) bf16 token + positional embedding rows for positions
    kv_head..kv_head+R-1 (R == 1: the plain greedy step; R in [2, 8]:
    the speculative VERIFY pass — one weight stream scores all R
    positions, with per-row causal masking making each row's math
    identical to R sequential single-token calls).
    kv_k/kv_v: (L, Tc, S) bf16 natural-layout self-KV cache (donated).
    xk/xv: (L, Ta, S) bf16 natural-layout cross KV (xk pre-scaled d**-0.25).
    Returns (logits (R, V) f32, kv_k, kv_v) with the R new K/V rows
    written at rows kv_head..kv_head+R-1 of each layer's cache.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if mesh is not None:
        from ..parallel.mesh import replicated_on_mesh

        def _step(mp_, x0_, kk_, kv_, head_, xk_, xv_):
            return mega_decode_step(cfg, mp_, x0_, kk_, kv_, head_, xk_, xv_,
                                    interpret=interpret,
                                    tile_boost=tile_boost,
                                    attend_pv_t=attend_pv_t, mesh=None)
        return replicated_on_mesh(_step, mesh)(
            mp, x0, kv_k, kv_v, kv_head, xk, xv)

    R = x0.shape[0]
    S = cfg.n_text_state
    L = cfg.n_text_layer
    Tc = kv_k.shape[1]
    Ta = xk.shape[1]
    V = cfg.n_vocab
    Vp = mp.vp
    eps = float(cfg.eps)
    wfields = ["qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w", "teT"]
    def _kind(w):
        if isinstance(w, Q4Planes):
            return "int4"
        return "int8" if isinstance(w, QPlanes) else None
    qmap = {n: _kind(getattr(mp, n)) for n in wfields}

    # Mosaic DMAs need 16-aligned slabs; the pad is loop-invariant, so XLA
    # hoists it out of any surrounding decode loop (one copy per window)
    Tap = -(-Ta // 16) * 16
    if Tap != Ta:
        xk = jnp.pad(xk, ((0, 0), (0, Tap - Ta), (0, 0)))
        xv = jnp.pad(xv, ((0, 0), (0, Tap - Ta), (0, 0)))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    # weights/caches must stay in HBM: pl.ANY lets Mosaic place small
    # operands (the kv cache) in VMEM, where dynamic single-row writes
    # hit sublane-alignment limits; DMA row writes to HBM are unrestricted
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    bf = jnp.bfloat16

    def call_group(x, kv_k, kv_v, layer_range, with_logits):
        kernel, dims = _make_kernel(cfg, Tap, Tc, Vp, eps, qmap, ta_valid=Ta,
                                    tile_boost=tile_boost,
                                    attend_pv_t=attend_pv_t,
                                    layer_range=layer_range,
                                    with_logits=with_logits, n_tokens=R)
        M = dims["M"]
        NB = dims["NB"]
        head2d = jnp.reshape(kv_head.astype(jnp.int32), (1, 1))

        operands = [head2d, x, mp.lnw, mp.lnb,
                    mp.qkv_b, mp.o_b, mp.cq_b, mp.co_b, mp.mlp0_b, mp.mlp1_b]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 9
        for name in wfields:
            w = getattr(mp, name)
            if qmap[name]:
                operands += [w.qs, w.sc]
                in_specs += [hbm(), hbm()]
            else:
                operands.append(w)
                in_specs.append(hbm())
        kv_idx = len(operands)
        operands += [kv_k, kv_v, xk, xv]
        in_specs += [hbm()] * 4

        scratch = []
        for pname, (used, K, TNmax) in dims["pools"].items():
            if not used:
                continue
            if pname.endswith("Q4"):
                scratch.append(pltpu.VMEM((NB, K // 2, TNmax), jnp.uint8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), bf))
            elif pname.endswith("Q"):
                scratch.append(pltpu.VMEM((NB, K, TNmax), jnp.int8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), jnp.float32))
            else:
                scratch.append(pltpu.VMEM((NB, K, TNmax), bf))
        scratch += [
            pltpu.VMEM((M, 4 * S), jnp.float32),             # abuf
            pltpu.VMEM((dims["Tcp"], S), bf),                # kbuf
            pltpu.VMEM((dims["Tcp"], S), bf),                # vbuf
            pltpu.VMEM((2, dims["Tap"], S), bf),             # ckbuf
            pltpu.VMEM((2, dims["Tap"], S), bf),             # cvbuf
        ]
        for pname, (used, _k, _tn) in dims["pools"].items():
            if not used:
                continue
            scratch.append(pltpu.SemaphoreType.DMA((NB,)))
            if not pname.endswith("D"):
                scratch.append(pltpu.SemaphoreType.DMA((NB,)))
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((4,)),                   # csem
            pltpu.SemaphoreType.DMA((2, 1)),                 # wrsem
        ]

        out0 = (jax.ShapeDtypeStruct((M, Vp), jnp.float32) if with_logits
                else jax.ShapeDtypeStruct((M, S), bf))
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(vmem(), hbm(), hbm()),
            out_shape=(
                out0,
                jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
                jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
            ),
            input_output_aliases={kv_idx: 1, kv_idx + 1: 2},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # scratch exceeds the 16 MB default scoped-vmem cap (cross-KV
                # double buffers dominate at ~15 MB); v5e has 128 MB VMEM
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(*operands)

    out = jnp.zeros((8, S), jnp.bfloat16).at[0:R].set(x0.astype(jnp.bfloat16))
    if L <= MEGA_GROUP:
        out, kv_k, kv_v = call_group(out, kv_k, kv_v, None, True)
    else:
        # grouped mode (n_text_layer > 8): chain fully-unrolled <=8-layer
        # kernels; the self-KV cache aliases straight through each call and
        # the bf16 residual handoff is lossless (kernel docstring)
        for lo in range(0, L, MEGA_GROUP):
            hi = min(lo + MEGA_GROUP, L)
            out, kv_k, kv_v = call_group(out, kv_k, kv_v, (lo, hi), hi == L)
    return out[0:R, :V], kv_k, kv_v


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "tile_boost",
                                    "attend_pv_t", "self_blocked", "mesh"),
                   donate_argnames=("kv_k", "kv_v"))
def mega_decode_step_beam(cfg, mp: MegaParams, x0: jnp.ndarray,
                          kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                          kv_head: jnp.ndarray,
                          xk: jnp.ndarray, xv: jnp.ndarray,
                          attn_bias: jnp.ndarray | None = None,
                          interpret: bool = False, tile_boost: bool = True,
                          attend_pv_t: bool = False,
                          self_blocked: bool = True, mesh=None):
    """One beam-search decode step for B <= 8 beams in ONE kernel launch.

    The beams ride the M=8 sublane rows through a SINGLE weight stream
    (same per-token weight traffic as greedy — the amortization the XLA
    batched step can't get) and share the cross-KV; each beam attends its
    own self-cache.

    Beam reorder between steps is NO physical movement at all: pass
    attn_bias=beam_attn_bias(origin, head, Tc) built from an origin
    table (see beam_attn_bias) and the new K/V rows keep landing at
    slot b while lineage is pure masking. This removes ~2*L*B*Tc*S
    bytes/step of gather traffic (~92 MB at turbo B=5), the dominant
    beam-step cost. (Physical-reorder semantics = gather on axis 2 +
    the identity-origin bias.)

    x0: (B, S) bf16 per-beam token+pos embedding rows.
    kv_k/kv_v: (L, Tc*B, S) ROW-FLAT TIME-MAJOR per-beam self-KV
    (donated): row t*B + b holds beam slot b's K/V at position t.
    Flat (not (L, Tc, B, S)) so the while-loop carry aliases straight
    into the kernel with no per-step reshape between donation and the
    pallas in/out aliasing.
    xk/xv: (L, Ta, S) shared cross KV (xk pre-scaled d**-0.25).
    attn_bias: (ceil(Tc/BT)*8, BT*B) f32 from beam_attn_bias; REQUIRED
    for B > 1.
    Returns (logits (B, V) f32, kv_k, kv_v).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if mesh is not None:
        from ..parallel.mesh import replicated_on_mesh

        def _step(mp_, x0_, kk_, kv_, head_, xk_, xv_, bias_):
            return mega_decode_step_beam(
                cfg, mp_, x0_, kk_, kv_, head_, xk_, xv_, attn_bias=bias_,
                interpret=interpret, tile_boost=tile_boost,
                attend_pv_t=attend_pv_t, self_blocked=self_blocked,
                mesh=None)
        return replicated_on_mesh(_step, mesh)(
            mp, x0, kv_k, kv_v, kv_head, xk, xv, attn_bias)

    S = cfg.n_text_state
    Bm = x0.shape[0]
    if Bm == 1:   # degenerate beam: the greedy kernel expects (L, Tc, S);
        # a single slot has trivial lineage, so attn_bias is ignored
        logits, kv_k1, kv_v1 = mega_decode_step(
            cfg, mp, x0, kv_k, kv_v, kv_head, xk, xv,
            interpret=interpret, tile_boost=tile_boost)
        return logits, kv_k1, kv_v1
    assert attn_bias is not None, "beam mode requires beam_attn_bias"
    assert kv_k.shape[1] % Bm == 0, kv_k.shape
    Tc = kv_k.shape[1] // Bm
    Ta = xk.shape[1]
    V = cfg.n_vocab
    Vp = mp.vp
    eps = float(cfg.eps)
    wfields = ["qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w", "teT"]

    def _kind(w):
        if isinstance(w, Q4Planes):
            return "int4"
        return "int8" if isinstance(w, QPlanes) else None
    qmap = {n: _kind(getattr(mp, n)) for n in wfields}

    Tap = -(-Ta // 16) * 16
    if Tap != Ta:
        xk = jnp.pad(xk, ((0, 0), (0, Tap - Ta), (0, 0)))
        xv = jnp.pad(xv, ((0, 0), (0, Tap - Ta), (0, 0)))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    bf = jnp.bfloat16
    L = cfg.n_text_layer

    def call_group(x, kv_k, kv_v, layer_range, with_logits):
        kernel, dims = _make_kernel(cfg, Tap, Tc, Vp, eps, qmap, ta_valid=Ta,
                                    tile_boost=tile_boost, n_beams=Bm,
                                    use_bias=True, attend_pv_t=attend_pv_t,
                                    self_blocked=self_blocked,
                                    layer_range=layer_range,
                                    with_logits=with_logits)
        M = dims["M"]
        NB = dims["NB"]
        head2d = jnp.reshape(kv_head.astype(jnp.int32), (1, 1))

        operands = [head2d, x, mp.lnw, mp.lnb,
                    mp.qkv_b, mp.o_b, mp.cq_b, mp.co_b, mp.mlp0_b, mp.mlp1_b]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 9
        assert attn_bias.shape == (dims["Tcp"] // BT * M, BT * Bm), \
            attn_bias.shape
        operands.insert(2, attn_bias.astype(jnp.float32))
        in_specs.insert(2, vmem())
        for name in wfields:
            w = getattr(mp, name)
            if qmap[name]:
                operands += [w.qs, w.sc]
                in_specs += [hbm(), hbm()]
            else:
                operands.append(w)
                in_specs.append(hbm())
        kv_idx = len(operands)
        operands += [kv_k, kv_v, xk, xv]
        in_specs += [hbm()] * 4

        scratch = []
        for pname, (used, K, TNmax) in dims["pools"].items():
            if not used:
                continue
            if pname.endswith("Q4"):
                scratch.append(pltpu.VMEM((NB, K // 2, TNmax), jnp.uint8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), bf))
            elif pname.endswith("Q"):
                scratch.append(pltpu.VMEM((NB, K, TNmax), jnp.int8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), jnp.float32))
            else:
                scratch.append(pltpu.VMEM((NB, K, TNmax), bf))
        scratch += [
            pltpu.VMEM((M, 4 * S), jnp.float32),             # abuf
            pltpu.VMEM((dims["Tcp"] * Bm, S), bf),           # kbuf (row-flat)
            pltpu.VMEM((dims["Tcp"] * Bm, S), bf),           # vbuf
            pltpu.VMEM((2, dims["Tap"], S), bf),             # ckbuf (shared)
            pltpu.VMEM((2, dims["Tap"], S), bf),             # cvbuf
        ]
        for pname, (used, _k, _tn) in dims["pools"].items():
            if not used:
                continue
            scratch.append(pltpu.SemaphoreType.DMA((NB,)))
            if not pname.endswith("D"):
                scratch.append(pltpu.SemaphoreType.DMA((NB,)))
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((4,)),                   # csem
            pltpu.SemaphoreType.DMA((2, 1)),                 # wrsem
        ]

        out0 = (jax.ShapeDtypeStruct((M, Vp), jnp.float32) if with_logits
                else jax.ShapeDtypeStruct((M, S), bf))
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(vmem(), hbm(), hbm()),
            out_shape=(
                out0,
                jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
                jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
            ),
            input_output_aliases={kv_idx: 1, kv_idx + 1: 2},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # per-beam self-KV tiles add B * Tcp * S * 2 * 2 bytes (~12 MB
                # at turbo B=5) on top of the ~15 MB cross double buffers
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(*operands)

    out = jnp.zeros((8, S), jnp.bfloat16).at[0:Bm].set(x0.astype(jnp.bfloat16))
    if L <= MEGA_GROUP:
        out, kv_k, kv_v = call_group(out, kv_k, kv_v, None, True)
    else:
        for lo in range(0, L, MEGA_GROUP):   # grouped mode (deep decoders)
            hi = min(lo + MEGA_GROUP, L)
            out, kv_k, kv_v = call_group(out, kv_k, kv_v, (lo, hi), hi == L)
    return out[0:Bm, :V], kv_k, kv_v


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "tile_boost",
                                    "attend_pv_t", "tac"),
                   donate_argnames=("kv_k", "kv_v"))
def mega_decode_step_batch(cfg, mp: MegaParams, x0: jnp.ndarray,
                           kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                           kv_head: jnp.ndarray,
                           xk: jnp.ndarray, xv: jnp.ndarray,
                           interpret: bool = False,
                           tile_boost: bool = True,
                           attend_pv_t: bool = False, tac: int = 256):
    """One greedy decode step for B <= 8 INDEPENDENT streams in ONE
    kernel launch (the batched-serving analog of whisper_full_parallel,
    reference src/whisper.cpp:7801-7929 — but one weight stream feeds
    all B decoders instead of one graph launch per stream per token).

    Differences from the beam kernel: every row has its OWN cross-KV
    (different audio windows), so cross-attention runs BLOCKED — (B,
    128)-row time chunks through a double buffer with a flash-style
    online softmax (_make_kernel per_row_cross). Self-attention is the
    same blocked time-major path with the IDENTITY-origin bias (each
    stream owns its slot; no lineage).

    x0: (B, S) bf16 per-stream token+pos embedding rows.
    kv_k/kv_v: (L, Tc*B, S) ROW-FLAT TIME-MAJOR per-stream self-KV
    (donated; see mega_decode_step_beam).
    xk/xv: (L, B, Ta, S) PER-STREAM cross KV (xk pre-scaled d**-0.25).
    kv_head: scalar decode position (streams advance in lockstep).
    tac: cross chunk rows per stream. 256 pads whisper's Ta=1500 to 1536
    (+2.4% masked cross work); 512 padded to 2048, +33% wasted cross-KV
    DMA and dot work per stream per layer.
    Returns (logits (B, V) f32, kv_k, kv_v).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = cfg.n_text_state
    Bm = x0.shape[0]
    if Bm == 1:
        logits, kv_k1, kv_v1 = mega_decode_step(
            cfg, mp, x0, kv_k, kv_v, kv_head, xk[:, 0],
            xv[:, 0], interpret=interpret, tile_boost=tile_boost)
        return logits, kv_k1, kv_v1
    assert kv_k.shape[1] % Bm == 0, kv_k.shape
    Tc = kv_k.shape[1] // Bm
    Ta = xk.shape[2]
    V = cfg.n_vocab
    Vp = mp.vp
    eps = float(cfg.eps)
    wfields = ["qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w", "teT"]

    def _kind(w):
        if isinstance(w, Q4Planes):
            return "int4"
        return "int8" if isinstance(w, QPlanes) else None
    qmap = {n: _kind(getattr(mp, n)) for n in wfields}

    TAC = tac                                 # _make_kernel chunk rows
    Tap = -(-Ta // TAC) * TAC
    if Tap != Ta:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, Tap - Ta), (0, 0)))
        xv = jnp.pad(xv, ((0, 0), (0, 0), (0, Tap - Ta), (0, 0)))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    bf = jnp.bfloat16
    L = cfg.n_text_layer

    # identity origin: stream b owns cache slot b at every position
    origin_id = jnp.broadcast_to(
        jnp.arange(Bm, dtype=jnp.int32)[:, None], (Bm, Tc))

    def call_group(x, kv_k, kv_v, layer_range, with_logits):
        kernel, dims = _make_kernel(cfg, Tap, Tc, Vp, eps, qmap, ta_valid=Ta,
                                    tile_boost=tile_boost, n_beams=Bm,
                                    use_bias=True, per_row_cross=True,
                                    attend_pv_t=attend_pv_t, tac=TAC,
                                    layer_range=layer_range,
                                    with_logits=with_logits)
        M = dims["M"]
        NB = dims["NB"]
        assert dims["TAC"] == TAC
        head2d = jnp.reshape(kv_head.astype(jnp.int32), (1, 1))
        attn_bias = beam_attn_bias(origin_id, kv_head, Tc, M=M)

        operands = [head2d, x, attn_bias, mp.lnw, mp.lnb,
                    mp.qkv_b, mp.o_b, mp.cq_b, mp.co_b, mp.mlp0_b, mp.mlp1_b]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 10
        for name in wfields:
            w = getattr(mp, name)
            if qmap[name]:
                operands += [w.qs, w.sc]
                in_specs += [hbm(), hbm()]
            else:
                operands.append(w)
                in_specs.append(hbm())
        kv_idx = len(operands)
        operands += [kv_k, kv_v, xk, xv]
        in_specs += [hbm()] * 4

        scratch = []
        for pname, (used, K, TNmax) in dims["pools"].items():
            if not used:
                continue
            if pname.endswith("Q4"):
                scratch.append(pltpu.VMEM((NB, K // 2, TNmax), jnp.uint8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), bf))
            elif pname.endswith("Q"):
                scratch.append(pltpu.VMEM((NB, K, TNmax), jnp.int8))
                scratch.append(pltpu.VMEM((NB, -(-(K // QK) // 8) * 8, TNmax), jnp.float32))
            else:
                scratch.append(pltpu.VMEM((NB, K, TNmax), bf))
        scratch += [
            pltpu.VMEM((M, 4 * S), jnp.float32),             # abuf
            pltpu.VMEM((dims["Tcp"] * Bm, S), bf),           # kbuf (row-flat)
            pltpu.VMEM((dims["Tcp"] * Bm, S), bf),           # vbuf
            pltpu.VMEM((2, Bm * TAC, S), bf),                # ckbuf (chunks)
            pltpu.VMEM((2, Bm * TAC, S), bf),                # cvbuf
        ]
        for pname, (used, _k, _tn) in dims["pools"].items():
            if not used:
                continue
            scratch.append(pltpu.SemaphoreType.DMA((NB,)))
            if not pname.endswith("D"):
                scratch.append(pltpu.SemaphoreType.DMA((NB,)))
        scratch += [
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((4,)),                   # csem
            pltpu.SemaphoreType.DMA((2, 1)),                 # wrsem
        ]

        out0 = (jax.ShapeDtypeStruct((M, Vp), jnp.float32) if with_logits
                else jax.ShapeDtypeStruct((M, S), bf))
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=(vmem(), hbm(), hbm()),
            out_shape=(
                out0,
                jax.ShapeDtypeStruct(kv_k.shape, kv_k.dtype),
                jax.ShapeDtypeStruct(kv_v.shape, kv_v.dtype),
            ),
            input_output_aliases={kv_idx: 1, kv_idx + 1: 2},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # flat self-KV concat (~18 MB at turbo B=8) + chunked cross
                # double buffers (~10 MB) + weight pools
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(*operands)

    out = jnp.zeros((8, S), jnp.bfloat16).at[0:Bm].set(x0.astype(jnp.bfloat16))
    if L <= MEGA_GROUP:
        out, kv_k, kv_v = call_group(out, kv_k, kv_v, None, True)
    else:
        for lo in range(0, L, MEGA_GROUP):   # grouped mode (deep decoders)
            hi = min(lo + MEGA_GROUP, L)
            out, kv_k, kv_v = call_group(out, kv_k, kv_v, (lo, hi), hi == L)
    return out[0:Bm, :V], kv_k, kv_v
