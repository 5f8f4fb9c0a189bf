"""Parity: the single-kernel decoder vs decode_impl (interpret mode).

The megakernel must reproduce models/whisper/model.py::decode_impl at
M=1 (same rounding points: bf16 residual stream, f32 LN stats, f32 MXU
accumulation) on its natural-layout caches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.ops import decode_megakernel as MK

CFG = M.WhisperConfig(
    n_vocab=640, n_audio_ctx=48, n_audio_state=256, n_audio_head=4,
    n_audio_layer=2, n_text_ctx=64, n_text_state=256, n_text_head=4,
    n_text_layer=3, n_mels=80)


def _setup(seed=0, n_steps=5):
    rng = np.random.default_rng(seed)
    params = M.init_params(CFG, seed=seed, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    mp = MK.prepare_mega(CFG, dec)
    Ta = CFG.n_audio_ctx
    enc_out = jnp.asarray(
        rng.standard_normal((1, Ta, CFG.n_audio_state)), jnp.bfloat16)
    xk, xv = M.cross_kv(CFG, dec, enc_out)          # (L,1,H,Ta,dh) head-major
    toks = rng.integers(0, CFG.n_vocab, size=n_steps)
    return params, dec, mp, xk, xv, toks


def _hm_to_nat(a):
    """(L,1,H,T,dh) head-major -> (L,T,H*dh) natural."""
    L, B, H, T, dh = a.shape
    return jnp.transpose(a[:, 0], (0, 2, 1, 3)).reshape(L, T, H * dh)


def test_megakernel_matches_decode_impl():
    params, dec, mp, xk, xv, toks = _setup()
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx

    # reference path: head-major cache, decode_impl step by step
    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.bfloat16)
    ref_logits = []
    for i, t in enumerate(toks):
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec, jnp.asarray([[t]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        ref_logits.append(np.asarray(logits[0, 0]))

    # megakernel path: natural-layout caches
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    got_logits = []
    for i, t in enumerate(toks):
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step(
            CFG, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            interpret=True)
        got_logits.append(np.asarray(logits[0]))

    for i, (r, g) in enumerate(zip(ref_logits, got_logits)):
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-2,
                                   err_msg=f"step {i}")
        assert int(np.argmax(g)) == int(np.argmax(r)), f"argmax step {i}"


def test_megakernel_cache_rows_match():
    """The kernel's natural-layout cache rows equal decode_impl's head-major
    cache content (transposed), and untouched rows stay zero."""
    params, dec, mp, xk, xv, toks = _setup(seed=3, n_steps=3)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    H, dh = CFG.n_text_head, CFG.d_text_head

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.bfloat16)
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    for i, t in enumerate(toks):
        tok = jnp.asarray([[t]], jnp.int32)
        _, kv_k, kv_v, _ = M.decode_impl(CFG, dec, tok, kv_k, kv_v,
                                         jnp.int32(i), xk, xv)
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        _, nk, nv = MK.mega_decode_step(CFG, mp, x0, nk, nv, jnp.int32(i),
                                        xk_nat, xv_nat, interpret=True)

    n = len(toks)
    hm_k = np.asarray(jnp.transpose(kv_k[:, 0], (0, 2, 1, 3))
                      .reshape(L, Tc, S), np.float32)
    hm_v = np.asarray(jnp.transpose(kv_v[:, 0], (0, 2, 1, 3))
                      .reshape(L, Tc, S), np.float32)
    got_k, got_v = np.asarray(nk, np.float32), np.asarray(nv, np.float32)
    sk = np.abs(hm_k[:, :n]).max() + 1e-6
    np.testing.assert_allclose(got_k[:, :n] / sk, hm_k[:, :n] / sk, atol=2e-2)
    sv = np.abs(hm_v[:, :n]).max() + 1e-6
    np.testing.assert_allclose(got_v[:, :n] / sv, hm_v[:, :n] / sv, atol=2e-2)
    assert (got_k[:, n:] == 0).all() and (got_v[:, n:] == 0).all()


def test_decode_segment_mega_matches_plain():
    """The fused greedy segment loop must produce the same tokens/stats with
    the megakernel step as with the XLA decode_impl step."""
    from open_whisper_kit_tpu.decode import device_loop as DL
    from open_whisper_kit_tpu.decode import logit_rules as LR

    params, dec, mp, xk, xv, _ = _setup(seed=11)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    rc = LR.RuleConfig(n_vocab=CFG.n_vocab, token_eot=CFG.n_vocab - 2,
                       token_beg=CFG.n_vocab - 120)
    base_mask = jnp.zeros((CFG.n_vocab,), jnp.float32)
    init_mask = jnp.zeros((CFG.n_vocab,), jnp.float32)
    prompt = jnp.asarray([[5, 9, 0, 0]], jnp.int32)
    scalars = jnp.asarray([2, 3, 0, 3000], jnp.int32)  # t_real, nosp, seek
    n_max = 16

    plain = DL.decode_segment(CFG, rc, dec, prompt, xk, xv,
                              base_mask, init_mask, scalars, n_max=n_max)

    got = DL.decode_segment(CFG, rc, dec, prompt, xk, xv,
                            base_mask, init_mask, scalars, n_max=n_max,
                            mega=mp)

    assert int(got.n_tokens) == int(plain.n_tokens)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(plain.tokens))
    np.testing.assert_array_equal(np.asarray(got.tid), np.asarray(plain.tid))
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(plain.p),
                               atol=5e-3)
    assert bool(got.completed) == bool(plain.completed)
    assert bool(got.failed) == bool(plain.failed)
    assert int(got.seek_delta) == int(plain.seek_delta)


def _dequant_blocks(dec):
    """Replace QPlanes-equivalent int8 content: build a dec whose dense
    weights equal the dequantized int8 planes, for an XLA reference."""
    from open_whisper_kit_tpu.ops.decode_megakernel import _to_planes
    out = dict(dec)
    blocks = dict(dec["blocks"])
    for name in ("qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w"):
        w = blocks[name]
        pl_ = _to_planes(w)
        L, K, N = pl_.qs.shape
        wd = (pl_.qs.astype(jnp.float32).reshape(L, K // 32, 32, N)
              * pl_.sc[:, :, None, :]).reshape(L, K, N)
        blocks[name] = wd.astype(jnp.bfloat16)
    out["blocks"] = blocks
    return out


def test_megakernel_int8_all_matches_dequantized_reference():
    """quant='all' must equal decode_impl run on the dequantized weights."""
    params, dec, _, xk, xv, toks = _setup(seed=21, n_steps=3)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    mp = MK.prepare_mega(CFG, dec, quant="all")
    dec_ref = _dequant_blocks(dec)

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.bfloat16)
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    for i, t in enumerate(toks):
        ref, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec_ref, jnp.asarray([[t]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        got, nk, nv = MK.mega_decode_step(CFG, mp, x0, nk, nv, jnp.int32(i),
                                          xk_nat, xv_nat, interpret=True)
        # layer stacks share the dequantized weights; the projection
        # differs only by te quant error, bounded by q8_0 (~0.5% of |max|)
        r = np.asarray(ref[0, 0])
        g = np.asarray(got[0])
        sc = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / sc, r / sc, atol=3e-2,
                                   err_msg=f"step {i}")
        assert int(np.argmax(g)) == int(np.argmax(r)), f"argmax step {i}"


def _dequant_blocks4(dec):
    """Dense dec whose weights equal the dequantized int4 planes."""
    from open_whisper_kit_tpu.ops.decode_megakernel import _to_planes4
    out = dict(dec)
    blocks = dict(dec["blocks"])
    for name in ("qkv_w", "o_w", "cq_w", "co_w", "mlp0_w", "mlp1_w"):
        p4 = _to_planes4(blocks[name])
        L, K2, N = p4.qs.shape
        K = 2 * K2
        lo = (p4.qs & 0x0F).astype(jnp.float32) - 8.0
        hi = (p4.qs >> 4).astype(jnp.float32) - 8.0
        q = jnp.concatenate([lo, hi], axis=1)              # (L, K, N)
        wd = (q.reshape(L, K // 32, 32, N)
              * p4.sc[:, :, None, :]).reshape(L, K, N)
        blocks[name] = wd.astype(jnp.bfloat16)
    out["blocks"] = blocks
    return out


def test_megakernel_int4_matches_dequantized_reference():
    """quant='int4' (split-half nibble planes) must equal decode_impl run
    on the int4-dequantized weights; the vocab projection differs only by
    its own q4_0-level quant error."""
    params, dec, _, xk, xv, toks = _setup(seed=31, n_steps=3)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    mp = MK.prepare_mega(CFG, dec, quant="int4")
    assert isinstance(mp.qkv_w, MK.Q4Planes)
    dec_ref = _dequant_blocks4(dec)
    # the megakernel's vocab projection is the int4 planes of te.T; give
    # the reference the SAME dequantized projection (and embed from it on
    # both sides) so the comparison isolates kernel math, not te quant
    K2, Vp = mp.teT.qs.shape
    lo = (mp.teT.qs & 0x0F).astype(jnp.float32) - 8.0
    hi = (mp.teT.qs >> 4).astype(jnp.float32) - 8.0
    q4 = jnp.concatenate([lo, hi], axis=0)                 # (S, Vp)
    te4 = ((q4.reshape(-1, 32, Vp) * mp.teT.sc[:, None, :])
           .reshape(2 * K2, Vp)[:, :CFG.n_vocab].T).astype(jnp.bfloat16)
    dec_ref["te"] = te4

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.bfloat16)
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    for i, t in enumerate(toks):
        ref, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec_ref, jnp.asarray([[t]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        x0 = (te4[jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        got, nk, nv = MK.mega_decode_step(CFG, mp, x0, nk, nv, jnp.int32(i),
                                          xk_nat, xv_nat, interpret=True)
        r = np.asarray(ref[0, 0])
        g = np.asarray(got[0])
        sc = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / sc, r / sc, atol=3e-2,
                                   err_msg=f"step {i}")
        assert int(np.argmax(g)) == int(np.argmax(r)), f"argmax step {i}"


def test_megakernel_int8_logits_matches_decoder_int8_path():
    """quant='logits' uses the SAME planes as decoder_int8 scope='logits':
    logits must match the XLA qmatmul path closely."""
    from open_whisper_kit_tpu.models.whisper.model import \
        quantize_decoder_int8
    params, dec, _, xk, xv, toks = _setup(seed=31, n_steps=3)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    dec_q = quantize_decoder_int8(dec, scope="logits")
    mp = MK.prepare_mega(CFG, dec_q, quant="logits")
    assert isinstance(mp.teT, MK.QPlanes)
    assert not isinstance(mp.qkv_w, MK.QPlanes)

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.bfloat16)
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    for i, t in enumerate(toks):
        ref, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec_q, jnp.asarray([[t]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        got, nk, nv = MK.mega_decode_step(CFG, mp, x0, nk, nv, jnp.int32(i),
                                          xk_nat, xv_nat, interpret=True)
        r = np.asarray(ref[0, 0])
        g = np.asarray(got[0])
        sc = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / sc, r / sc, atol=2e-2,
                                   err_msg=f"step {i}")
        assert int(np.argmax(g)) == int(np.argmax(r)), f"argmax step {i}"


def test_mega_params_mode_policy():
    """WhisperContext.mega_params picks the measured-correct mode."""
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams
    from open_whisper_kit_tpu.models.whisper.model import \
        quantize_decoder_int8

    ctx = F.WhisperContext.from_preset("tiny.en", dtype=jnp.bfloat16)

    # auto + dense weights on CPU: off
    assert ctx.mega_params(FullParams()) is None
    # explicit False: off
    assert ctx.mega_params(FullParams(megakernel=False)) is None
    # True + dense: dense mode (CPU allowed for tests)
    mp = ctx.mega_params(FullParams(megakernel=True))
    assert mp is not None and not isinstance(mp.teT, MK.QPlanes)
    # "int8": all planes
    mp = ctx.mega_params(FullParams(megakernel="int8"))
    assert isinstance(mp.qkv_w, MK.QPlanes)
    assert isinstance(mp.teT, MK.QPlanes)

    # int8-logits context + True: logits mode with the SAME planes
    ctx2 = F.WhisperContext.from_preset("tiny.en", dtype=jnp.bfloat16)
    ctx2.params["decoder"] = quantize_decoder_int8(ctx2.params["decoder"])
    mp = ctx2.mega_params(FullParams(megakernel=True))
    assert isinstance(mp.teT, MK.QPlanes)
    assert not isinstance(mp.qkv_w, MK.QPlanes)
    assert mp.teT.qs is ctx2.params["decoder"]["te_logits"].qs

    # all-quant context (scope="all" planes): auto ON even with p=None
    ctx3 = F.WhisperContext.from_preset("tiny.en", dtype=jnp.bfloat16)
    ctx3.params["decoder"] = quantize_decoder_int8(
        ctx3.params["decoder"], scope="all")
    blocks = ctx3.params["decoder"]["blocks"]
    from open_whisper_kit_tpu.ops.quant_matmul import QuantLinear
    if all(isinstance(blocks[n], QuantLinear)
           for n in F.WhisperContext._MEGA_WEIGHTS):
        mp = ctx3.mega_params(FullParams(megakernel=True))
        assert isinstance(mp.qkv_w, MK.QPlanes)


def test_megakernel_beam_matches_decode_impl():
    """Beam mode: B beams in one kernel vs the batched decode_impl step,
    including a mid-sequence beam reorder (the kv gather between steps)."""
    B, n_steps = 3, 4
    rng = np.random.default_rng(11)
    params, dec, mp, xk, xv, _ = _setup(seed=11)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    H, dh = CFG.n_text_head, CFG.d_text_head

    xk_b = jnp.repeat(xk, B, axis=1)
    xv_b = jnp.repeat(xv, B, axis=1)
    toks = rng.integers(0, CFG.n_vocab, size=(n_steps, B))
    srcs = [None, np.array([1, 0, 1]), None, np.array([2, 2, 0])]

    # reference: batched head-major decode_impl with jnp.take reorders
    kv_k, kv_v = M.init_kv_cache(CFG, B, dtype=jnp.bfloat16)
    ref_logits = []
    for i in range(n_steps):
        if srcs[i] is not None:
            kv_k = jnp.take(kv_k, jnp.asarray(srcs[i]), axis=1)
            kv_v = jnp.take(kv_v, jnp.asarray(srcs[i]), axis=1)
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec, jnp.asarray(toks[i][:, None], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk_b, xv_b)
        ref_logits.append(np.asarray(logits[:, 0]))

    # beam megakernel: time-major per-beam caches, shared cross;
    # physical reorder = gather on the slot axis + identity-origin bias
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)   # flat time-major
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    origin_id = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))

    def reorder_flat(a, src):          # physical slot gather, flat layout
        return jnp.take(a.reshape(L, Tc, B, S), jnp.asarray(src),
                        axis=2).reshape(L, Tc * B, S)

    got_logits = []
    for i in range(n_steps):
        if srcs[i] is not None:
            nk = reorder_flat(nk, srcs[i])
            nv = reorder_flat(nv, srcs[i])
        x0 = (dec["te"][jnp.asarray(toks[i])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        bias = MK.beam_attn_bias(origin_id, jnp.int32(i), Tc)
        logits, nk, nv = MK.mega_decode_step_beam(
            CFG, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            attn_bias=bias, interpret=True)
        got_logits.append(np.asarray(logits))

    for i, (r, g) in enumerate(zip(ref_logits, got_logits)):
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-2,
                                   err_msg=f"step {i}")
        for b in range(B):
            assert int(np.argmax(g[b])) == int(np.argmax(r[b])), (i, b)

    # per-beam cache rows must match the head-major reference content
    nat_ref_k = np.asarray(jnp.transpose(kv_k, (0, 1, 3, 2, 4)).reshape(
        L, B, Tc, S))
    got_k = np.asarray(jnp.transpose(
        nk.reshape(L, Tc, B, S), (0, 2, 1, 3)))           # -> (L, B, Tc, S)
    np.testing.assert_allclose(
        got_k[:, :, :n_steps].astype(np.float32),
        nat_ref_k[:, :, :n_steps].astype(np.float32), atol=2e-2)
    assert np.all(got_k[:, :, n_steps:] == 0)


def test_megakernel_beam_origin_bias_matches_physical_reorder():
    """The origin-table path (attn_bias from beam_attn_bias, NO physical
    KV gather) must reproduce the physically-reordered beam kernel and
    the batched decode_impl reference, including multi-step lineage
    (reorders composing across steps) and a shared slot-0 prompt row."""
    B, n_steps = 3, 5
    rng = np.random.default_rng(23)
    params, dec, mp, xk, xv, _ = _setup(seed=23)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx

    xk_b = jnp.repeat(xk, B, axis=1)
    xv_b = jnp.repeat(xv, B, axis=1)
    toks = rng.integers(0, CFG.n_vocab, size=(n_steps, B))
    srcs = [None, np.array([1, 0, 1]), np.array([2, 0, 0]), None,
            np.array([1, 1, 2])]

    # reference: batched head-major decode_impl with physical reorders
    kv_k, kv_v = M.init_kv_cache(CFG, B, dtype=jnp.bfloat16)
    ref_logits = []
    for i in range(n_steps):
        if srcs[i] is not None:
            kv_k = jnp.take(kv_k, jnp.asarray(srcs[i]), axis=1)
            kv_v = jnp.take(kv_v, jnp.asarray(srcs[i]), axis=1)
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec, jnp.asarray(toks[i][:, None], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk_b, xv_b)
        ref_logits.append(np.asarray(logits[:, 0]))

    # origin path: caches NEVER move; lineage lives in the origin table
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    origin = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
    for i in range(n_steps):
        if srcs[i] is not None:
            origin = jnp.take(origin, jnp.asarray(srcs[i]), axis=0)
        origin = origin.at[:, i].set(jnp.arange(B, dtype=jnp.int32))
        bias = MK.beam_attn_bias(origin, jnp.int32(i), Tc)
        x0 = (dec["te"][jnp.asarray(toks[i])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step_beam(
            CFG, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            attn_bias=bias, interpret=True)
        g = np.asarray(logits)
        r = ref_logits[i]
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-2,
                                   err_msg=f"step {i}")
        for b in range(B):
            assert int(np.argmax(g[b])) == int(np.argmax(r[b])), (i, b)


def test_megakernel_batch_matches_decode_impl():
    """Batched-stream mode (per-row cross-KV, blocked online-softmax
    cross-attention) vs the batched decode_impl step: B independent
    streams with DIFFERENT encoder outputs must match per stream."""
    B, n_steps = 3, 4
    rng = np.random.default_rng(31)
    params, dec, mp, _, _, _ = _setup(seed=31)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    Ta = CFG.n_audio_ctx

    # per-stream encoder outputs -> per-stream cross KV
    enc_outs = jnp.asarray(
        rng.standard_normal((B, Ta, CFG.n_audio_state)), jnp.bfloat16)
    xk_b, xv_b = M.cross_kv(CFG, dec, enc_outs)      # (L, B, H, Ta, dh)

    toks = rng.integers(0, CFG.n_vocab, size=(n_steps, B))

    kv_k, kv_v = M.init_kv_cache(CFG, B, dtype=jnp.bfloat16)
    ref_logits = []
    for i in range(n_steps):
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG, dec, jnp.asarray(toks[i][:, None], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk_b, xv_b)
        ref_logits.append(np.asarray(logits[:, 0]))

    def to_nat_b(a):       # (L, B, H, T, dh) -> (L, B, T, S)
        return jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(
            L, B, a.shape[3], S)

    xk_nat, xv_nat = to_nat_b(xk_b), to_nat_b(xv_b)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    for i in range(n_steps):
        x0 = (dec["te"][jnp.asarray(toks[i])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step_batch(
            CFG, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            interpret=True)
        g = np.asarray(logits)
        r = ref_logits[i]
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-2,
                                   err_msg=f"step {i}")
        # random-weight logits have near-degenerate argmax; the online
        # softmax's block-wise rescale legitimately flips it — gate on
        # top-8 set overlap instead (tools/bench_batch_ab.py parity gate)
        for b in range(B):
            top_g = set(np.argsort(g[b])[-8:])
            top_r = set(np.argsort(r[b])[-8:])
            assert len(top_g & top_r) >= 4, (i, b)


def test_megakernel_beam_static_matches_blocked():
    """self_blocked=False (one static full-width dot per head) must match
    the blocked fori_loop online-softmax path — same bias, same caches."""
    B = 3
    params, dec, mp, xk, xv, _ = _setup(seed=7)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    xkn, xvn = _hm_to_nat(xk), _hm_to_nat(xv)
    mk = lambda: jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    origin = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
    x0 = (dec["te"][jnp.asarray([1, 5, 9])]
          + dec["pe"][0][None]).astype(jnp.bfloat16)
    bias = MK.beam_attn_bias(origin, jnp.int32(0), Tc)
    la, _, _ = MK.mega_decode_step_beam(
        CFG, mp, x0, mk(), mk(), jnp.int32(0), xkn, xvn, attn_bias=bias,
        interpret=True, self_blocked=True)
    lb, _, _ = MK.mega_decode_step_beam(
        CFG, mp, x0, mk(), mk(), jnp.int32(0), xkn, xvn, attn_bias=bias,
        interpret=True, self_blocked=False)
    ra, rb = np.asarray(la, np.float32), np.asarray(lb, np.float32)
    assert np.abs(ra - rb).max() / (np.abs(ra).max() + 1e-6) < 2e-2


def test_megakernel_beam_boundary_sizes():
    """B=8 (all sublane rows occupied, no pad rows) and B=1 (degenerate
    fall-through to the greedy kernel) through the flat-carry API."""
    params, dec, mp, xk, xv, _ = _setup(seed=3)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    xkn, xvn = _hm_to_nat(xk), _hm_to_nat(xv)
    for B in (8, 1):
        nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
        nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
        origin = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
        bias = MK.beam_attn_bias(origin, jnp.int32(0), Tc)
        x0 = (dec["te"][jnp.arange(B)] + dec["pe"][0][None]
              ).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step_beam(
            CFG, mp, x0, nk, nv, jnp.int32(0), xkn, xvn,
            attn_bias=bias if B > 1 else None, interpret=True)
        g = np.asarray(logits, np.float32)
        assert g.shape == (B, CFG.n_vocab)
        assert np.isfinite(g).all(), B
        assert nk.shape == (L, Tc * B, S)


# ---------------------------------------------------------------------------
# grouped mode: n_text_layer > MEGA_GROUP chains <=8-layer kernels
# (small/medium/large-v2/v3-class depth; lifts the round-2 <=8-layer gate)
# ---------------------------------------------------------------------------

CFG_DEEP = M.WhisperConfig(
    n_vocab=640, n_audio_ctx=48, n_audio_state=256, n_audio_head=4,
    n_audio_layer=2, n_text_ctx=64, n_text_state=256, n_text_head=4,
    n_text_layer=10, n_mels=80)      # 10 = one full 8-group + a 2-tail


def _setup_deep(seed=0, n_steps=4, quant="none"):
    rng = np.random.default_rng(seed)
    params = M.init_params(CFG_DEEP, seed=seed, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    mp = MK.prepare_mega(CFG_DEEP, dec, quant=quant)
    Ta = CFG_DEEP.n_audio_ctx
    enc_out = jnp.asarray(
        rng.standard_normal((1, Ta, CFG_DEEP.n_audio_state)), jnp.bfloat16)
    xk, xv = M.cross_kv(CFG_DEEP, dec, enc_out)
    toks = rng.integers(0, CFG_DEEP.n_vocab, size=n_steps)
    return params, dec, mp, xk, xv, toks


def test_megakernel_grouped_matches_decode_impl():
    assert CFG_DEEP.n_text_layer > MK.MEGA_GROUP
    params, dec, mp, xk, xv, toks = _setup_deep(seed=31)
    L, S, Tc = CFG_DEEP.n_text_layer, CFG_DEEP.n_text_state, CFG_DEEP.n_text_ctx

    kv_k, kv_v = M.init_kv_cache(CFG_DEEP, 1, dtype=jnp.bfloat16)
    ref_logits = []
    for i, t in enumerate(toks):
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG_DEEP, dec, jnp.asarray([[t]], jnp.int32), kv_k, kv_v,
            jnp.int32(i), xk, xv)
        ref_logits.append(np.asarray(logits[0, 0]))

    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    got_logits = []
    for i, t in enumerate(toks):
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step(
            CFG_DEEP, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            interpret=True)
        got_logits.append(np.asarray(logits[0]))

    for i, (r, g) in enumerate(zip(ref_logits, got_logits)):
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-2,
                                   err_msg=f"step {i}")
        # argmax must agree unless the reference's top-2 are a random-
        # weight near-tie inside the bf16 noise floor (10 layers of
        # accumulation; the L=3 suite asserts exact argmax)
        top2 = np.partition(r, -2)[-2:]
        if (top2[1] - top2[0]) / scale > 5e-3:
            assert int(np.argmax(g)) == int(np.argmax(r)), f"argmax step {i}"

    # every group's layers wrote their cache rows (incl. the 2-layer tail)
    n = len(toks)
    hm_k = np.asarray(jnp.transpose(kv_k[:, 0], (0, 2, 1, 3))
                      .reshape(L, Tc, S), np.float32)
    got_k = np.asarray(nk, np.float32)
    sk = np.abs(hm_k[:, :n]).max() + 1e-6
    np.testing.assert_allclose(got_k[:, :n] / sk, hm_k[:, :n] / sk, atol=2e-2)
    assert (got_k[:, n:] == 0).all()


def test_megakernel_grouped_int8_runs():
    """Grouped chain with int8 planes (the quantized serving mode at
    medium/large depth)."""
    params, dec, mp, xk, xv, toks = _setup_deep(seed=32, n_steps=2,
                                                quant="all")
    L, S, Tc = CFG_DEEP.n_text_layer, CFG_DEEP.n_text_state, CFG_DEEP.n_text_ctx
    dense_mp = MK.prepare_mega(CFG_DEEP, dec, quant="none")

    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    # separate buffers: mega_decode_step donates its kv carries
    nk = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nk8 = jnp.zeros((L, Tc, S), jnp.bfloat16)
    nv8 = jnp.zeros((L, Tc, S), jnp.bfloat16)
    for i, t in enumerate(toks):
        x0 = (dec["te"][jnp.asarray([t])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        ld, nk, nv = MK.mega_decode_step(
            CFG_DEEP, dense_mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            interpret=True)
        l8, nk8, nv8 = MK.mega_decode_step(
            CFG_DEEP, mp, x0, nk8, nv8, jnp.int32(i), xk_nat, xv_nat,
            interpret=True)
        r, g = np.asarray(ld[0]), np.asarray(l8[0])
        scale = np.abs(r).max() + 1e-6
        # int8 planes: q8_0-level error on every matvec
        np.testing.assert_allclose(g / scale, r / scale, atol=8e-2)


def test_megakernel_grouped_beam_matches_decode_impl():
    B, n_steps = 2, 3
    rng = np.random.default_rng(33)
    params, dec, mp, xk, xv, _ = _setup_deep(seed=33)
    L, S, Tc = CFG_DEEP.n_text_layer, CFG_DEEP.n_text_state, CFG_DEEP.n_text_ctx

    xk_b = jnp.repeat(xk, B, axis=1)
    xv_b = jnp.repeat(xv, B, axis=1)
    toks = rng.integers(0, CFG_DEEP.n_vocab, size=(n_steps, B))

    kv_k, kv_v = M.init_kv_cache(CFG_DEEP, B, dtype=jnp.bfloat16)
    ref_logits = []
    for i in range(n_steps):
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG_DEEP, dec, jnp.asarray(toks[i][:, None], jnp.int32),
            kv_k, kv_v, jnp.int32(i), xk_b, xv_b)
        ref_logits.append(np.asarray(logits[:, 0]))

    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    origin_id = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, Tc))
    got_logits = []
    for i in range(n_steps):
        x0 = (dec["te"][jnp.asarray(toks[i])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        bias = MK.beam_attn_bias(origin_id, jnp.int32(i), Tc)
        logits, nk, nv = MK.mega_decode_step_beam(
            CFG_DEEP, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            attn_bias=bias, interpret=True)
        got_logits.append(np.asarray(logits))

    for i, (r, g) in enumerate(zip(ref_logits, got_logits)):
        scale = np.abs(r).max() + 1e-6
        # 10 layers of bf16 accumulation: wider noise floor than the L=3
        # suite; argmax asserted only outside near-tie noise
        np.testing.assert_allclose(g / scale, r / scale, atol=4e-2,
                                   err_msg=f"step {i}")
        for b in range(B):
            top2 = np.partition(r[b], -2)[-2:]
            if (top2[1] - top2[0]) / scale > 1e-2:
                assert int(np.argmax(g[b])) == int(np.argmax(r[b])), (i, b)


def test_megakernel_grouped_batch_matches_decode_impl():
    """Grouped chain in batched-serving mode (per-stream cross-KV)."""
    B, n_steps = 2, 3
    rng = np.random.default_rng(34)
    params, dec, mp, xk, xv, _ = _setup_deep(seed=34)
    L, S, Tc = CFG_DEEP.n_text_layer, CFG_DEEP.n_text_state, CFG_DEEP.n_text_ctx
    Ta = CFG_DEEP.n_audio_ctx

    enc_b = jnp.asarray(rng.standard_normal((B, Ta, CFG_DEEP.n_audio_state)),
                        jnp.bfloat16)
    xkb, xvb = M.cross_kv(CFG_DEEP, dec, enc_b)     # (L,B,H,Ta,dh)
    toks = rng.integers(0, CFG_DEEP.n_vocab, size=(n_steps, B))

    kv_k, kv_v = M.init_kv_cache(CFG_DEEP, B, dtype=jnp.bfloat16)
    ref_logits = []
    for i in range(n_steps):
        logits, kv_k, kv_v, _ = M.decode_impl(
            CFG_DEEP, dec, jnp.asarray(toks[i][:, None], jnp.int32),
            kv_k, kv_v, jnp.int32(i), xkb, xvb)
        ref_logits.append(np.asarray(logits[:, 0]))

    def to_nat_b(a):   # (L,B,H,T,dh) -> (L,B,T,S)
        Lx, Bx, H, T, dh = a.shape
        return jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(Lx, Bx, T, H * dh)

    xk_nat, xv_nat = to_nat_b(xkb), to_nat_b(xvb)
    nk = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    nv = jnp.zeros((L, Tc * B, S), jnp.bfloat16)
    got_logits = []
    for i in range(n_steps):
        x0 = (dec["te"][jnp.asarray(toks[i])]
              + dec["pe"][jnp.asarray([i])]).astype(jnp.bfloat16)
        logits, nk, nv = MK.mega_decode_step_batch(
            CFG_DEEP, mp, x0, nk, nv, jnp.int32(i), xk_nat, xv_nat,
            interpret=True, tac=128)
        got_logits.append(np.asarray(logits))

    for i, (r, g) in enumerate(zip(ref_logits, got_logits)):
        scale = np.abs(r).max() + 1e-6
        # 10 layers of bf16 accumulation: wider noise floor than the L=3
        # suite; argmax asserted only outside near-tie noise
        np.testing.assert_allclose(g / scale, r / scale, atol=4e-2,
                                   err_msg=f"step {i}")
        for b in range(B):
            top2 = np.partition(r[b], -2)[-2:]
            if (top2[1] - top2[0]) / scale > 1e-2:
                assert int(np.argmax(g[b])) == int(np.argmax(r[b])), (i, b)


def _verify_vs_sequential(quant, head0, R, seed=3):
    """R-row verify call == R sequential single-token calls, BITWISE:
    per-row causal masking makes row r's math identical to the
    single-token kernel at position head0+r (the speculative verify
    contract, decode/device_speculative.py)."""
    rng = np.random.default_rng(seed)
    params = M.init_params(CFG, seed=seed, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    mp = MK.prepare_mega(CFG, dec, quant=quant)
    enc_out = jnp.asarray(
        rng.standard_normal((1, CFG.n_audio_ctx, CFG.n_audio_state)),
        jnp.bfloat16)
    xk, xv = M.cross_kv(CFG, dec, enc_out)
    xk_nat, xv_nat = _hm_to_nat(xk), _hm_to_nat(xv)
    L, S, Tc = CFG.n_text_layer, CFG.n_text_state, CFG.n_text_ctx
    toks = jnp.asarray(rng.integers(0, CFG.n_vocab, R), jnp.int32)
    hist = jnp.asarray(rng.standard_normal((L, head0, S)), jnp.bfloat16)
    base_k = jnp.zeros((L, Tc, S), jnp.bfloat16).at[:, :head0].set(hist)
    base_v = jnp.zeros((L, Tc, S), jnp.bfloat16).at[:, :head0].set(hist * .5)

    nk, nv = jnp.copy(base_k), jnp.copy(base_v)
    seq_rows = []
    for r in range(R):
        x0 = (dec["te"][toks[r]][None]
              + dec["pe"][head0 + r][None]).astype(jnp.bfloat16)
        lg, nk, nv = MK.mega_decode_step(CFG, mp, x0, nk, nv,
                                         jnp.int32(head0 + r),
                                         xk_nat, xv_nat, interpret=True)
        seq_rows.append(lg[0])
    seq = jnp.stack(seq_rows)

    x0r = (dec["te"][toks]
           + dec["pe"][head0 + jnp.arange(R)]).astype(jnp.bfloat16)
    ver, vk, vv = MK.mega_decode_step(CFG, mp, x0r, base_k, base_v,
                                      jnp.int32(head0), xk_nat, xv_nat,
                                      interpret=True)
    assert jnp.array_equal(seq, ver), "verify logits != sequential"
    assert jnp.array_equal(nk, vk) and jnp.array_equal(nv, vv), \
        "verify cache != sequential"


def test_megakernel_verify_rows_match_sequential():
    _verify_vs_sequential("none", head0=9, R=5)


def test_megakernel_verify_int8_clamp_edge():
    # head0 = Tc - R puts the 16-row RMW window at its Tc-16 clamp
    _verify_vs_sequential("all", head0=CFG.n_text_ctx - 8, R=8)
