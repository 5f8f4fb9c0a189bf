"""Whisper model correctness: independent torch oracle + cache invariants.

The oracle is a from-scratch torch implementation of the (well-known)
Whisper architecture — conv1(s1)/conv2(s2)+GELU, sinusoid-free learned pos
embeds, pre-LN blocks, q/k scaled by d**-0.25 — written directly here so a
bug in the JAX port can't be self-consistent with it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from open_whisper_kit_tpu.models.whisper import model as M

CFG = M.WhisperConfig(
    n_vocab=128, n_audio_ctx=48, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
    n_text_layer=2, n_mels=80,
)


@pytest.fixture(scope="module")
def params():
    return M.init_params(CFG, seed=0, dtype=jnp.float32)


def t(x):
    # np.asarray of a jax.Array is read-only; copy so torch doesn't warn
    return torch.from_numpy(np.array(x, dtype=np.float32))


def torch_ln(x, w, b, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(w), t(b), eps)


def torch_attn(q, k, v, n_head, scale, mask=None):
    B, Tq, S = q.shape
    Tk = k.shape[1]
    d = S // n_head
    qh = q.view(B, Tq, n_head, d).permute(0, 2, 1, 3)
    kh = k.view(B, Tk, n_head, d).permute(0, 2, 1, 3)
    vh = v.view(B, Tk, n_head, d).permute(0, 2, 1, 3)
    scores = qh @ kh.transpose(-1, -2) * scale
    if mask is not None:
        scores = scores + mask
    probs = torch.softmax(scores, dim=-1)
    out = probs @ vh
    return out.permute(0, 2, 1, 3).reshape(B, Tq, S)


def torch_block(p, x, n_head, eps=1e-5):
    d = x.shape[-1] // n_head
    h = torch_ln(x, p["attn_ln_w"], p["attn_ln_b"], eps)
    q = h @ t(p["q_w"]) + t(p["q_b"])
    k = h @ t(p["k_w"])
    v = h @ t(p["v_w"]) + t(p["v_b"])
    x = x + torch_attn(q, k, v, n_head, 1.0 / np.sqrt(d)) @ t(p["o_w"]) + t(p["o_b"])
    h = torch_ln(x, p["mlp_ln_w"], p["mlp_ln_b"], eps)
    h = F.gelu(h @ t(p["mlp0_w"]) + t(p["mlp0_b"]), approximate="tanh")
    return x + h @ t(p["mlp1_w"]) + t(p["mlp1_b"])


def block_params(blocks, i):
    return {k: np.asarray(v[i]) for k, v in blocks.items()}


def torch_encode(params, mel):
    enc = params["encoder"]
    x = t(mel)  # (B, T, n_mels)
    w1 = t(enc["conv1_w"]).permute(2, 1, 0)  # WIO -> OIW
    x = F.conv1d(x.transpose(1, 2), w1, t(enc["conv1_b"]), stride=1, padding=1)
    x = F.gelu(x, approximate="tanh")
    w2 = t(enc["conv2_w"]).permute(2, 1, 0)
    x = F.conv1d(x, w2, t(enc["conv2_b"]), stride=2, padding=1)
    x = F.gelu(x, approximate="tanh").transpose(1, 2)  # (B, T/2, S)
    x = x + t(enc["pos"])[: x.shape[1]]
    for i in range(CFG.n_audio_layer):
        x = torch_block(block_params(enc["blocks"], i), x, CFG.n_audio_head)
    return torch_ln(x, enc["ln_post_w"], enc["ln_post_b"])


def torch_decode(params, tokens, enc_out):
    dec = params["decoder"]
    d = CFG.d_text_head
    kq = d ** -0.25
    B, T = tokens.shape
    x = t(dec["te"])[torch.from_numpy(tokens)] + t(dec["pe"])[:T]
    causal = torch.full((T, T), float("-inf")).triu(1)
    for i in range(CFG.n_text_layer):
        p = block_params(dec["blocks"], i)
        h = torch_ln(x, p["attn_ln_w"], p["attn_ln_b"])
        q = (h @ t(p["q_w"]) + t(p["q_b"])) * kq
        k = (h @ t(p["k_w"])) * kq
        v = h @ t(p["v_w"]) + t(p["v_b"])
        x = x + torch_attn(q, k, v, CFG.n_text_head, 1.0, causal) @ t(p["o_w"]) + t(p["o_b"])
        h = torch_ln(x, p["cross_ln_w"], p["cross_ln_b"])
        cq = (h @ t(p["cq_w"]) + t(p["cq_b"]))
        ck = enc_out @ t(p["ck_w"])
        cv = enc_out @ t(p["cv_w"]) + t(p["cv_b"])
        # total cross score scale d**-0.5 (reference: K pre-scaled + softmax scale)
        x = x + torch_attn(cq, ck, cv, CFG.n_text_head, 1.0 / np.sqrt(d)) @ t(p["co_w"]) + t(p["co_b"])
        h = torch_ln(x, p["mlp_ln_w"], p["mlp_ln_b"])
        h = F.gelu(h @ t(p["mlp0_w"]) + t(p["mlp0_b"]), approximate="tanh")
        x = x + h @ t(p["mlp1_w"]) + t(p["mlp1_b"])
    x = torch_ln(x, dec["ln_w"], dec["ln_b"])
    return x @ t(dec["te"]).T


def test_encoder_matches_torch_oracle(params):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels)).astype(np.float32)
    got = np.asarray(M.encode(CFG, params["encoder"], jnp.asarray(mel)))
    want = torch_encode(params, mel).numpy()
    assert got.shape == (2, CFG.n_audio_ctx, CFG.n_audio_state)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_decoder_matches_torch_oracle(params):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 2 * CFG.n_audio_ctx, CFG.n_mels)).astype(np.float32)
    enc_out = M.encode(CFG, params["encoder"], jnp.asarray(mel))
    tokens = rng.integers(0, CFG.n_vocab, size=(1, 7)).astype(np.int32)

    xk, xv = M.cross_kv(CFG, params["decoder"], enc_out)
    # head-major cross-KV layout (L, B, H, Ta, dh)
    assert xk.shape == (CFG.n_text_layer, 1, CFG.n_text_head,
                        CFG.n_audio_ctx, CFG.d_text_head)
    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.float32)
    logits, kv_k, kv_v, _ = M.decode(
        CFG, params["decoder"], jnp.asarray(tokens), kv_k, kv_v,
        jnp.int32(0), xk, xv)

    want = torch_decode(params, tokens, torch.from_numpy(np.array(enc_out))).numpy()
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-3)


def test_incremental_equals_full(params):
    """Feeding tokens one at a time through the KV cache must equal the
    single-pass decode (the static-cache replacement for ggml's ring cells)."""
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 2 * CFG.n_audio_ctx, CFG.n_mels)).astype(np.float32)
    enc_out = M.encode(CFG, params["encoder"], jnp.asarray(mel))
    xk, xv = M.cross_kv(CFG, params["decoder"], enc_out)
    tokens = rng.integers(0, CFG.n_vocab, size=(1, 6)).astype(np.int32)

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.float32)
    full_logits, _, _, _ = M.decode(CFG, params["decoder"], jnp.asarray(tokens),
                                    kv_k, kv_v, jnp.int32(0), xk, xv)
    full_last = np.asarray(full_logits)[:, -1]

    kv_k, kv_v = M.init_kv_cache(CFG, 1, dtype=jnp.float32)
    for i in range(tokens.shape[1]):
        step_logits, kv_k, kv_v, _ = M.decode(
            CFG, params["decoder"], jnp.asarray(tokens[:, i:i + 1]),
            kv_k, kv_v, jnp.int32(i), xk, xv)
    np.testing.assert_allclose(np.asarray(step_logits)[:, -1], full_last, atol=2e-4)


def test_beam_reorder(params):
    """Reordering cache rows then continuing == continuing the source rows."""
    rng = np.random.default_rng(4)
    B = 3
    mel = rng.standard_normal((B, 2 * CFG.n_audio_ctx, CFG.n_mels)).astype(np.float32)
    enc_out = M.encode(CFG, params["encoder"], jnp.asarray(mel))
    xk, xv = M.cross_kv(CFG, params["decoder"], enc_out)
    toks = rng.integers(0, CFG.n_vocab, size=(B, 4)).astype(np.int32)

    kv_k, kv_v = M.init_kv_cache(CFG, B, dtype=jnp.float32)
    _, kv_k, kv_v, _ = M.decode(CFG, params["decoder"], jnp.asarray(toks),
                                kv_k, kv_v, jnp.int32(0), xk, xv)
    src = jnp.asarray([2, 0, 0], dtype=jnp.int32)
    kv_k2, kv_v2 = M.reorder_kv(kv_k, kv_v, src)

    nxt = rng.integers(0, CFG.n_vocab, size=(B, 1)).astype(np.int32)
    # after reorder, row b continues beam src[b]; cross kv must be gathered too
    xk2 = jnp.take(xk, src, axis=1)
    xv2 = jnp.take(xv, src, axis=1)
    logits2, _, _, _ = M.decode(CFG, params["decoder"], jnp.asarray(nxt),
                                kv_k2, kv_v2, jnp.int32(4), xk2, xv2)

    # oracle: full decode of the source beams with the same next token
    toks_src = np.concatenate([toks[np.asarray(src)], nxt], axis=1)
    enc_src = torch.from_numpy(np.array(enc_out))[torch.from_numpy(np.array(src))]
    want = torch_decode(params, toks_src, enc_src).numpy()[:, -1]
    np.testing.assert_allclose(np.asarray(logits2)[:, -1], want, atol=5e-3)


def test_encode_pad_once_parity(monkeypatch):
    """Pad-once encoder (T padded to 128-multiple, masked keys) equals the
    exact-length computation on the live prefix."""
    import jax.numpy as jnp
    from open_whisper_kit_tpu.models.whisper import model as M

    cfg = M.WhisperConfig(100, 160, 64, 2, 2, 16, 64, 2, 2, 80)  # T=320
    params = M.init_params(cfg, seed=3, dtype=jnp.float32)
    mel = np.random.default_rng(4).standard_normal((1, 320, 80)).astype(np.float32)

    got = np.asarray(M.encode.__wrapped__(cfg, params["encoder"],
                                          jnp.asarray(mel)))
    monkeypatch.setattr(M, "_ENC_PAD_MIN_T", 10**9)   # disable padding
    ref = np.asarray(M.encode.__wrapped__(cfg, params["encoder"],
                                          jnp.asarray(mel)))
    assert got.shape == ref.shape == (1, 160, 64)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_mha_packed_matches_einsum():
    """The packed no-transpose attention kernel (interpret mode) equals the
    einsum reference with key masking."""
    import jax
    import jax.numpy as jnp
    from open_whisper_kit_tpu.ops.attention import _mha_packed

    B, H, T, D, NV = 2, 4, 256, 64, 250
    S = H * D
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, T, S)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, S)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, S)).astype(np.float32))
    scale = 0.125

    got = np.asarray(_mha_packed(q, k, v, scale, NV, interpret=True))

    qh = np.asarray(q).reshape(B, T, H, D)
    kh = np.asarray(k).reshape(B, T, H, D)[:, :NV]
    vh = np.asarray(v).reshape(B, T, H, D)[:, :NV]
    s = np.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, T, S)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_decode_impl_q8_self_kv_matches_bf16():
    """Int8 self-KV serving cache (init_kv_cache_q8): same tokens as the
    f32 cache within q8_0-level tolerance."""
    import jax.numpy as jnp
    from open_whisper_kit_tpu.models.whisper import model as M
    cfg = M.WhisperConfig(384, 64, 128, 2, 2, 48, 128, 2, 2, 80)
    params = M.init_params(cfg, seed=3, dtype=jnp.float32)
    dec = M.prepare_decoder(params["decoder"])
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    xk, xv = M.cross_kv(cfg, dec, enc)
    ka, va = M.init_kv_cache(cfg, 2, dtype=jnp.float32)
    kb, vb = M.init_kv_cache_q8(cfg, 2)
    tok = jnp.asarray([[5], [9]], jnp.int32)
    for i in range(6):
        la, ka, va, _ = M.decode_impl(cfg, dec, tok, ka, va, jnp.int32(i), xk, xv)
        lb, kb, vb, _ = M.decode_impl(cfg, dec, tok, kb, vb, jnp.int32(i), xk, xv)
        ra = np.asarray(la[:, -1], np.float32)
        rb = np.asarray(lb[:, -1], np.float32)
        rel = np.abs(ra - rb).max() / (np.abs(ra).max() + 1e-6)
        assert rel < 5e-2, (i, rel)
        tok = jnp.asarray(ra.argmax(1)[:, None], jnp.int32)
    assert isinstance(kb, M.QuantKV) and kb.qs.dtype == np.int8


def test_decode_impl_quantkv_nat_matches_quantkv():
    """QuantKVNat (fused pallas cross path, interpret on CPU) vs the
    head-major QuantKV einsum path: same int8 quantization -> close
    logits, identical argmax on peaked rows."""
    import jax.numpy as jnp
    from open_whisper_kit_tpu.models.whisper import model as M
    cfg = M.WhisperConfig(384, 64, 128, 2, 2, 48, 128, 2, 2, 80)
    params = M.init_params(cfg, seed=3, dtype=jnp.float32)
    dec = M.prepare_decoder(params["decoder"])
    rng = np.random.default_rng(7)
    enc = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    xk, xv = M.cross_kv(cfg, dec, enc)
    xk8, xv8 = M.quantize_cross_kv(xk), M.quantize_cross_kv(xv)
    xkn, xvn = M.quantize_cross_kv_nat(xk), M.quantize_cross_kv_nat(xv)
    ka, va = M.init_kv_cache(cfg, 2, dtype=jnp.float32)
    kb, vb = M.init_kv_cache(cfg, 2, dtype=jnp.float32)
    tok = jnp.asarray([[5], [9]], jnp.int32)
    for i in range(4):
        la, ka, va, _ = M.decode_impl(cfg, dec, tok, ka, va, jnp.int32(i),
                                      xk8, xv8)
        lb, kb, vb, _ = M.decode_impl(cfg, dec, tok, kb, vb, jnp.int32(i),
                                      xkn, xvn)
        ra = np.asarray(la[:, -1], np.float32)
        rb = np.asarray(lb[:, -1], np.float32)
        np.testing.assert_allclose(rb, ra, atol=5e-3 * np.abs(ra).max())
        tok = jnp.asarray(ra.argmax(1)[:, None], jnp.int32)


def test_staged_kv_width_bit_exact(params):
    """A narrow self-KV cache widened in stages is BIT-identical to the
    full-width cache: masked tail columns are exact softmax zeros.

    This is the staged-width batched-serving path
    (decode/batch.py::_kv_stage_widths): no-context decodes never reach
    past prompt+n_max positions, so reads start at width 8 here
    (128 in production) and widen on schedule instead of paying the full
    n_text_ctx self-KV read every step."""
    dec = M.prepare_decoder(params["decoder"])
    rng = np.random.default_rng(11)
    enc = jnp.asarray(rng.standard_normal((3, CFG.n_audio_ctx,
                                           CFG.n_audio_state)), jnp.float32)
    xk, xv = M.cross_kv(CFG, dec, enc)

    def run(width0, widen_at):
        # widen_at: {step: new_width} applied AFTER that step
        kv_k, kv_v = M.init_kv_cache(CFG, 3, dtype=jnp.float32, width=width0)
        tok = jnp.zeros((3, 1), jnp.int32)
        logits_all = []
        for i in range(CFG.n_text_ctx):
            logits, kv_k, kv_v, _ = M.decode_impl(
                CFG, dec, tok, kv_k, kv_v, jnp.int32(i), xk, xv)
            logits_all.append(np.asarray(logits[:, -1]))
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            if i in widen_at:
                kv_k = M.widen_kv_cache(kv_k, widen_at[i])
                kv_v = M.widen_kv_cache(kv_v, widen_at[i])
        return logits_all

    full = run(CFG.n_text_ctx, {})
    staged = run(8, {7: 16, 15: CFG.n_text_ctx})
    for a, b in zip(full, staged):
        assert np.array_equal(a, b)


def test_kv_stage_widths():
    from open_whisper_kit_tpu.decode.batch import _kv_stage_widths
    assert _kv_stage_widths(448, 224) == (128, 256)
    assert _kv_stage_widths(448, 225) == (128, 256)
    assert _kv_stage_widths(448, 100) == (128,)
    assert _kv_stage_widths(448, 300) == (128, 256, 448)
    assert _kv_stage_widths(64, 50) == (64,)
    assert _kv_stage_widths(32, 40) == (32,)
