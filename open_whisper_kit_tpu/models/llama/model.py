"""LLaMA-family decoder-only transformer in JAX (TPU-first).

Independent reimplementation of the model families the reference's
talk-llama example serves through its vendored llama.cpp
(/root/reference/examples/talk-llama/llama-model.cpp, llm_build_llama):
RMSNorm -> rotary GQA attention -> RMSNorm -> SwiGLU MLP blocks over a
static-shape KV cache, greedy/sampled generation fused into on-device
`lax.scan` chunks (one dispatch per CHUNK tokens, not per token).

Conventions match the whisper module: params are nested dicts of jnp
arrays with per-layer weights stacked on a leading layer axis; matmul
weights are stored (in, out) so forward is ``x @ w``.

RoPE: ggml's LLAMA arch uses interleaved ("NORM") rotary pairs; HF uses
the half-split layout with permuted q/k rows. We compute the half-split
form and un-permute ggml q/k weights at load time
(``_unpermute_rope``) — identical numerics, friendlier vectorization
(one roll of the halves instead of an even/odd de-interleave).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int
    n_ctx: int
    n_embd: int
    n_layer: int
    n_head: int
    n_head_kv: int
    n_ff: int
    rope_freq_base: float = 10000.0
    rms_eps: float = 1e-5
    rope_scale: float = 1.0       # linear position scale (1/factor)

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


def config_from_gguf(meta: dict) -> LlamaConfig:
    arch = meta.get("general.architecture", "llama")
    g = lambda k, d=None: meta.get(f"{arch}.{k}", d)
    n_embd = int(g("embedding_length"))
    n_head = int(g("attention.head_count"))
    rope_dim = int(g("rope.dimension_count", n_embd // n_head))
    if rope_dim != n_embd // n_head:
        raise NotImplementedError(
            f"partial rotary (rope_dim={rope_dim}) not supported")
    scale = float(g("rope.scale_linear", 0.0)) or 1.0
    if g("rope.scaling.type") == "linear":
        scale = float(g("rope.scaling.factor", 1.0))
    return LlamaConfig(
        n_vocab=int(meta.get("tokenizer.ggml.tokens_len",
                             g("vocab_size", 0)) or g("vocab_size", 0)),
        n_ctx=int(g("context_length", 2048)),
        n_embd=n_embd,
        n_layer=int(g("block_count")),
        n_head=n_head,
        n_head_kv=int(g("attention.head_count_kv", n_head)),
        n_ff=int(g("feed_forward_length")),
        rope_freq_base=float(g("rope.freq_base", 10000.0)),
        rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_scale=1.0 / scale,
    )


def _unpermute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """ggml (interleaved-RoPE) q/k rows -> HF half-split rows.

    The HF->gguf converter permutes with
    ``w.reshape(h, 2, d/2, in).swapaxes(1, 2)``; this is the inverse.
    w is (out, in) = (h*d, in).
    """
    out, inn = w.shape
    d = out // n_head
    return (w.reshape(n_head, d // 2, 2, inn)
            .swapaxes(1, 2).reshape(out, inn))


def params_from_gguf(gf, cfg: LlamaConfig | None = None,
                     dtype=jnp.bfloat16) -> tuple[LlamaConfig, Params]:
    """Build the param pytree from a loaded GGUFFile (io.gguf.load_gguf).

    Quantized tensors are dequantized at load (io.quant handles every
    ggml block format); weights land on device as `dtype` with (in, out)
    layout, norms/embeddings in f32.
    """
    if cfg is None:
        cfg = config_from_gguf(gf.metadata)
    td = gf.tensors

    def dense(name):  # gguf stores (out, in); we want (in, out)
        return jnp.asarray(np.ascontiguousarray(td[name].to_float().T), dtype)

    def f32(name):
        return jnp.asarray(td[name].to_float(), jnp.float32)

    def qk_dense(name):
        arr = _unpermute_rope(
            td[name].to_float(),
            cfg.n_head if "attn_q" in name else cfg.n_head_kv)
        return jnp.asarray(np.ascontiguousarray(arr.T), dtype)

    def block(i):
        p = f"blk.{i}."
        return {
            "attn_norm": f32(p + "attn_norm.weight"),
            "wq": qk_dense(p + "attn_q.weight"),
            "wk": qk_dense(p + "attn_k.weight"),
            "wv": dense(p + "attn_v.weight"),
            "wo": dense(p + "attn_output.weight"),
            "ffn_norm": f32(p + "ffn_norm.weight"),
            "w_gate": dense(p + "ffn_gate.weight"),
            "w_up": dense(p + "ffn_up.weight"),
            "w_down": dense(p + "ffn_down.weight"),
        }

    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    tok_emb = f32("token_embd.weight")          # (V, S)
    if cfg.n_vocab == 0:
        cfg = dataclasses.replace(cfg, n_vocab=tok_emb.shape[0])
    params = {
        "tok_emb": tok_emb.astype(dtype),
        "output_norm": f32("output_norm.weight"),
        "output": (dense("output.weight") if "output.weight" in td
                   else tok_emb.T.astype(dtype)),   # tied embeddings
        "blocks": stack([block(i) for i in range(cfg.n_layer)]),
    }
    return cfg, params


def init_params(cfg: LlamaConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> Params:
    """Random params for tests/benches (same tree as params_from_gguf)."""
    rng = np.random.default_rng(seed)
    S, F = cfg.n_embd, cfg.n_ff
    kvd = cfg.n_head_kv * cfg.head_dim

    def w(i, o):
        return jnp.asarray(rng.standard_normal((i, o)) / np.sqrt(i), dtype)

    def block():
        return {
            "attn_norm": jnp.ones((S,), jnp.float32),
            "wq": w(S, S), "wk": w(S, kvd), "wv": w(S, kvd), "wo": w(S, S),
            "ffn_norm": jnp.ones((S,), jnp.float32),
            "w_gate": w(S, F), "w_up": w(S, F), "w_down": w(F, S),
        }

    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "tok_emb": w(cfg.n_vocab, S),
        "output_norm": jnp.ones((S,), jnp.float32),
        "output": w(S, cfg.n_vocab),
        "blocks": stack([block() for _ in range(cfg.n_layer)]),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rms_norm(x, w, eps):
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * w).astype(x.dtype)


def _rope(x, pos, cfg: LlamaConfig):
    """Half-split rotary embedding. x: (B, T, H, d); pos: (T,) i32."""
    d = x.shape[-1]
    inv = cfg.rope_freq_base ** (-jnp.arange(0, d // 2) * 2.0 / d)
    theta = (pos.astype(jnp.float32) * cfg.rope_scale)[:, None] * inv  # (T,d/2)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cos = cos[None, :, None, :].astype(x.dtype)
    sin = sin[None, :, None, :].astype(x.dtype)
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def init_kv_cache(cfg: LlamaConfig, batch: int, n_cache: int,
                  dtype=jnp.bfloat16):
    kvd = cfg.n_head_kv * cfg.head_dim
    shape = (cfg.n_layer, batch, n_cache, kvd)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("kv_k", "kv_v"))
def forward(cfg: LlamaConfig, params: Params, tokens: jnp.ndarray,
            kv_k: jnp.ndarray, kv_v: jnp.ndarray, pos0: jnp.ndarray):
    """Evaluate `tokens` (B, T) at positions pos0..pos0+T-1.

    Appends K/V into the cache at those slots and returns
    (logits_last (B, V) f32, kv_k, kv_v). One pass serves both prompt
    ingest (T=n) and single-step decode (T=1) — the llama_decode /
    llama_batch analog (talk-llama.cpp:483-499) without per-token
    dispatches.
    """
    B, T = tokens.shape
    H, HKV, d = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    n_cache = kv_k.shape[2]
    pos = pos0 + jnp.arange(T, dtype=jnp.int32)

    x = jnp.take(params["tok_emb"], tokens, axis=0)       # (B,T,S)

    # causal-within-window + "nothing past my slot" mask, shared by layers
    slots = jnp.arange(n_cache, dtype=jnp.int32)[None, :]  # (1,C)
    allow = slots <= pos[:, None]                          # (T,C)
    mask = jnp.where(allow, 0.0, -jnp.inf).astype(jnp.float32)

    # lax.scan over stacked blocks, carrying the full caches
    def layer_step(carry, inp):
        x, kk, kv = carry
        p, il = inp
        h = _rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = (h @ p["wq"]).reshape(B, T, H, d)
        k = (h @ p["wk"]).reshape(B, T, HKV, d)
        v = (h @ p["wv"]).reshape(B, T, HKV, d)
        q = _rope(q, pos, cfg)
        k = _rope(k, pos, cfg)

        kk = jax.lax.dynamic_update_slice(
            kk, k.reshape(1, B, T, HKV * d), (il, 0, pos0, 0))
        kv = jax.lax.dynamic_update_slice(
            kv, v.reshape(1, B, T, HKV * d), (il, 0, pos0, 0))
        ck = jax.lax.dynamic_index_in_dim(kk, il, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(kv, il, 0, keepdims=False)
        ck = ck.reshape(B, n_cache, HKV, d)
        cv = cv.reshape(B, n_cache, HKV, d)

        # GQA: repeat kv heads to H
        rep = H // HKV
        qh = q.transpose(0, 2, 1, 3)                       # (B,H,T,d)
        kh = jnp.repeat(ck.transpose(0, 2, 1, 3), rep, 1)  # (B,H,C,d)
        vh = jnp.repeat(cv.transpose(0, 2, 1, 3), rep, 1)
        scores = jnp.einsum(
            "bhtd,bhcd->bhtc", qh, kh,
            preferred_element_type=jnp.float32) / np.sqrt(d)
        probs = jax.nn.softmax(scores + mask, axis=-1).astype(x.dtype)
        att = jnp.einsum("bhtc,bhcd->bhtd", probs, vh)
        att = att.transpose(0, 2, 1, 3).reshape(B, T, H * d)
        x = x + att @ p["wo"]

        h = _rms_norm(x, p["ffn_norm"], cfg.rms_eps)
        g = h @ p["w_gate"]
        x = x + ((jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
                  * (h @ p["w_up"])) @ p["w_down"])
        return (x, kk, kv), None

    ils = jnp.arange(cfg.n_layer, dtype=jnp.int32)
    (x, kv_k, kv_v), _ = jax.lax.scan(
        layer_step, (x, kv_k, kv_v), (params["blocks"], ils))

    xf = _rms_norm(x[:, -1], params["output_norm"], cfg.rms_eps)
    logits = (xf @ params["output"]).astype(jnp.float32)
    return logits, kv_k, kv_v


# ---------------------------------------------------------------------------
# sampling + fused generation
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SampleParams:
    """talk-llama's sampler chain settings (talk-llama.cpp:63-68).

    The reference chains top_k -> top_p -> temp -> dist -> min_p; a
    sampler after `dist` never runs, so min_p is dead there — we apply
    the standard llama.cpp common-sampler order
    (top_k -> top_p -> min_p -> temp -> dist) and document the
    divergence here.
    """
    temp: float = 0.30
    top_k: int = 5
    top_p: float = 0.80
    min_p: float = 0.01
    min_keep: int = 1


def sample_token(logits: jnp.ndarray, sp: SampleParams, key) -> jnp.ndarray:
    """Sample from (V,) f32 logits on device."""
    if sp.temp <= 0.0:
        return jnp.argmax(logits).astype(jnp.int32)
    k = max(sp.top_k, sp.min_keep, 1)
    vals, idx = jax.lax.top_k(logits, k)
    probs = jax.nn.softmax(vals)
    # top-p: keep the smallest prefix with cumsum >= top_p (min_keep kept)
    csum = jnp.cumsum(probs)
    keep = (jnp.concatenate([jnp.zeros(1), csum[:-1]]) < sp.top_p)
    # min-p: drop probs < min_p * max (within survivors)
    keep &= probs >= sp.min_p * probs[0]
    keep = keep.at[:sp.min_keep].set(True)
    vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals / sp.temp)
    return idx[choice].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_tokens", "sp"),
                   donate_argnames=("kv_k", "kv_v"))
def generate_chunk(cfg: LlamaConfig, params: Params, first_token, pos0,
                   kv_k, kv_v, n_tokens: int, sp: SampleParams, key,
                   eos_id: int):
    """Generate up to n_tokens greedily/sampled in ONE dispatch.

    Starts from `first_token` (already appended at pos0-1 conceptually:
    it is fed as input at pos0). Returns (tokens (n_tokens,) i32 with
    eos padding after stop, n_valid, kv_k, kv_v). The host checks
    antiprompts between chunks (text-level, talk-llama.cpp:707-736).
    """
    def step(carry, _):
        tok, pos, kk, kv, key, done = carry
        logits, kk, kv = forward.__wrapped__(
            cfg, params, tok[None, None], kk, kv, pos)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[0], sp, sub)
        nxt = jnp.where(done, eos_id, nxt)
        done = done | (nxt == eos_id)
        return (nxt, pos + 1, kk, kv, key, done), (nxt, done)

    init = (jnp.asarray(first_token, jnp.int32),
            jnp.asarray(pos0, jnp.int32), kv_k, kv_v, key,
            jnp.asarray(False))
    (_, _, kv_k, kv_v, _, _), (toks, dones) = jax.lax.scan(
        step, init, None, length=n_tokens)
    n_valid = jnp.sum(~dones) + jnp.any(dones)  # include the eos itself
    return toks, jnp.minimum(n_valid, n_tokens), kv_k, kv_v


class LlamaContext:
    """Host-side driver: tokenizer + KV bookkeeping + chunked generation.

    The llama_context / sampler-chain analog for examples/talk.py.
    """

    def __init__(self, gguf_path=None, cfg=None, params=None, vocab=None,
                 n_ctx: int = 2048, dtype=jnp.bfloat16):
        if gguf_path is not None:
            from ...io.gguf import load_gguf
            from .tokenizer import LlamaVocab
            gf = load_gguf(gguf_path)
            cfg, params = params_from_gguf(gf, dtype=dtype)
            vocab = LlamaVocab.from_gguf_metadata(gf.metadata)
        self.cfg, self.params, self.vocab = cfg, params, vocab
        self.n_ctx = min(n_ctx, cfg.n_ctx)
        self.kv_k, self.kv_v = init_kv_cache(cfg, 1, self.n_ctx, dtype)
        self.n_past = 0

    def reset(self):
        self.kv_k, self.kv_v = init_kv_cache(
            self.cfg, 1, self.n_ctx, self.kv_k.dtype)
        self.n_past = 0

    def eval_tokens(self, tokens: list[int]) -> np.ndarray:
        """Prompt ingest; returns last-position logits (V,) f32."""
        if self.n_past + len(tokens) > self.n_ctx:
            raise ValueError(
                f"prompt of {len(tokens)} tokens at n_past={self.n_past} "
                f"exceeds the context window ({self.n_ctx}); shorten the "
                f"prompt or raise n_ctx")
        logits = None
        for i in range(0, len(tokens), 512):     # bounded dispatch shapes
            chunk = tokens[i:i + 512]
            toks = jnp.asarray(chunk, jnp.int32)[None]
            logits, self.kv_k, self.kv_v = forward(
                self.cfg, self.params, toks, self.kv_k, self.kv_v,
                jnp.asarray(self.n_past, jnp.int32))
            self.n_past += len(chunk)
        return np.asarray(logits[0])

    def generate(self, prompt_tokens, sp: SampleParams, *, max_tokens: int,
                 antiprompts=(), seed: int = 0, chunk: int = 16,
                 on_piece=None) -> str:
        """talk-llama's inference loop: eval prompt, then sample until an
        antiprompt / eos / max_tokens; device work batched per chunk."""
        assert prompt_tokens, "empty prompt"
        if len(prompt_tokens) > 1:
            self.eval_tokens(prompt_tokens[:-1])
        first = prompt_tokens[-1]
        key = jax.random.PRNGKey(seed)
        text = ""
        n_out = 0
        eos = self.vocab.eos_id
        while n_out < max_tokens:
            n = min(chunk, max_tokens - n_out,
                    self.n_ctx - 1 - (self.n_past + 1))
            if n <= 0:
                break
            key, sub = jax.random.split(key)
            toks, n_valid, self.kv_k, self.kv_v = generate_chunk(
                self.cfg, self.params, first, self.n_past, self.kv_k,
                self.kv_v, n, sp, sub, eos)
            toks = np.asarray(toks)[:int(n_valid)]
            self.n_past += int(n_valid)
            stopped = len(toks) and toks[-1] == eos
            new = "".join(self.vocab.piece(int(t)) for t in toks)
            text += new
            if on_piece and new:
                on_piece(new)
            n_out += len(toks)
            for ap in antiprompts:
                j = text.find(ap)
                if j != -1:
                    return text[:j]
            if stopped or len(toks) < n:
                break
            first = int(toks[-1])
        return text
