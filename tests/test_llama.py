"""LLaMA runtime tests: GGUF fixture roundtrip, HF-transformers logits
oracle, SPM tokenizer semantics, fused generation parity, talk example
logic (reference: /root/reference/examples/talk-llama/)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_whisper_kit_tpu.io.gguf import GGUFWriter, load_gguf
from open_whisper_kit_tpu.models.llama import model as LM
from open_whisper_kit_tpu.models.llama.tokenizer import (
    LlamaVocab, ATTR_BYTE, ATTR_CONTROL, ATTR_NORMAL, ATTR_UNKNOWN)

TINY = dict(vocab=320, embd=64, layers=2, heads=4, heads_kv=2, ff=128,
            ctx=128)


def _spm_vocab_lists():
    """A small but realistic SPM vocab: specials, byte set, and a merge
    chain for a few words (longer pieces score higher so merges climb)."""
    tokens = ["<unk>", "<s>", "</s>"]
    ttype = [ATTR_UNKNOWN, ATTR_CONTROL, ATTR_CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttype.append(ATTR_BYTE)
        scores.append(0.0)
    # scores emulate BPE merge ranks: short in-word merges first
    # (score 100-len), space attachment last (score len), "▁" standalone
    pieces = ["▁", "▁h", "he", "el", "ll", "lo", "hel", "ell", "llo",
              "hell", "ello", "hello", "▁hel", "▁hello", "▁w", "wo", "or",
              "rl", "ld", "wor", "orl", "rld", "world", "▁world", "▁a",
              "th", "the", "▁the", "▁cat", "ca", "at", "cat", "▁c"]
    for p in pieces:
        tokens.append(p)
        ttype.append(ATTR_NORMAL)
        scores.append(float(len(p)) if p.startswith("▁")
                      else 100.0 - len(p))
    return tokens, scores, ttype


def write_tiny_llama_gguf(path, seed=0, tie_embeddings=False):
    """Random-weight tiny llama GGUF in llama.cpp's layout
    (llama-arch.cpp tensor names, llama.* metadata keys)."""
    t = TINY
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_string("general.architecture", "llama")
    w.add_uint32("llama.embedding_length", t["embd"])
    w.add_uint32("llama.block_count", t["layers"])
    w.add_uint32("llama.attention.head_count", t["heads"])
    w.add_uint32("llama.attention.head_count_kv", t["heads_kv"])
    w.add_uint32("llama.feed_forward_length", t["ff"])
    w.add_uint32("llama.context_length", t["ctx"])
    w.add_uint32("llama.vocab_size", t["vocab"])
    w.add_float32("llama.rope.freq_base", 10000.0)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    tokens, scores, ttype = _spm_vocab_lists()
    tokens = tokens + [f"<extra{i}>" for i in range(t["vocab"] - len(tokens))]
    scores = scores + [0.0] * (t["vocab"] - len(scores))
    ttype = ttype + [ATTR_NORMAL] * (t["vocab"] - len(ttype))
    w.add_string("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(ttype, np.int32))
    w.add_uint32("tokenizer.ggml.bos_token_id", 1)
    w.add_uint32("tokenizer.ggml.eos_token_id", 2)
    w.add_uint32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def r(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    S, F, V = t["embd"], t["ff"], t["vocab"]
    kvd = t["heads_kv"] * (S // t["heads"])
    emb = r(V, S)
    w.add_tensor("token_embd.weight", emb)
    w.add_tensor("output_norm.weight", np.abs(r(S)) + 0.5)
    if not tie_embeddings:
        w.add_tensor("output.weight", r(V, S))
    for i in range(t["layers"]):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.abs(r(S)) + 0.5)
        w.add_tensor(p + "attn_q.weight", r(S, S))
        w.add_tensor(p + "attn_k.weight", r(kvd, S))
        w.add_tensor(p + "attn_v.weight", r(kvd, S))
        w.add_tensor(p + "attn_output.weight", r(S, S))
        w.add_tensor(p + "ffn_norm.weight", np.abs(r(S)) + 0.5)
        w.add_tensor(p + "ffn_gate.weight", r(F, S))
        w.add_tensor(p + "ffn_up.weight", r(F, S))
        w.add_tensor(p + "ffn_down.weight", r(S, F))
    w.write()


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("llama") / "tiny-llama.gguf"
    write_tiny_llama_gguf(path)
    return path


class TestLoader:
    def test_config_and_shapes(self, tiny_gguf):
        gf = load_gguf(tiny_gguf)
        cfg, params = LM.params_from_gguf(gf, dtype=jnp.float32)
        assert cfg.n_embd == 64 and cfg.n_layer == 2
        assert cfg.n_head == 4 and cfg.n_head_kv == 2
        assert params["blocks"]["wq"].shape == (2, 64, 64)
        assert params["blocks"]["wk"].shape == (2, 64, 32)
        assert params["tok_emb"].shape == (320, 64)

    def test_tied_embeddings(self, tmp_path):
        path = tmp_path / "tied.gguf"
        write_tiny_llama_gguf(path, tie_embeddings=True)
        cfg, params = LM.params_from_gguf(load_gguf(path), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(params["output"]),
                                   np.asarray(params["tok_emb"]).T)

    def test_forward_runs(self, tiny_gguf):
        cfg, params = LM.params_from_gguf(load_gguf(tiny_gguf),
                                          dtype=jnp.float32)
        kk, kv = LM.init_kv_cache(cfg, 1, 32, jnp.float32)
        logits, kk, kv = LM.forward(
            cfg, params, jnp.asarray([[1, 5, 9]], jnp.int32), kk, kv,
            jnp.asarray(0, jnp.int32))
        assert logits.shape == (1, 320)
        assert np.isfinite(np.asarray(logits)).all()


class TestQuantizedGGUF:
    """A quantized llama GGUF (mixed q4_0 / q8_0 / q4_K / q6_K tensors,
    written via GGUFWriter.add_tensor_raw) loads through the same
    params_from_gguf path: every weight must equal the host-side
    dequantization of the exact raw blocks (llama.cpp loads such files
    via ggml dequant; reference examples/talk-llama runs q4/q8 models)."""

    def test_quantized_tensors_roundtrip(self, tmp_path):
        from open_whisper_kit_tpu.io import quant as Q
        from open_whisper_kit_tpu.io.ggml_writer import _encode_tensor

        t = TINY
        S, F, V = t["embd"], t["ff"], t["vocab"]
        kvd = t["heads_kv"] * (S // t["heads"])
        rng = np.random.default_rng(7)
        r = lambda *sh: (rng.standard_normal(sh)
                         / np.sqrt(sh[-1])).astype(np.float32)

        path = tmp_path / "tiny-q.gguf"
        w = GGUFWriter(path)
        w.add_string("general.architecture", "llama")
        w.add_uint32("llama.embedding_length", S)
        w.add_uint32("llama.block_count", 1)
        w.add_uint32("llama.attention.head_count", t["heads"])
        w.add_uint32("llama.attention.head_count_kv", t["heads_kv"])
        w.add_uint32("llama.feed_forward_length", F)
        w.add_uint32("llama.context_length", t["ctx"])
        w.add_uint32("llama.vocab_size", V)
        w.add_float32("llama.rope.freq_base", 10000.0)
        w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
        tokens, scores, ttype = _spm_vocab_lists()
        pad = V - len(tokens)
        w.add_string("tokenizer.ggml.model", "llama")
        w.add_array("tokenizer.ggml.tokens",
                    tokens + [f"<extra{i}>" for i in range(pad)])
        w.add_array("tokenizer.ggml.scores",
                    np.asarray(scores + [0.0] * pad, np.float32))
        w.add_array("tokenizer.ggml.token_type",
                    np.asarray(ttype + [1] * pad, np.int32))

        # per-tensor ggml type, mirroring a llama.cpp Q4_K_M-style mix
        plan = {
            "token_embd.weight": (r(V, S), Q.GGML_TYPE_Q8_0),
            "output_norm.weight": (np.abs(r(S)) + 0.5, Q.GGML_TYPE_F32),
            "output.weight": (r(V, S), Q.GGML_TYPE_Q6_K),
            "blk.0.attn_norm.weight": (np.abs(r(S)) + 0.5, Q.GGML_TYPE_F32),
            "blk.0.attn_q.weight": (r(S, S), Q.GGML_TYPE_Q4_0),
            "blk.0.attn_k.weight": (r(kvd, S), Q.GGML_TYPE_Q4_K),
            "blk.0.attn_v.weight": (r(kvd, S), Q.GGML_TYPE_Q8_0),
            "blk.0.attn_output.weight": (r(S, S), Q.GGML_TYPE_Q4_0),
            "blk.0.ffn_norm.weight": (np.abs(r(S)) + 0.5, Q.GGML_TYPE_F32),
            "blk.0.ffn_gate.weight": (r(F, S), Q.GGML_TYPE_Q4_K),
            "blk.0.ffn_up.weight": (r(F, S), Q.GGML_TYPE_Q8_0),
            "blk.0.ffn_down.weight": (r(S, F), Q.GGML_TYPE_Q6_K),
        }
        raws = {}
        for name, (data, ttyp) in plan.items():
            if ttyp == Q.GGML_TYPE_F32:
                w.add_tensor(name, data)
            else:
                raw = _encode_tensor(data, ttyp)
                raws[name] = (raw, ttyp, data.shape)
                w.add_tensor_raw(name, raw, data.shape, ttyp)
        w.write()

        gf = load_gguf(path)
        # every quantized tensor dequantizes to exactly the host dequant
        # of the raw blocks we wrote (same code path llama.cpp validates
        # block-by-block)
        for name, (raw, ttyp, shape) in raws.items():
            got = gf.tensors[name].to_float()
            want = Q.dequantize(raw, ttyp, int(np.prod(shape)))
            np.testing.assert_array_equal(
                got.reshape(-1), want, err_msg=name)
            assert gf.tensors[name].ggml_type == ttyp

        # and the model builds + runs from it
        cfg, params = LM.params_from_gguf(gf, dtype=jnp.float32)
        assert cfg.n_layer == 1
        kk, kv = LM.init_kv_cache(cfg, 1, 16, jnp.float32)
        logits, _, _ = LM.forward(
            cfg, params, jnp.asarray([[1, 5, 9]], jnp.int32), kk, kv,
            jnp.asarray(0, jnp.int32))
        assert np.isfinite(np.asarray(logits)).all()

        # quant error itself is bounded: q4_0 worst grid step ~ amax/7
        wq = np.asarray(params["blocks"]["wq"][0]).T      # (out, in) back
        orig = LM._unpermute_rope(
            Q.dequantize(*raws["blk.0.attn_q.weight"][:2],
                         S * S).reshape(S, S), cfg.n_head)
        np.testing.assert_allclose(wq, orig, atol=1e-6)


class TestHFOracle:
    """Independent numerics check: the same random weights through
    HuggingFace transformers' LlamaForCausalLM must produce the same
    logits (exercises RoPE layout, GQA, RMSNorm, SwiGLU and the
    HF->gguf q/k permutation)."""

    def test_logits_match_transformers(self, tmp_path):
        torch = pytest.importorskip("torch")
        tfm = pytest.importorskip("transformers")
        t = TINY
        hf_cfg = tfm.LlamaConfig(
            vocab_size=t["vocab"], hidden_size=t["embd"],
            intermediate_size=t["ff"], num_hidden_layers=t["layers"],
            num_attention_heads=t["heads"],
            num_key_value_heads=t["heads_kv"],
            max_position_embeddings=t["ctx"], rms_norm_eps=1e-5,
            rope_theta=10000.0, attention_bias=False, tie_word_embeddings=False)
        torch.manual_seed(0)
        hf = tfm.LlamaForCausalLM(hf_cfg).eval()

        # HF state_dict -> gguf tensors (convert_hf_to_gguf permute on q/k)
        def permute(wt, n_head):
            out, inn = wt.shape
            return (wt.reshape(n_head, 2, out // n_head // 2, inn)
                    .swapaxes(1, 2).reshape(out, inn))

        sd = {k: v.detach().numpy().astype(np.float32)
              for k, v in hf.state_dict().items()}
        path = tmp_path / "hf.gguf"
        w = GGUFWriter(path)
        w.add_string("general.architecture", "llama")
        w.add_uint32("llama.embedding_length", t["embd"])
        w.add_uint32("llama.block_count", t["layers"])
        w.add_uint32("llama.attention.head_count", t["heads"])
        w.add_uint32("llama.attention.head_count_kv", t["heads_kv"])
        w.add_uint32("llama.feed_forward_length", t["ff"])
        w.add_uint32("llama.context_length", t["ctx"])
        w.add_uint32("llama.vocab_size", t["vocab"])
        w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
        w.add_tensor("token_embd.weight", sd["model.embed_tokens.weight"])
        w.add_tensor("output_norm.weight", sd["model.norm.weight"])
        w.add_tensor("output.weight", sd["lm_head.weight"])
        for i in range(t["layers"]):
            hp, gp = f"model.layers.{i}.", f"blk.{i}."
            w.add_tensor(gp + "attn_norm.weight",
                         sd[hp + "input_layernorm.weight"])
            w.add_tensor(gp + "attn_q.weight",
                         permute(sd[hp + "self_attn.q_proj.weight"],
                                 t["heads"]))
            w.add_tensor(gp + "attn_k.weight",
                         permute(sd[hp + "self_attn.k_proj.weight"],
                                 t["heads_kv"]))
            w.add_tensor(gp + "attn_v.weight",
                         sd[hp + "self_attn.v_proj.weight"])
            w.add_tensor(gp + "attn_output.weight",
                         sd[hp + "self_attn.o_proj.weight"])
            w.add_tensor(gp + "ffn_norm.weight",
                         sd[hp + "post_attention_layernorm.weight"])
            w.add_tensor(gp + "ffn_gate.weight",
                         sd[hp + "mlp.gate_proj.weight"])
            w.add_tensor(gp + "ffn_up.weight", sd[hp + "mlp.up_proj.weight"])
            w.add_tensor(gp + "ffn_down.weight",
                         sd[hp + "mlp.down_proj.weight"])
        w.write()

        cfg, params = LM.params_from_gguf(load_gguf(path), dtype=jnp.float32)
        toks = [1, 17, 260, 263, 5, 300, 41]
        kk, kv = LM.init_kv_cache(cfg, 1, 32, jnp.float32)
        ours, _, _ = LM.forward(cfg, params,
                                jnp.asarray([toks], jnp.int32), kk, kv,
                                jnp.asarray(0, jnp.int32))
        with torch.no_grad():
            theirs = hf(torch.tensor([toks])).logits[0, -1].numpy()
        np.testing.assert_allclose(np.asarray(ours)[0], theirs,
                                   rtol=2e-4, atol=2e-4)


class TestTokenizer:
    @pytest.fixture(scope="class")
    def vocab(self):
        tokens, scores, ttype = _spm_vocab_lists()
        return LlamaVocab(model="llama", tokens=tokens,
                          scores=np.asarray(scores, np.float32),
                          token_type=np.asarray(ttype, np.int32))

    def test_merges_to_longest_pieces(self, vocab):
        ids = vocab.encode("hello world")
        texts = [vocab.tokens[i] for i in ids]
        assert texts == ["<s>", "▁hello", "▁world"]

    def test_roundtrip(self, vocab):
        for s in ["hello world", "the cat", "a hello", "cat cat cat"]:
            ids = vocab.encode(s)
            assert vocab.decode(ids) == s

    def test_byte_fallback(self, vocab):
        ids = vocab.encode("zq!", add_special=False)
        # no pieces for z/q/! -> byte tokens after the "▁" prefix piece
        assert all(vocab.token_type[i] == ATTR_BYTE for i in ids[1:])
        assert vocab.decode(ids) == "zq!"

    def test_utf8_bytes_roundtrip(self, vocab):
        s = "héllo ✓"
        assert vocab.decode(vocab.encode(s)) == s

    def test_special_token_parsing(self, vocab):
        ids = vocab.encode("hello</s>world", add_special=False,
                           parse_special=True)
        assert vocab.eos_id in ids
        # without parse_special, </s> is literal text
        ids2 = vocab.encode("hello</s>world", add_special=False,
                            parse_special=False)
        assert vocab.eos_id not in ids2

    def test_bos_prefix(self, vocab):
        assert vocab.encode("cat")[0] == vocab.bos_id
        assert vocab.encode("cat", add_special=False)[0] != vocab.bos_id

    def test_from_gguf_metadata(self, tiny_gguf):
        gf = load_gguf(tiny_gguf, load_tensors=False)
        v = LlamaVocab.from_gguf_metadata(gf.metadata)
        assert v.model == "llama" and v.bos_id == 1 and v.add_bos
        assert v.decode(v.encode("hello world")) == "hello world"


class TestGeneration:
    @pytest.fixture(scope="class")
    def ctx(self, tiny_gguf):
        return LM.LlamaContext(gguf_path=str(tiny_gguf), n_ctx=64,
                               dtype=jnp.float32)

    def test_chunk_matches_stepwise_greedy(self, ctx):
        cfg, params = ctx.cfg, ctx.params
        sp = LM.SampleParams(temp=0.0)
        kk, kv = LM.init_kv_cache(cfg, 1, 64, jnp.float32)
        prompt = [1, 263, 281]
        logits, kk, kv = LM.forward(cfg, params,
                                    jnp.asarray([prompt], jnp.int32),
                                    kk, kv, jnp.asarray(0, jnp.int32))
        # host stepwise greedy
        kk2, kv2 = jnp.copy(kk), jnp.copy(kv)
        want, tok, pos = [], None, len(prompt)
        cur = int(np.argmax(np.asarray(logits)[0]))
        for _ in range(6):
            want.append(cur)
            l, kk2, kv2 = LM.forward(cfg, params,
                                     jnp.asarray([[cur]], jnp.int32),
                                     kk2, kv2, jnp.asarray(pos, jnp.int32))
            pos += 1
            cur = int(np.argmax(np.asarray(l)[0]))
        # fused chunk from the same state: feeds last prompt token's argmax
        toks, n_valid, _, _ = LM.generate_chunk(
            cfg, params, jnp.asarray(want[0]), jnp.asarray(len(prompt)),
            kk, kv, 5, sp, jax.random.PRNGKey(0), eos_id=2)
        got = [want[0]] + [int(x) for x in np.asarray(toks)[:int(n_valid)]]
        assert got[:6] == want[:6] or 2 in got  # identical until eos

    def test_eos_stops_generation(self, ctx):
        cfg, params = ctx.cfg, ctx.params
        kk, kv = LM.init_kv_cache(cfg, 1, 64, jnp.float32)
        toks, n_valid, _, _ = LM.generate_chunk(
            cfg, params, jnp.asarray(5), jnp.asarray(0), kk, kv, 8,
            LM.SampleParams(temp=0.0), jax.random.PRNGKey(0),
            eos_id=int(np.asarray(jnp.argmax(jnp.zeros(1)))) + 10**9)
        assert int(n_valid) == 8  # eos never sampled -> full chunk

    def test_context_generate_with_antiprompt(self, ctx):
        ctx.reset()
        sp = LM.SampleParams(temp=0.0)
        text = ctx.generate(ctx.vocab.encode(" the cat"), sp,
                            max_tokens=12, antiprompts=[], chunk=4)
        assert isinstance(text, str)
        # antiprompt truncation: stub via a known substring of the output
        if len(text) >= 2:
            probe = text[: max(1, len(text) // 2)]
            ctx.reset()
            cut = ctx.generate(ctx.vocab.encode(" the cat"), sp,
                               max_tokens=12, antiprompts=[probe], chunk=4)
            assert probe not in cut

    def test_sampling_deterministic_per_seed(self, ctx):
        ctx.reset()
        sp = LM.SampleParams(temp=0.7, top_k=5)
        a = ctx.generate(ctx.vocab.encode(" hello"), sp, max_tokens=8,
                         seed=3)
        ctx.reset()
        b = ctx.generate(ctx.vocab.encode(" hello"), sp, max_tokens=8,
                         seed=3)
        assert a == b


class TestSampler:
    def test_greedy(self):
        logits = jnp.asarray([0.1, 2.0, -1.0, 1.0])
        t = LM.sample_token(logits, LM.SampleParams(temp=0.0),
                            jax.random.PRNGKey(0))
        assert int(t) == 1

    def test_top_k_restricts(self):
        logits = jnp.asarray([10.0, 9.0, -50.0, -50.0, -50.0, -50.0])
        sp = LM.SampleParams(temp=1.0, top_k=2, top_p=1.0, min_p=0.0)
        draws = {int(LM.sample_token(logits, sp, jax.random.PRNGKey(s)))
                 for s in range(20)}
        assert draws <= {0, 1}

    def test_top_p_cuts_tail(self):
        logits = jnp.log(jnp.asarray([0.70, 0.15, 0.10, 0.05]))
        sp = LM.SampleParams(temp=1.0, top_k=4, top_p=0.5, min_p=0.0)
        draws = {int(LM.sample_token(logits, sp, jax.random.PRNGKey(s)))
                 for s in range(30)}
        assert draws == {0}

    def test_min_p_cuts_tail(self):
        logits = jnp.log(jnp.asarray([0.9, 0.05, 0.03, 0.02]))
        sp = LM.SampleParams(temp=1.0, top_k=4, top_p=1.0, min_p=0.2)
        draws = {int(LM.sample_token(logits, sp, jax.random.PRNGKey(s)))
                 for s in range(30)}
        assert draws == {0}


class TestTalkExample:
    def test_similarity(self):
        import examples.talk as T
        assert T.similarity("hello", "hello") == 1.0
        assert T.similarity("", "") == 1.0
        assert 0.5 < T.similarity("hey llama", "hey lama") < 1.0
        assert T.similarity("abc", "xyz") <= 0.0 + 1e-9

    def test_clean_heard(self):
        import examples.talk as T
        assert T.clean_heard(" [noise] Hello, world! (laughs)\nmore") \
            == "Hello, world!"
        assert T.clean_heard("abc #$% def") == "abc  def".replace("  ", " ") \
            or T.clean_heard("abc #$% def") == "abc  def"

    def test_prompt_substitution(self):
        import examples.talk as T
        p = (T.K_PROMPT_LLAMA.replace("{0}", "Alice").replace("{1}", "Bot")
             .replace("{2}", "12:00").replace("{3}", "2026")
             .replace("{4}", ":"))
        assert "{" not in p and "Alice:" in p and "Bot:" in p

    def test_end_to_end_replay(self, tiny_gguf, tmp_path):
        """Full voice-chat turn offline: stub whisper checkpoint + tiny
        llama + synthetic wav through examples/talk.py main()."""
        from pathlib import Path as P
        import wave

        from open_whisper_kit_tpu.io import quant
        from open_whisper_kit_tpu.io.ggml_whisper import load_checkpoint
        from open_whisper_kit_tpu.io.ggml_writer import (
            random_reference_tensors, write_checkpoint)

        stub = P("/root/reference/models/for-tests-ggml-tiny.en.bin")
        if not stub.exists():
            pytest.skip("reference stub model not available")
        ck = load_checkpoint(stub)
        wpath = tmp_path / "random-tiny.en.bin"
        write_checkpoint(wpath, ck.hparams, ck.mel_filters, ck.tokens,
                         random_reference_tensors(ck.hparams, seed=7),
                         wtype=quant.GGML_TYPE_F16)

        wav = tmp_path / "in.wav"
        t = np.arange(16000 * 2) / 16000.0
        pcm = (0.3 * np.sin(2 * np.pi * 440 * t)
               * (np.abs(np.sin(2 * np.pi * 3 * t)) > 0.5)).astype(
            np.float32)
        with wave.open(str(wav), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((pcm * 32767).astype(np.int16).tobytes())

        prompt = tmp_path / "prompt.txt"
        prompt.write_text("{0} talks to {1}.\n{0}{4} hello\n{1}{4} hello\n"
                          "{0}{4}")

        import examples.talk as T
        out = tmp_path / "chat.txt"
        session = tmp_path / "talk.session"
        base = ["-mw", str(wpath), "-ml", str(tiny_gguf),
                "--input-wav", str(wav), "--temp", "0",
                "--reply-tokens", "6", "--max-turns", "1",
                "--prompt-file", str(prompt)]
        rc = T.main(base + ["-f", str(out), "--session", str(session)])
        assert rc == 0
        assert session.exists()   # LLM state snapshot written

        # second run restores the session instead of re-evaluating
        rc = T.main(base + ["--session", str(session)])
        assert rc == 0


def test_gpt2_pretokenizer_matches_unicode_regex():
    """The hand-rolled GPT-2 pre-tokenizer scanner (stdlib-only) must match
    the actual Unicode regex (llama-vocab.cpp gpt2 regex_exprs) on text
    with contractions, numbers, punctuation runs, and whitespace shapes."""
    regex = pytest.importorskip("regex")
    from open_whisper_kit_tpu.models.llama.tokenizer import _gpt2_split
    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
    cases = [
        "Hello world", "don't stop me now!", "a  b   c", "  leading",
        "trailing  ", "x1y2z3 42 3.14", "naïve café ÜBER", "!!!'s wow",
        "it's we're I'll you'd", "tab\tnewline\n mix \t\n end", "", " ",
        "   ", "ai发布了新模型123abc", "price: $9.99 (50% off)", "'s lone",
        "CamelCase snake_case", "a b",
    ]
    rng = np.random.default_rng(0)
    alphabet = list("ab '!9\t\n.火Ж") + ["'s", "'ll", "  "]
    for _ in range(200):
        cases.append("".join(rng.choice(alphabet)
                             for _ in range(int(rng.integers(0, 30)))))
    for t in cases:
        assert pat.findall(t) == _gpt2_split(t), repr(t)
