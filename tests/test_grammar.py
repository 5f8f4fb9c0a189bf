"""GBNF grammar engine tests: parsing, matching, rejection, pipeline."""

import numpy as np
import pytest

from open_whisper_kit_tpu.decode import grammar as G


class FakeVocab:
    """Minimal vocab for rejection tests."""

    def __init__(self, tokens: list[bytes]):
        self.id_to_token = tokens
        self.token_eot = len(tokens)
        self.n_vocab = len(tokens) + 4


class TestParser:
    def test_literal(self):
        rules, root = G.parse_gbnf('root ::= "ab"')
        r = rules[root]
        assert r[0] == (G.CHAR, ord("a"))
        assert r[1] == (G.CHAR, ord("b"))
        assert r[-1] == (G.END, 0)

    def test_alternates(self):
        rules, root = G.parse_gbnf('root ::= "a" | "b"')
        types = [e[0] for e in rules[root]]
        assert G.ALT in types

    def test_char_class(self):
        rules, root = G.parse_gbnf("root ::= [a-z0-9]")
        r = rules[root]
        assert r[0] == (G.CHAR, ord("a"))
        assert r[1] == (G.CHAR_RNG_UPPER, ord("z"))
        assert r[2] == (G.CHAR_ALT, ord("0"))
        assert r[3] == (G.CHAR_RNG_UPPER, ord("9"))

    def test_negated_class(self):
        rules, root = G.parse_gbnf("root ::= [^x]")
        assert rules[root][0] == (G.CHAR_NOT, ord("x"))

    def test_rule_ref(self):
        rules, root = G.parse_gbnf('root ::= digit digit\ndigit ::= [0-9]')
        assert rules[root][0][0] == G.RULE_REF

    def test_repetition(self):
        rules, root = G.parse_gbnf('root ::= "a"*')
        # star synthesizes a sub-rule
        assert rules[root][0][0] == G.RULE_REF

    def test_escapes(self):
        rules, root = G.parse_gbnf(r'root ::= "\n\t\\"')
        vals = [e[1] for e in rules[root][:3]]
        assert vals == [10, 9, ord("\\")]

    def test_missing_root(self):
        with pytest.raises(G.GBNFError):
            G.parse_gbnf('foo ::= "a"')


class TestMatcher:
    def _accepts(self, gbnf: str, text: str) -> bool:
        g = G.Grammar.from_gbnf(gbnf)
        for ch in text:
            before = list(g.stacks)
            g.accept_char(ord(ch))
            if not g.stacks:
                return False
        # fully matched iff some stack is empty
        return any(len(s) == 0 for s in g.stacks)

    def test_literal_sequence(self):
        assert self._accepts('root ::= "abc"', "abc")
        assert not self._accepts('root ::= "abc"', "abd")
        assert not self._accepts('root ::= "abc"', "ab")

    def test_alternates(self):
        g = 'root ::= "yes" | "no"'
        assert self._accepts(g, "yes")
        assert self._accepts(g, "no")
        assert not self._accepts(g, "maybe")

    def test_star(self):
        g = 'root ::= "a"* "b"'
        assert self._accepts(g, "b")
        assert self._accepts(g, "aaab")
        assert not self._accepts(g, "aac")

    def test_plus(self):
        g = 'root ::= [0-9]+'
        assert self._accepts(g, "1")
        assert self._accepts(g, "123")
        assert not self._accepts(g, "")

    def test_optional(self):
        g = 'root ::= "-"? [0-9]'
        assert self._accepts(g, "5")
        assert self._accepts(g, "-5")

    def test_nested_rules(self):
        g = 'root ::= word " " word\nword ::= [a-z]+'
        assert self._accepts(g, "ab cd")
        assert not self._accepts(g, "ab  cd")


class TestRejection:
    def test_reject_invalid_tokens(self):
        vocab = FakeVocab([b"yes", b"no", b"maybe", b"y", b"es"])
        g = G.Grammar.from_gbnf('root ::= "yes" | "no"')
        rejected = set(g.rejected_tokens(vocab))
        assert 2 in rejected        # "maybe"
        assert 0 not in rejected    # "yes"
        assert 1 not in rejected    # "no"
        assert 3 not in rejected    # "y" is a valid prefix
        assert 4 in rejected        # "es" cannot start

    def test_reject_after_accept(self):
        vocab = FakeVocab([b"yes", b"no", b"y", b"es"])
        g = G.Grammar.from_gbnf('root ::= "yes" | "no"')
        g.accept_token(b"y")
        rejected = set(g.rejected_tokens(vocab))
        assert 1 in rejected        # "no" impossible now
        assert 3 not in rejected    # "es" completes "yes"

    def test_penalty_mask(self):
        vocab = FakeVocab([b"yes", b"xx"])
        g = G.Grammar.from_gbnf('root ::= "yes"')
        mask = g.penalty_mask(vocab, 100.0)
        assert mask[0] == 0.0
        assert mask[1] == -100.0

    def test_utf8_partial(self):
        # multi-byte char split across tokens
        euro = "€".encode("utf-8")   # 3 bytes
        vocab = FakeVocab([euro[:1], euro[1:], b"x"])
        g = G.Grammar.from_gbnf('root ::= "€"')
        rejected = set(g.rejected_tokens(vocab))
        assert 0 not in rejected     # first byte of € is a valid partial
        assert 2 in rejected
        g.accept_token(euro[:1])
        rejected = set(g.rejected_tokens(vocab))
        assert 1 not in rejected     # completion bytes accepted


def test_pipeline_with_grammar():
    """Grammar forces the host loop; transcription still terminates."""
    import jax.numpy as jnp
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams

    ctx = F.WhisperContext.from_preset("tiny.en", dtype=jnp.float32)
    p = FullParams(print_progress=False,
                   grammar_rules='root ::= [a-z<>0-9]*')
    p.greedy.best_of = 1
    p.temperature_inc = 0
    audio = (np.random.default_rng(11).standard_normal(16000)
             .astype(np.float32) * 0.1)
    res = F.whisper_full(ctx, p, audio)
    assert res.timings.n_encode >= 1


# -- device-loop grammar (token DFA) ------------------------------------------

class TestGrammarDeviceLoop:
    def test_dfa_masks_match_host_rejection(self):
        """Every DFA state's penalty row equals the host penalty_mask of
        the grammar object that state was built from."""
        from open_whisper_kit_tpu.decode.full import WhisperContext
        import jax.numpy as jnp
        import pathlib
        stub = pathlib.Path("/root/reference/models/for-tests-ggml-tiny.en.bin")
        if not stub.exists():
            pytest.skip("reference stub model not available")
        ctx = WhisperContext.from_file(str(stub), dtype=jnp.float32)
        g = G.Grammar.from_gbnf('root ::= "<" move ">"\nmove ::= [a-h] [1-8]')
        dfa = G.build_token_dfa(g.copy(), ctx.vocab)
        assert dfa is not None and dfa.n_states >= 3

        # walk the host grammar along an accepted path, comparing masks
        from open_whisper_kit_tpu.decode.device_loop import (
            GrammarOps, grammar_mask_row, grammar_step)
        ops = GrammarOps.from_dfa(dfa, 100.0)
        host = g.copy()
        state = jnp.int32(0)
        vocab = ctx.vocab
        for step_tok in [b"<", b"a", b"4", b">"]:
            want = host.penalty_mask(vocab, 100.0)
            got = np.asarray(grammar_mask_row(ops, state))
            np.testing.assert_array_equal(got, want)
            # find the token id for this byte string and advance both
            tid = next(t for t in range(vocab.token_eot)
                       if vocab.id_to_token[t] == step_tok)
            host.accept_token(step_tok)
            state = grammar_step(ops, state, jnp.int32(tid))
        # completed grammar: host stacks empty-equivalent; both allow all
        np.testing.assert_array_equal(
            np.asarray(grammar_mask_row(ops, state)),
            host.penalty_mask(vocab, 100.0))

    def test_device_grammar_decode_matches_host(self):
        """whisper_full with a grammar: fused-loop (DFA) tokens must equal
        the host-stepped loop's token-for-token."""
        from open_whisper_kit_tpu.decode.full import WhisperContext, whisper_full
        from open_whisper_kit_tpu.decode.params import FullParams
        import jax.numpy as jnp
        ctx = WhisperContext.from_preset("tiny.en", dtype=jnp.float32)
        audio = (np.random.default_rng(5).standard_normal(16000 * 2)
                 .astype(np.float32) * 0.1)
        # from_preset's synthetic vocab is b"<0>".."<51863>" single tokens
        gbnf = 'root ::= "<14444>" | "<2>" | "<777>" "<8>"'

        def run(device):
            p = FullParams(print_progress=False, grammar_rules=gbnf,
                           grammar_penalty=100.0,
                           use_device_loops=device)
            p.greedy.best_of = 1
            p.temperature_inc = 0
            return whisper_full(ctx, p, audio)

        res_dev = run(True)
        res_host = run(False)
        toks_dev = [[t.id for t in s.tokens] for s in res_dev.segments]
        toks_host = [[t.id for t in s.tokens] for s in res_host.segments]
        assert toks_dev == toks_host
        assert [s.text for s in res_dev.segments] == \
               [s.text for s in res_host.segments]

    def test_oversized_grammar_falls_back(self):
        """A grammar over the state/transition budget returns None."""
        from open_whisper_kit_tpu.decode.full import WhisperContext
        import jax.numpy as jnp
        import pathlib
        stub = pathlib.Path("/root/reference/models/for-tests-ggml-tiny.en.bin")
        if not stub.exists():
            pytest.skip("reference stub model not available")
        ctx = WhisperContext.from_file(str(stub), dtype=jnp.float32)
        g = G.Grammar.from_gbnf('root ::= [a-z]*')
        assert G.build_token_dfa(g, ctx.vocab, max_states=4,
                                 max_transitions=100) is None
