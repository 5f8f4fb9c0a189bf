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
