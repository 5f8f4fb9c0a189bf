"""Unit tests for the vectorized logit rule-set (whisper.cpp:6177-6445)."""

import numpy as np
import jax.numpy as jnp

from open_whisper_kit_tpu.decode import logit_rules as LR
from open_whisper_kit_tpu.decode import tokenizer as T
from open_whisper_kit_tpu.io import ggml_whisper


def _vocab(ref_models):
    ck = ggml_whisper.load_checkpoint(
        ref_models / "for-tests-ggml-tiny.en.bin", load_tensors=False)
    return T.build_vocab(ck.tokens, ck.hparams.n_vocab)


def _state(B=1, **kw):
    d = dict(is_initial=[False] * B, last_was_ts=[False] * B,
             penult_was_ts=[True] * B, has_ts=[False] * B, ts_min=[0] * B)
    d.update({k: v if isinstance(v, list) else [v] for k, v in kw.items()})
    return LR.BeamState(*[jnp.asarray(np.asarray(d[k]))
                          for k in ("is_initial", "last_was_ts",
                                    "penult_was_ts", "has_ts", "ts_min")])


def _apply(vocab, logits, st, temperature=0.0, **mask_kw):
    base, init = LR.build_static_masks(vocab, **mask_kw)
    rc = LR.RuleConfig(vocab.n_vocab, vocab.token_eot, vocab.token_beg)
    return LR.apply_rules(rc, jnp.asarray(logits), jnp.asarray(base),
                          jnp.asarray(init), st, jnp.float32(temperature))


def test_special_tokens_always_suppressed(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    fl, _, probs = _apply(v, logits, _state())
    fl = np.asarray(fl)[0]
    for tid in (v.token_not, v.token_sot, v.token_nosp, v.token_solm,
                v.token_translate, v.token_transcribe, v.token_prev):
        assert fl[tid] == -np.inf, tid


def test_blank_suppression_initial_only(ref_models):
    v = _vocab(ref_models)
    space = v.token_to_id[b" "]
    logits = np.zeros((1, v.n_vocab), np.float32)
    logits[0, :1000] = 10.0
    fl_init = np.asarray(_apply(v, logits, _state(is_initial=True))[0])[0]
    assert fl_init[space] == -np.inf and fl_init[v.token_eot] == -np.inf
    fl_later = np.asarray(_apply(v, logits, _state(is_initial=False))[0])[0]
    assert np.isfinite(fl_later[space])


def test_max_initial_ts_cap(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    fl = np.asarray(_apply(v, logits, _state(is_initial=True),
                           max_initial_ts=1.0)[0])[0]
    # precision 30/1500 = 0.02 s -> tid0 = 50: beg+51.. suppressed
    assert np.isfinite(fl[v.token_beg + 50])
    assert fl[v.token_beg + 51] == -np.inf


def test_timestamp_pair_rules(ref_models):
    v = _vocab(ref_models)
    base_logits = np.zeros((1, v.n_vocab), np.float32)
    # text tokens stay finite so the ts-sum rule doesn't kick in
    base_logits[0, :100] = 5.0

    # last was ts, penult not -> text suppressed (force second ts)
    fl = np.asarray(_apply(v, base_logits,
                           _state(last_was_ts=True, penult_was_ts=False))[0])[0]
    assert fl[50] == -np.inf
    assert np.isfinite(fl[v.token_beg + 10])

    # last and penult were ts -> timestamps suppressed
    fl = np.asarray(_apply(v, base_logits,
                           _state(last_was_ts=True, penult_was_ts=True))[0])[0]
    assert fl[v.token_beg + 10] == -np.inf
    assert np.isfinite(fl[50])


def test_monotonic_timestamps(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    logits[0, :100] = 5.0
    ts_min = v.token_beg + 40
    fl = np.asarray(_apply(v, logits, _state(has_ts=True, ts_min=ts_min))[0])[0]
    assert fl[v.token_beg + 39] == -np.inf
    assert np.isfinite(fl[v.token_beg + 40])


def test_timestamp_sum_rule_forces_ts(ref_models):
    """When timestamp mass beats the best text token, text is killed."""
    v = _vocab(ref_models)
    logits = np.full((1, v.n_vocab), -10.0, np.float32)
    logits[0, v.token_beg:] = 2.0   # heavy timestamp mass
    logits[0, 100] = 3.0            # best text token, but logsumexp(ts) wins
    fl, lp, probs = _apply(v, logits, _state())
    fl = np.asarray(fl)[0]
    assert fl[100] == -np.inf
    assert np.isfinite(fl[v.token_beg + 5])
    # pt/ptsum aggregates stay meaningful
    rc = LR.RuleConfig(v.n_vocab, v.token_eot, v.token_beg)
    pt, ptsum, tid = (np.asarray(x) for x in LR.ts_aggregates(rc, probs))
    assert 0 < pt[0] <= 1.0 and ptsum[0] > 0.9


def test_temperature_scales(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    logits[0, :100] = 10.0   # keep text dominant so the ts-sum rule is off
    logits[0, 10] = 14.0
    _, _, p1 = _apply(v, logits, _state(), temperature=0.0)
    _, _, p2 = _apply(v, logits, _state(), temperature=2.0)
    # higher temperature flattens the distribution
    assert float(p2[0, 10]) < float(p1[0, 10])


def test_suppress_nst(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    logits[0, :1000] = 10.0
    fl = np.asarray(_apply(v, logits, _state(), suppress_nst=True)[0])[0]
    for s in ("(", " (", "[", "♪"):
        tid = v.token_to_id.get(s.encode())
        if tid is not None:
            assert fl[tid] == -np.inf, s


def test_suppress_regex(ref_models):
    v = _vocab(ref_models)
    logits = np.zeros((1, v.n_vocab), np.float32)
    logits[0, :1000] = 10.0
    fl = np.asarray(_apply(v, logits, _state(),
                           suppress_regex=r"[0-9]+")[0])[0]
    tid = v.token_to_id.get(b"1")
    assert tid is not None and fl[tid] == -np.inf
    tid_a = v.token_to_id.get(b"a")
    assert np.isfinite(fl[tid_a])
