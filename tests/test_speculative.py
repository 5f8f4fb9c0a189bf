"""Speculative greedy decoding (decode/device_speculative.py).

Output-equivalence is the whole contract: every emitted token is the
target model's own rule-filtered argmax, so transcripts must equal the
plain fused greedy loop's exactly — the draft only changes HOW MANY
target passes it takes to produce them.

Equality is up to XLA reduction-order ties between the T=1 and
T=gamma+1 decode shapes.  On degenerate random-weight checkpoints
(near-uniform distributions) such ties exist and the EXISTING greedy
paths already disagree among themselves there (device_windows=8 vs =0
vs host-stepped flip the same dropped-tail token); the speculative path
was verified to agree with the single-window and host paths in that
regime.  The seeds below have no ties and compare exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import open_whisper_kit_tpu.decode.full as F
from open_whisper_kit_tpu.decode.params import FullParams


def _segs(res):
    return [(s.t0, s.t1, [t.id for t in s.tokens]) for s in res.segments]


@pytest.fixture(scope="module")
def target_ctx():
    return F.WhisperContext.from_preset("tiny.en", seed=0, dtype=jnp.float32)


def test_speculative_equals_greedy_same_draft(target_ctx):
    """Draft == target: near-total acceptance, identical output."""
    ctx = target_ctx
    ctx.set_draft(F.WhisperContext.from_preset("tiny.en", seed=0,
                                               dtype=jnp.float32))
    rng = np.random.default_rng(7)
    samples = (0.1 * rng.standard_normal(16000 * 8)).astype(np.float32)

    try:
        r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False), samples)
        r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False,
                                            speculative=4), samples)
    finally:
        ctx.draft = None
    assert _segs(r0) == _segs(r1)
    # acceptance canary: draft numerics cannot change OUTPUT, so a bug in
    # the draft cache plumbing (e.g. a broken final ingest-only step) is
    # observable ONLY as an acceptance collapse. With draft == target the
    # verify argmax matches the draft's almost always (T=1-vs-T=γ+1
    # reduction ties are the residual), so acceptance must stay high.
    assert r1.timings.n_spec_accepted >= r1.timings.n_sample * 0.5, (
        r1.timings.n_spec_accepted, r1.timings.n_sample)


def test_speculative_equals_greedy_mismatched_draft(target_ctx):
    """Different draft weights: acceptance is incidental, output must
    still be identical (corrections dominate)."""
    ctx = target_ctx
    ctx.set_draft(F.WhisperContext.from_preset("tiny.en", seed=1,
                                               dtype=jnp.float32))
    rng = np.random.default_rng(5)
    samples = (0.1 * rng.standard_normal(16000 * 20)).astype(np.float32)

    try:
        r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False), samples)
        r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False,
                                            speculative=3), samples)
    finally:
        ctx.draft = None
    assert _segs(r0) == _segs(r1)


def test_speculative_mega_draft_equals_greedy(target_ctx):
    """Megakernel draft steps (interpret mode on CPU, int8 planes):
    the draft's numerics CANNOT change the transcript — every emitted
    token is the target's own rule-filtered argmax — so output must
    equal plain greedy even though the int8 draft proposes different
    tokens than its f32 XLA counterpart would."""
    from open_whisper_kit_tpu.ops.decode_megakernel import prepare_mega
    ctx = target_ctx
    draft = F.WhisperContext.from_preset("tiny.en", seed=1,
                                         dtype=jnp.float32)
    ctx.set_draft(draft)
    dmega = prepare_mega(draft.cfg, draft.params["decoder"], quant="all")
    draft.mega_params = lambda p, draft=False: dmega   # force-eligible
    rng = np.random.default_rng(11)
    samples = (0.1 * rng.standard_normal(16000 * 6)).astype(np.float32)
    try:
        r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False), samples)
        r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False,
                                            speculative=3), samples)
    finally:
        ctx.draft = None
    assert _segs(r0) == _segs(r1)


def test_speculative_mega_verify_equals_mega_greedy():
    """Full megakernel speculative pipeline (bf16 contexts,
    megakernel='int8' through the REAL policy): the verify kernel's
    per-row causal masking makes each row bit-identical to the greedy
    loop's single-token kernel, so transcripts must equal the mega
    greedy baseline exactly — even in bf16, where the XLA
    T=1-vs-T=gamma+1 comparison would be tie-prone."""
    ctx = F.WhisperContext.from_preset("tiny.en", seed=0,
                                       dtype=jnp.bfloat16)
    ctx.set_draft(F.WhisperContext.from_preset("tiny.en", seed=1,
                                               dtype=jnp.bfloat16))
    rng = np.random.default_rng(9)
    samples = (0.1 * rng.standard_normal(16000 * 6)).astype(np.float32)
    r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                        print_progress=False,
                                        megakernel="int8"), samples)
    r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                        print_progress=False,
                                        megakernel="int8",
                                        speculative=3), samples)
    assert _segs(r0) == _segs(r1)


def test_draft_mega_params_ignores_cross_kv_int8(target_ctx):
    """mega_params(draft=True): the draft's cross-KV is never int8-packed,
    so cross_kv_int8 must not disqualify the draft megakernel (it DOES
    disqualify the target's)."""
    ctx = F.WhisperContext.from_preset("tiny.en", seed=0,
                                       dtype=jnp.bfloat16)
    p = FullParams(megakernel="int8", cross_kv_int8=True)
    assert ctx.mega_params(p) is None
    assert ctx.mega_params(p, draft=True) is not None


def test_speculative_fused_windows_equals_per_window(target_ctx):
    """Speculative + multi-window fusion (decode_windows gamma>0, the
    default) vs the one-window-per-dispatch speculative driver
    (device_windows=0): identical output."""
    ctx = target_ctx
    ctx.set_draft(F.WhisperContext.from_preset("tiny.en", seed=1,
                                               dtype=jnp.float32))
    rng = np.random.default_rng(13)
    samples = (0.1 * rng.standard_normal(16000 * 20)).astype(np.float32)
    try:
        r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False,
                                            speculative=3,
                                            device_windows=0), samples)
        r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                            print_progress=False,
                                            speculative=3), samples)
    finally:
        ctx.draft = None
    assert _segs(r0) == _segs(r1)
    assert r1.timings.n_spec_accepted == r0.timings.n_spec_accepted


def test_speculative_without_draft_falls_back(target_ctx):
    """speculative>0 with no draft attached: plain greedy path, same
    output as speculative=0."""
    ctx = target_ctx
    assert ctx.draft is None
    rng = np.random.default_rng(3)
    samples = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)
    r0 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                        print_progress=False), samples)
    r1 = F.whisper_full(ctx, FullParams(temperature_inc=0.0,
                                        print_progress=False,
                                        speculative=4), samples)
    assert _segs(r0) == _segs(r1)


def test_set_draft_vocab_guard(target_ctx):
    """Mismatched vocab (multilingual tiny vs tiny.en) is rejected."""
    bad = F.WhisperContext.from_preset("tiny", seed=0, dtype=jnp.float32)
    if bad.vocab.n_vocab == target_ctx.vocab.n_vocab:
        pytest.skip("presets share a vocab size")
    with pytest.raises(ValueError):
        target_ctx.set_draft(bad)
