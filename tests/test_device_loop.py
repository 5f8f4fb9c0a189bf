"""Device-loop decoder must match the host-loop decoder token-for-token."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.decode import full as F
from open_whisper_kit_tpu.decode.params import FullParams


@pytest.fixture(scope="module")
def ctx():
    return F.WhisperContext.from_preset("tiny.en", dtype=jnp.float32)


def _run(ctx, audio, force_host):
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    if force_host:
        # a no-op logits filter forces the host path
        p.logits_filter_callback = lambda *a: None
    return F.whisper_full(ctx, p, audio)


def test_device_loop_matches_host_loop(ctx):
    audio = (np.random.default_rng(7).standard_normal(16000 * 2)
             .astype(np.float32) * 0.1)
    res_dev = _run(ctx, audio, force_host=False)
    res_host = _run(ctx, audio, force_host=True)

    toks_dev = [[t.id for t in s.tokens] for s in res_dev.segments]
    toks_host = [[t.id for t in s.tokens] for s in res_host.segments]
    assert toks_dev == toks_host
    assert [s.t0 for s in res_dev.segments] == [s.t0 for s in res_host.segments]
    assert [s.t1 for s in res_dev.segments] == [s.t1 for s in res_host.segments]

    for sd, sh in zip(res_dev.segments, res_host.segments):
        for td, th in zip(sd.tokens, sh.tokens):
            assert td.id == th.id and td.tid == th.tid
            np.testing.assert_allclose(td.p, th.p, atol=1e-4)
            np.testing.assert_allclose(td.plog, th.plog, atol=1e-3)
            np.testing.assert_allclose(td.ptsum, th.ptsum, atol=1e-4)


def test_device_beam_matches_host_beam(ctx):
    """Device beam search must match the host beam loop token-for-token."""
    from open_whisper_kit_tpu.decode.params import SamplingStrategy
    audio = (np.random.default_rng(13).standard_normal(16000 * 2)
             .astype(np.float32) * 0.1)

    def run(use_device):
        p = FullParams(strategy=SamplingStrategy.BEAM_SEARCH,
                       print_progress=False, use_device_loops=use_device)
        p.beam_search.beam_size = 3
        p.temperature_inc = 0
        return F.whisper_full(ctx, p, audio)

    res_dev = run(True)
    res_host = run(False)
    toks_dev = [[t.id for t in s.tokens] for s in res_dev.segments]
    toks_host = [[t.id for t in s.tokens] for s in res_host.segments]
    assert toks_dev == toks_host
    for sd, sh in zip(res_dev.segments, res_host.segments):
        assert (sd.t0, sd.t1) == (sh.t0, sh.t1)
        for td, th in zip(sd.tokens, sh.tokens):
            np.testing.assert_allclose(td.plog, th.plog, atol=1e-3)
