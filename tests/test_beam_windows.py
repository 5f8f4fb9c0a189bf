"""Fused multi-window BEAM decode (device_windows.py beam mode).

VERDICT r4 #4: beam-5 e2e lagged greedy because every window paid 2-3
dispatches + a host best-beam rank. The beam branch of decode_windows
runs K windows AND the whisper_rank selection in ONE dispatch; these
tests pin it to the per-window driver it replaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from open_whisper_kit_tpu.decode import full as F
from open_whisper_kit_tpu.decode.params import (
    BeamSearchParams, FullParams, SamplingStrategy)


@pytest.fixture(scope="module")
def rand_ctx():
    return F.WhisperContext.from_preset("tiny", seed=3, dtype=jnp.float32)


def _beam_params(windows: int) -> FullParams:
    p = FullParams(strategy=SamplingStrategy.BEAM_SEARCH,
                   temperature=0.0, temperature_inc=-1.0,
                   beam_search=BeamSearchParams(beam_size=3),
                   print_progress=False)
    p.device_windows = windows
    return p


def _segs(res):
    return [(s.t0, s.t1, s.text) for s in res.segments]


def test_beam_windows_matches_per_window(rand_ctx):
    """Fused K-window beam loop == one-window-at-a-time beam driver
    (same cores, in-trace rank vs host rank)."""
    audio = np.random.default_rng(0).standard_normal(
        16000 * 40).astype(np.float32) * 0.1      # > 1 window
    res_fused = F.whisper_full(rand_ctx, _beam_params(8), audio)
    res_slow = F.whisper_full(rand_ctx, _beam_params(1), audio)
    assert _segs(res_fused) == _segs(res_slow)


def test_beam_windows_eligibility():
    ctx = F.WhisperContext.from_preset("tiny", seed=0, dtype=jnp.float32)
    p = _beam_params(8)
    assert F._multiwindow_eligible(ctx, p, [0.0], 0)
    p.ref_sampling = True
    assert not F._multiwindow_eligible(ctx, p, [0.0], 0)
    p2 = _beam_params(8)
    p2.beam_search.beam_size = 1
    assert not F._multiwindow_eligible(ctx, p2, [0.0], 0)


def test_beam_windows_stub_short_circuit():
    """Zero-weight stub context through the fused beam route: structured
    result, no crash (whisper.cpp:7426 short-circuit analog)."""
    import pathlib
    ref = pathlib.Path("/root/reference/models/for-tests-ggml-tiny.en.bin")
    if not ref.exists():
        pytest.skip("reference stub model not available")
    ctx = F.WhisperContext.from_file(str(ref), dtype=jnp.float32)
    audio = np.random.default_rng(1).standard_normal(
        16000 * 35).astype(np.float32) * 0.1
    res = F.whisper_full(ctx, _beam_params(8), audio)
    assert isinstance(res.segments, list)
