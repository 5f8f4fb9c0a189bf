"""DTW timestamp tests: algorithm invariants + pipeline integration."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.timestamps import dtw as D


class TestDtwBacktrace:
    def test_identity_diagonal(self):
        # strongly diagonal cost -> path follows the diagonal
        N = 6
        x = np.ones((N, N), np.float32)
        np.fill_diagonal(x, 0.0)
        path = D.dtw_backtrace(x)
        assert path.shape[0] == 2
        # path endpoints
        assert path[0, 0] == 0 and path[1, 0] == 0
        assert path[0, -1] == N - 1 and path[1, -1] == N - 1
        # monotonic, steps of at most 1
        assert (np.diff(path[0]) >= 0).all() and (np.diff(path[0]) <= 1).all()
        assert (np.diff(path[1]) >= 0).all() and (np.diff(path[1]) <= 1).all()

    def test_rect_matrix(self):
        rng = np.random.default_rng(0)
        x = rng.random((4, 10)).astype(np.float32)
        path = D.dtw_backtrace(x)
        assert path[0, -1] == 3 and path[1, -1] == 9
        # every token index appears
        assert set(path[0]) == set(range(4))

    def test_matches_bruteforce_cost(self):
        """Path cost from backtrace equals the DP minimum."""
        rng = np.random.default_rng(1)
        x = rng.random((5, 7)).astype(np.float32)
        path = D.dtw_backtrace(x)
        got = sum(x[i, j] for i, j in zip(*path))

        # full DP for the optimal cost
        N, M = x.shape
        cost = np.full((N + 1, M + 1), np.inf)
        cost[0, 0] = 0
        for i in range(1, N + 1):
            for j in range(1, M + 1):
                cost[i, j] = x[i - 1, j - 1] + min(
                    cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1])
        np.testing.assert_allclose(got, cost[N, M], rtol=1e-5)


def test_median_filter_reflect():
    x = np.asarray([[1.0, 2.0, 100.0, 3.0, 4.0]], np.float32)
    y = D.median_filter_reflect(x, 3)
    assert y.shape == x.shape
    assert y[0, 2] == 3.0  # spike removed
    # reflect edge: window of x[0] is [x[1], x[0], x[1]] = [2,1,2] -> 2
    assert y[0, 0] == 2.0


def test_alignment_head_presets():
    assert len(D.ALIGNMENT_HEADS["large-v3-turbo"]) == 6
    assert D.ALIGNMENT_HEADS["tiny.en"][0] == (1, 0)
    # fallback covers top half layers
    hs = D.heads_for_model("custom", n_text_layer=4, n_head=2)
    assert hs == [(2, 0), (2, 1), (3, 0), (3, 1)]


def test_pipeline_dtw_fills_t_dtw():
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams

    ctx = F.WhisperContext.from_preset("tiny.en", dtype=jnp.float32)
    p = FullParams(print_progress=False, dtw_token_timestamps=True)
    p.greedy.best_of = 1
    p.temperature_inc = 0
    audio = (np.random.default_rng(3).standard_normal(16000 * 2)
             .astype(np.float32) * 0.1)
    res = F.whisper_full(ctx, p, audio)
    text_toks = [t for s in res.segments for t in s.tokens
                 if t.id < ctx.vocab.token_eot]
    if text_toks:  # random model may emit none
        assert any(t.t_dtw >= 0 for t in text_toks)
        # t_dtw values are within the audio span and monotonic where set
        set_ts = [t.t_dtw for t in text_toks if t.t_dtw >= 0]
        assert all(0 <= v <= 3000 for v in set_ts)
        assert set_ts == sorted(set_ts)
