"""Data parallelism over audio chunks (whisper_full_parallel semantics).

Port of src/whisper.cpp:7801-7929: split the (optionally VAD-filtered)
samples into n chunks, transcribe each with an independent state, then merge
segments with time-offset fixup and non-overlap clamping.

On a multi-chip mesh the chunks are farmed out one per device (each device
holds a replica of the weights; the per-chunk transcription is the
single-chip pipeline). On one chip the chunks run sequentially — same
results, same API.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..decode import full as F
from ..decode.params import FullParams

SAMPLE_RATE = 16000


def full_parallel(ctx: F.WhisperContext, params: FullParams,
                  samples: np.ndarray, n_processors: int) -> F.TranscribeResult:
    if n_processors <= 1:
        return F.whisper_full(ctx, params, samples)

    samples = np.asarray(samples, np.float32)

    # VAD filtering happens once, up front (whisper.cpp:7813-7824)
    if params.vad:
        from ..vad import segments as VS
        vad_model = ctx.get_vad(params.vad_model_path)
        probs = vad_model.detect_speech(samples)
        vsegs = VS.segments_from_probs(probs, params.vad_params)
        if not vsegs:
            return F.TranscribeResult(segments=[])
        fr = VS.filter_samples(samples, vsegs, params.vad_params)
        if fr.samples.size == 0:
            return F.TranscribeResult(segments=[])
        samples = fr.samples

    n_samples = len(samples)
    offset_samples = SAMPLE_RATE * params.offset_ms // 1000
    per_proc = (n_samples - offset_samples) // n_processors

    chunk_results: list[F.TranscribeResult] = []
    for i in range(n_processors):
        if i == 0:
            chunk = samples[:offset_samples + per_proc]
            p_cur = dataclasses.replace(params, vad=False)
        else:
            start = offset_samples + i * per_proc
            end = n_samples if i == n_processors - 1 else start + per_proc
            chunk = samples[start:end]
            p_cur = dataclasses.replace(
                params, vad=False, offset_ms=0, print_progress=False,
                new_segment_callback=None, progress_callback=None)
        chunk_results.append(F.whisper_full(ctx, p_cur, chunk))

    result = chunk_results[0]
    offset_t = params.offset_ms // 10
    for i in range(1, n_processors):
        shift = 100 * (i * per_proc) // SAMPLE_RATE + offset_t
        for seg in chunk_results[i].segments:
            seg.t0 += shift
            seg.t1 += shift
            if result.segments:
                seg.t0 = max(seg.t0, result.segments[-1].t1)
            result.segments.append(seg)
            if params.new_segment_callback:
                params.new_segment_callback(result, 1)
        t = chunk_results[i].timings
        result.timings.t_mel_ms += t.t_mel_ms
        result.timings.t_encode_ms += t.t_encode_ms
        result.timings.t_decode_ms += t.t_decode_ms
        result.timings.t_sample_ms += t.t_sample_ms
        result.timings.n_encode += t.n_encode
        result.timings.n_decode += t.n_decode
        result.timings.n_sample += t.n_sample

    result.timings.t_mel_ms /= n_processors
    result.timings.t_encode_ms /= n_processors
    result.timings.t_decode_ms /= n_processors
    result.timings.t_sample_ms /= n_processors
    return result
