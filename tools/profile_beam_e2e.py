#!/usr/bin/env python3
"""Component breakdown for the beam-5 quality-mode e2e pipeline.

VERDICT round-2 ask #5: `e2e_whisper_full_beam5_int4_rtf >= 73` (the
reference's derived M2-Ultra FA=1 RTF, BASELINE.md) *or a measured
breakdown showing where the time goes*.  This prints that breakdown:
whisper_full (beam_size=5, megakernel int4, large-v3-turbo random
weights) over 120 s of synthetic audio, reporting wall RTF plus the
Timings buckets (mel / encode / decode / sample) and the residual
(host-side rule + segment work between device dispatches).

Optionally writes a TensorBoard trace of the second (warm) run:
    python tools/profile_beam_e2e.py --trace /tmp/beam_trace
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of the warm run")
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--seconds", type=int, default=120)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--megakernel", default="int4",
                    choices=["int4", "int8", "off"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (logic check only)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams, SamplingStrategy
    from open_whisper_kit_tpu.utils import cache as C

    C.enable_compile_cache()
    ctx = F.WhisperContext.from_preset(args.model, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * args.seconds)
             .astype(np.float32) * 0.1)

    p = FullParams(print_progress=False)
    p.beam_search.beam_size = args.beam
    p.strategy = SamplingStrategy.BEAM_SEARCH
    p.temperature_inc = 0  # no fallback ladder: measure the beam path alone
    if args.megakernel != "off":
        p.megakernel = args.megakernel

    def run():
        t0 = time.perf_counter()
        res = F.whisper_full(ctx, p, audio)
        wall = time.perf_counter() - t0
        return res, wall

    print(f"== cold run ({args.model}, beam={args.beam}, "
          f"megakernel={p.megakernel}) ==", flush=True)
    res, wall = run()
    print(f"cold wall {wall:.1f} s (includes compile)")

    if args.trace:
        jax.profiler.start_trace(args.trace)
    print("== warm run ==", flush=True)
    res, wall = run()
    if args.trace:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")

    tm = res.timings
    dev_ms = tm.t_mel_ms + tm.t_encode_ms + tm.t_decode_ms + tm.t_sample_ms
    host_ms = wall * 1e3 - dev_ms
    rtf = args.seconds / wall
    print(f"warm wall      {wall * 1e3:10.1f} ms   RTF {rtf:.1f}x "
          f"(target >= 73x)")
    print(f"  mel          {tm.t_mel_ms:10.1f} ms")
    print(f"  encode       {tm.t_encode_ms:10.1f} ms   ({tm.n_encode} windows)")
    print(f"  decode       {tm.t_decode_ms:10.1f} ms   ({tm.n_decode} fwd, "
          f"{tm.t_decode_ms / max(1, tm.n_decode):.3f} ms/fwd)")
    print(f"  sample       {tm.t_sample_ms:10.1f} ms   ({tm.n_sample} draws)")
    print(f"  host residual{host_ms:10.1f} ms   (rules/segments/dispatch gaps"
          f" = wall - device buckets)")
    print(f"  segments     {len(res.segments)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
