"""Speaker-attributed transcription: ASR + diarization + alignment.

The Swift SDK's headline flow (OpenWhisperKit.transcribe + SortFormerContext
+ DiarizationAligner, Sources/OpenWhisperKit/) as a script:

    python examples/diarized_transcript.py \
        -m ggml-large-v3-turbo.bin -dm sortformer.gguf meeting.wav

Prints an utterance-grouped "[speaker_N]: text" transcript and writes a
sidecar RTTM.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("-m", "--model", required=True, help="whisper ggml-bin")
    ap.add_argument("-dm", "--diarize-model", required=True,
                    help="sortformer GGUF")
    ap.add_argument("--preset", default="3s",
                    choices=["low_latency", "2s", "3s", "5s"])
    ap.add_argument("--language", default="en")
    ap.add_argument("--rttm-out", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from open_whisper_kit_tpu import api
    from open_whisper_kit_tpu.align.rttm import to_rttm
    from open_whisper_kit_tpu.decode.params import FullParams

    # 1) transcribe with word timestamps
    tr = api.Transcriber(model_path=args.model, dtype=jnp.bfloat16)
    params = FullParams(language=args.language, token_timestamps=True)
    result = tr.transcribe(args.audio, params)
    words = api.words_from_result(result, tr.ctx.vocab)

    # 2) diarize (device-resident AOSC when on an accelerator)
    dz = api.Diarizer(model_path=args.diarize_model)
    _probs, segments = dz.diarize(args.audio, stream_config=args.preset)

    # 3) align words to speakers, group into utterances
    diarized = api.align(words, segments)
    for utt in diarized.segments:
        print(f"[{utt.speaker}] {utt.start:7.2f}-{utt.end:7.2f}: {utt.text}")

    rttm_path = args.rttm_out or (str(Path(args.audio).with_suffix(".rttm")))
    Path(rttm_path).write_text(to_rttm(segments))
    print(f"\nwrote {rttm_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
