"""Model downloader (models/download-ggml-model.sh + download-vad-model.sh
equivalent).

Fetches whisper ggml checkpoints / the Silero VAD checkpoint from the
public Hugging Face mirrors used by the reference scripts.

Usage:
    python tools/download_models.py tiny.en [--dir models/]
    python tools/download_models.py --vad [--dir models/]
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

GGML_BASE = "https://huggingface.co/ggerganov/whisper.cpp/resolve/main"
VAD_BASE = "https://huggingface.co/ggml-org/whisper-vad/resolve/main"

MODELS = [
    "tiny", "tiny.en", "tiny-q5_1", "tiny.en-q5_1", "tiny-q8_0",
    "base", "base.en", "base-q5_1", "base.en-q5_1", "base-q8_0",
    "small", "small.en", "small.en-tdrz", "small-q5_1", "small.en-q5_1",
    "small-q8_0", "medium", "medium.en", "medium-q5_0", "medium.en-q5_0",
    "medium-q8_0", "large-v1", "large-v2", "large-v2-q5_0", "large-v2-q8_0",
    "large-v3", "large-v3-q5_0", "large-v3-turbo", "large-v3-turbo-q5_0",
    "large-v3-turbo-q8_0",
]


def fetch(url: str, dst: Path):
    print(f"downloading {url} -> {dst}")
    tmp = dst.with_suffix(dst.suffix + ".part")
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        total = int(r.headers.get("Content-Length", 0))
        done = 0
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if total:
                print(f"\r  {done / 1e6:.0f}/{total / 1e6:.0f} MB", end="")
    print()
    tmp.rename(dst)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", help=f"one of: {', '.join(MODELS)}")
    ap.add_argument("--vad", action="store_true",
                    help="download the Silero VAD checkpoint")
    ap.add_argument("--dir", default="models")
    args = ap.parse_args(argv)

    out_dir = Path(args.dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.vad:
        fetch(f"{VAD_BASE}/ggml-silero-v5.1.2.bin",
              out_dir / "ggml-silero-v5.1.2.bin")
        return 0
    if not args.model:
        print(f"available models: {', '.join(MODELS)}")
        return 1
    if args.model not in MODELS:
        print(f"unknown model '{args.model}'", file=sys.stderr)
        return 1
    fetch(f"{GGML_BASE}/ggml-{args.model}.bin",
          out_dir / f"ggml-{args.model}.bin")
    return 0


if __name__ == "__main__":
    sys.exit(main())
