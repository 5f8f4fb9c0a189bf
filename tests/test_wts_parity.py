"""wts karaoke-script BYTE parity vs the reference whisper-cli binary.

Builds the reference's own CLI (cmake, cached in /tmp/owk_refbuild_cli),
runs it with -owts on a shared random-weight checkpoint, runs this
framework's CLI with the same flags, and requires the generated ffmpeg
scripts to be byte-identical — covering output_wts formatting
(cli.cpp:772-891), the -owts max_len=60 default (cli.cpp:1187), the
t_sec=(n+1000)/SR duration (cli.cpp:1293), C++ ostream %g float printing,
AND the energy-heuristic token-level timestamps feeding the enable windows
(whisper.cpp:8455-8680)."""

import shutil
import subprocess
from pathlib import Path

import pytest

from tests import test_ref_golden as TRG

CLI_BUILD = Path("/tmp/owk_refbuild_cli")


def _build_reference_cli() -> Path:
    cli = CLI_BUILD / "bin" / "whisper-cli"
    if cli.exists():
        return cli
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("cmake/ninja not available")
    subprocess.run(
        ["cmake", "-S", str(TRG.REF), "-B", str(CLI_BUILD), "-G", "Ninja",
         "-DCMAKE_BUILD_TYPE=Release", "-DGGML_NATIVE=OFF",
         "-DWHISPER_BUILD_TESTS=OFF", "-DWHISPER_BUILD_EXAMPLES=ON"],
        check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(CLI_BUILD), "whisper-cli"],
                   check=True, capture_output=True)
    return cli


@pytest.fixture(scope="module")
def ref_cli():
    if not TRG.REF.exists():
        pytest.skip("reference tree not available")
    try:
        return _build_reference_cli()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference cli build failed: {e.stderr[-500:]}")


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from open_whisper_kit_tpu.io import quant
    from open_whisper_kit_tpu.io.ggml_whisper import load_checkpoint
    from open_whisper_kit_tpu.io.ggml_writer import (
        random_reference_tensors, write_checkpoint)

    stub = TRG.REF / "models" / "for-tests-ggml-tiny.en.bin"
    if not stub.exists():
        pytest.skip("reference stub model not available")
    ck = load_checkpoint(stub)
    tensors = random_reference_tensors(ck.hparams, seed=1234)
    path = tmp_path_factory.mktemp("ckpt") / "random-tiny.en.bin"
    write_checkpoint(path, ck.hparams, ck.mel_filters, ck.tokens, tensors,
                     wtype=quant.GGML_TYPE_F16)
    return path


def test_wts_byte_parity(ref_cli, checkpoint, tmp_path):
    wav = TRG.REF / "samples" / "jfk.wav"
    if not wav.exists():
        pytest.skip("jfk.wav not available")

    # -nf: the temperature-fallback path samples multinomially (unseeded
    # C rand vs our PRNG), so only the deterministic t=0 path can be
    # byte-compared; the font arg just has to be a readable file.
    flags = ["-m", str(checkpoint), "-f", str(wav), "-owts",
             "-fp", str(checkpoint), "-np", "-bs", "1", "-bo", "1", "-nf"]

    ref_out = tmp_path / "ref"
    r = subprocess.run([str(ref_cli), *flags, "-of", str(ref_out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]

    our_out = tmp_path / "ours"
    from open_whisper_kit_tpu.cli.main import main
    assert main([*flags, "-of", str(our_out)]) == 0

    ref_bytes = (ref_out.with_suffix(".wts")).read_bytes()
    our_bytes = (our_out.with_suffix(".wts")).read_bytes()
    assert ref_bytes == our_bytes, (
        f"wts scripts differ: ref {len(ref_bytes)}B vs ours "
        f"{len(our_bytes)}B")


def test_wts_byte_parity_stereo_diarize(ref_cli, checkpoint, tmp_path):
    """-di stereo pseudo-diarization: speaker prefixes + per-token
    highlight/underline columns must also match byte-for-byte
    (estimate_diarization_speaker, cli.cpp:315-347 + the wts speaker
    branches at cli.cpp:806-828)."""
    import wave

    import numpy as np

    rng = np.random.default_rng(3)
    n = 16000 * 3
    left = (0.2 * rng.standard_normal(n)).astype(np.float32)
    right = (0.02 * rng.standard_normal(n)).astype(np.float32)
    wav = tmp_path / "stereo.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        inter = np.empty((n, 2), np.float32)
        inter[:, 0] = left
        inter[:, 1] = right
        w.writeframes(np.clip(inter * 32767, -32768, 32767)
                      .astype("<i2").tobytes())

    flags = ["-m", str(checkpoint), "-f", str(wav), "-owts", "-di",
             "-fp", str(checkpoint), "-np", "-bs", "1", "-bo", "1", "-nf"]

    ref_out = tmp_path / "ref"
    r = subprocess.run([str(ref_cli), *flags, "-of", str(ref_out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]

    our_out = tmp_path / "ours"
    from open_whisper_kit_tpu.cli.main import main
    assert main([*flags, "-of", str(our_out)]) == 0

    ref_bytes = (ref_out.with_suffix(".wts")).read_bytes()
    our_bytes = (our_out.with_suffix(".wts")).read_bytes()
    assert ref_bytes == our_bytes, (
        f"stereo wts differ: ref {len(ref_bytes)}B vs ours {len(our_bytes)}B")


def test_text_formats_byte_parity(ref_cli, checkpoint, tmp_path):
    """txt/vtt/srt/csv/lrc outputs are byte-identical to the reference
    whisper-cli binary on the same checkpoint + flags (output_txt/vtt/srt/
    csv/lrc, cli.cpp:450-785). json is excluded: its systeminfo/model
    header blocks carry platform-specific strings by design."""
    wav = TRG.REF / "samples" / "jfk.wav"
    if not wav.exists():
        pytest.skip("jfk.wav not available")

    fmt_flags = ["-otxt", "-ovtt", "-osrt", "-ocsv", "-olrc"]
    flags = ["-m", str(checkpoint), "-f", str(wav), *fmt_flags,
             "-np", "-bs", "1", "-bo", "1", "-nf"]

    ref_out = tmp_path / "ref"
    r = subprocess.run([str(ref_cli), *flags, "-of", str(ref_out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]

    our_out = tmp_path / "ours"
    from open_whisper_kit_tpu.cli.main import main
    assert main([*flags, "-of", str(our_out)]) == 0

    for ext in ("txt", "vtt", "srt", "csv", "lrc"):
        rb = (ref_out.with_suffix("." + ext)).read_bytes()
        ob = (our_out.with_suffix("." + ext)).read_bytes()
        assert rb == ob, f".{ext} differs: ref {len(rb)}B vs ours {len(ob)}B"
