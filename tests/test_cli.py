"""CLI + output format tests."""

import io
import json

import numpy as np
import pytest

from open_whisper_kit_tpu.cli import outputs as O
from open_whisper_kit_tpu.cli.main import build_parser, main, params_from_args
from open_whisper_kit_tpu.decode.full import (Segment, Timings, TokenData,
                                              TranscribeResult)
from open_whisper_kit_tpu.decode.params import SamplingStrategy


def make_result():
    toks = [TokenData(100, 50364, 0.9, -0.1, 0.8, 0.9, t0=0, t1=120),
            TokenData(101, 50364, 0.8, -0.2, 0.7, 0.9, t0=120, t1=250)]
    return TranscribeResult(segments=[
        Segment(0, 250, " Hello world.", 0.01, toks),
        Segment(250, 500, " Second segment.", 0.02, toks),
    ])


def test_to_timestamp():
    assert O.to_timestamp(500) == "00:00:05.000"
    assert O.to_timestamp(6000) == "00:01:00.000"
    assert O.to_timestamp(6000, comma=True) == "00:01:00,000"
    assert O.to_timestamp(360000 + 123) == "01:00:01.230"


def test_txt():
    f = io.StringIO()
    O.write_txt(make_result(), f)
    assert f.getvalue() == " Hello world.\n Second segment.\n"


def test_vtt():
    f = io.StringIO()
    O.write_vtt(make_result(), f)
    lines = f.getvalue().splitlines()
    assert lines[0] == "WEBVTT"
    assert lines[2] == "00:00:00.000 --> 00:00:02.500"
    assert lines[3] == " Hello world."


def test_srt():
    f = io.StringIO()
    O.write_srt(make_result(), f)
    lines = f.getvalue().splitlines()
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:02,500"
    assert lines[4] == "2"


def test_csv():
    f = io.StringIO()
    O.write_csv(make_result(), f)
    lines = f.getvalue().splitlines()
    assert lines[0] == "start,end,text"
    assert lines[1] == '0,2500," Hello world."'


def test_lrc():
    f = io.StringIO()
    O.write_lrc(make_result(), f)
    lines = f.getvalue().splitlines()
    assert lines[0] == "[by:whisper.cpp]"
    assert lines[1] == "[00:00.00] Hello world."
    assert lines[2] == "[00:02.50] Second segment."


def test_json():
    f = io.StringIO()
    O.write_json(make_result(), f, model_type="tiny", language="en")
    data = json.loads(f.getvalue())
    assert len(data["transcription"]) == 2
    t = data["transcription"][0]
    assert t["offsets"] == {"from": 0, "to": 2500}
    assert t["timestamps"]["from"] == "00:00:00,000"


def test_channel_speaker():
    stereo = np.zeros((16000, 2), np.float32)
    stereo[:8000, 0] = 0.5   # first half: left channel
    stereo[8000:, 1] = 0.5
    assert O.estimate_channel_speaker(stereo, 0, 40) == "(speaker 0)"
    assert O.estimate_channel_speaker(stereo, 60, 100) == "(speaker 1)"
    assert O.estimate_channel_speaker(stereo, 0, 100, id_only=True) == "?"


def test_parser_flags():
    args = build_parser().parse_args(
        ["-m", "model.bin", "-f", "a.wav", "-osrt", "-bs", "5", "-l", "es",
         "--vad", "-vm", "vad.bin", "-nf"])
    assert args.model == "model.bin"
    assert args.files == ["a.wav"]
    assert args.output_srt
    p = params_from_args(args)
    assert p.strategy == SamplingStrategy.BEAM_SEARCH
    assert p.beam_search.beam_size == 5
    assert p.language == "es"
    assert p.vad and p.vad_model_path == "vad.bin"
    assert p.temperature_inc == 0.0  # -nf


def test_cli_end_to_end_stub(tmp_path, ref_models, jfk_wav):
    out_base = tmp_path / "out"
    rc = main(["-m", str(ref_models / "for-tests-ggml-tiny.en.bin"),
               "-f", str(jfk_wav), "-otxt", "-oj", "-np",
               "-of", str(out_base)])
    assert rc == 0
    assert (tmp_path / "out.txt").exists()
    data = json.loads((tmp_path / "out.json").read_text())
    assert "transcription" in data


def test_full_parallel_merges(ref_models, jfk_wav):
    import jax.numpy as jnp
    from open_whisper_kit_tpu.audio.wav import load_wav
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams
    from open_whisper_kit_tpu.parallel.dp import full_parallel

    ctx = F.WhisperContext.from_file(
        str(ref_models / "for-tests-ggml-tiny.en.bin"), dtype=jnp.float32)
    audio = load_wav(jfk_wav)
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    res = full_parallel(ctx, p, audio, 2)
    assert res.timings.n_encode >= 2  # both chunks ran


def test_xterm256_quantization():
    # independent check against xterm 256-color palette definition
    assert O._rgb_to_xterm256(0, 0, 0) == 16          # cube (0,0,0)
    assert O._rgb_to_xterm256(255, 255, 255) == 231   # cube (5,5,5)
    assert O._rgb_to_xterm256(0, 0, 255) == 21        # pure blue -> cube
    # mid gray prefers the grayscale ramp
    g = O._rgb_to_xterm256(128, 128, 128)
    assert 232 <= g <= 255


def test_color_and_style_for_prob():
    assert O.color_for_prob(0.0) == O.K_COLORS[0]
    assert O.color_for_prob(1.0) == O.K_COLORS[-1]
    # p^3 ramp: p=0.9 -> 0.729*7 = 5.1 -> index 5
    assert O.color_for_prob(0.9) == O.K_COLORS[5]
    assert O.style_for_prob(0.1) == O.K_STYLES[0]
    assert O.style_for_prob(0.5) == O.K_STYLES[1]
    assert O.style_for_prob(0.99) == O.K_STYLES[2]


def test_render_segment_tokens():
    class FakeVocab:
        token_eot = 1000
        def token_to_str(self, i):
            return f"<{i}>"
    toks = [TokenData(1, 0, 0.95, -0.1, 0.9, 0.9),
            TokenData(1001, 0, 1.0, 0.0, 1.0, 1.0),   # special: skipped
            TokenData(2, 0, 0.1, -2.0, 0.1, 0.1)]
    seg = Segment(0, 100, " x", 0.0, toks)
    s = O.render_segment_tokens(seg, FakeVocab(), mode="colors")
    assert "<1>" in s and "<2>" in s and "<1001>" not in s
    assert s.count("\033[0m") == 2
    s2 = O.render_segment_tokens(seg, FakeVocab(), mode="confidence",
                                 print_special=True)
    assert "<1001>" in s2 and O.K_STYLES[0] in s2 and O.K_STYLES[2] in s2


def test_cli_print_colors_stub(ref_models, jfk_wav):
    # stub checkpoints short-circuit to zero segments; this smokes the -pc /
    # --print-confidence code paths end-to-end (rendering itself is covered
    # by test_render_segment_tokens).
    base = ["-m", str(ref_models / "for-tests-ggml-tiny.en.bin"),
            "-f", str(jfk_wav)]
    assert main(base + ["-pc"]) == 0
    assert main(base + ["--print-confidence", "-nt"]) == 0


def test_diarized_transcript_example(tmp_path, ref_models, jfk_wav):
    """examples/diarized_transcript.py end-to-end on stub whisper + tiny
    random sortformer (smoke: flow wiring, output files)."""
    import sys
    sys.path.insert(0, "examples")
    import jax.numpy as jnp
    from tests.test_sortformer import TINY, _write_tiny_gguf
    from open_whisper_kit_tpu.models.sortformer import model as SM

    params = SM.init_params(TINY, seed=0)
    gguf = _write_tiny_gguf(tmp_path, TINY, params)
    import diarized_transcript as EX
    wav = tmp_path / "in.wav"
    import shutil
    shutil.copy(jfk_wav, wav)
    rc = EX.main([str(wav), "-m", str(ref_models / "for-tests-ggml-tiny.en.bin"),
                  "-dm", str(gguf), "--rttm-out", str(tmp_path / "o.rttm")])
    assert rc == 0
    assert (tmp_path / "o.rttm").exists()
