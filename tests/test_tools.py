"""Tool tests: WER math, CLI smoke (bench args, vad-segments on jfk)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


class TestWer:
    def test_exact(self):
        from eval_wer import wer
        assert wer("a b c", "a b c") == (0.0, 3)

    def test_substitution(self):
        from eval_wer import wer
        w, n = wer("a b c", "a x c")
        assert abs(w - 1 / 3) < 1e-9 and n == 3

    def test_insert_delete(self):
        from eval_wer import wer
        assert wer("a b", "a x b")[0] == 0.5
        assert wer("a b c d", "a b")[0] == 0.5

    def test_empty(self):
        from eval_wer import wer
        assert wer("", "")[0] == 0.0
        assert wer("", "x")[0] == 1.0

    def test_normalize(self):
        from eval_wer import normalize_text
        assert normalize_text("Hello, World!") == "hello world"
        assert normalize_text("I can't do it.") == "i can not do it"
        assert normalize_text("a  [noise]  b") == "a b"


def test_vad_segments_cli(ref_models, jfk_wav, capsys):
    from open_whisper_kit_tpu.cli.vad_segments import main
    rc = main(["-vm", str(ref_models / "for-tests-silero-v6.2.0-ggml.bin"),
               "-f", str(jfk_wav)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Detected 4 speech segments" in out


def test_silero_converter_roundtrip(tmp_path, ref_models):
    """Our converter's output must be loadable by our reader with identical
    weights (state-dict synthesized from the real fixture)."""
    import torch

    import convert_silero_to_ggml as CS
    from open_whisper_kit_tpu.io.ggml_silero import load_silero

    src = load_silero(ref_models / "for-tests-silero-v6.2.0-ggml.bin")
    state = {}
    for name, t in src.tensors.items():
        arr = t.to_float()
        state[name] = torch.from_numpy(np.ascontiguousarray(arr))
    out = tmp_path / "silero-out.bin"
    CS.convert(state, str(out))

    back = load_silero(out)
    assert back.hparams.window_size == 512
    for name in src.tensors:
        a = src.to_float(name)
        b = back.to_float(name)
        assert a.squeeze().shape == b.squeeze().shape, name
        np.testing.assert_allclose(a.squeeze(), b.squeeze(), atol=1e-3,
                                   err_msg=name)


def test_compare_rttm_der(tmp_path):
    import sys
    sys.path.insert(0, "tools")
    import compare_rttm as CR

    ref = tmp_path / "ref.rttm"
    hyp = tmp_path / "hyp.rttm"
    ref.write_text(
        "SPEAKER f 1 0.00 5.00 <NA> <NA> speaker_0 <NA> <NA>\n"
        "SPEAKER f 1 5.00 5.00 <NA> <NA> speaker_1 <NA> <NA>\n")
    # same segmentation, different label names: optimal mapping -> DER 0
    hyp.write_text(
        "SPEAKER f 1 0.00 5.00 <NA> <NA> spkA <NA> <NA>\n"
        "SPEAKER f 1 5.00 5.00 <NA> <NA> spkB <NA> <NA>\n")
    r = CR.der(str(ref), str(hyp))
    assert r["der"] == 0.0 and r["confusion"] == 0

    # hyp misses the last 2 s entirely -> missed = 200 frames, DER 0.2
    hyp.write_text(
        "SPEAKER f 1 0.00 5.00 <NA> <NA> spkA <NA> <NA>\n"
        "SPEAKER f 1 5.00 3.00 <NA> <NA> spkB <NA> <NA>\n")
    r = CR.der(str(ref), str(hyp))
    assert r["missed"] == 200 and r["false_alarm"] == 0
    assert abs(r["der"] - 0.2) < 1e-6

    # swapped labels with a third bogus speaker -> confusion counted
    hyp.write_text(
        "SPEAKER f 1 0.00 5.00 <NA> <NA> x <NA> <NA>\n"
        "SPEAKER f 1 5.00 5.00 <NA> <NA> x <NA> <NA>\n")
    r = CR.der(str(ref), str(hyp))
    assert r["confusion"] == 500 and abs(r["der"] - 0.5) < 1e-6
    assert CR.main([str(ref), str(hyp), "--collar", "0.25"]) == 0


def test_validate_gguf(tmp_path, capsys):
    import sys
    sys.path.insert(0, "tools")
    import validate_gguf as VG
    from open_whisper_kit_tpu.io.gguf import GGUFWriter

    w = GGUFWriter(tmp_path / "m.gguf")
    w.add_string("general.architecture", "test")
    w.add_uint32("test.dim", 8)
    w.add_tensor("a", np.arange(32, dtype=np.float32))
    w.add_tensor("b", np.ones((4, 8), np.float16))
    w.write()
    rc = VG.main([str(tmp_path / "m.gguf"), "--stats"])
    out = capsys.readouterr().out
    assert rc == 0 and "OK" in out and "tensors      : 2" in out
    rc = VG.main([str(tmp_path / "does-not-exist.gguf")])
    assert rc == 1


# -- faithful EnglishTextNormalizer (reference tests/librispeech/eval.py) -----

def test_english_normalizer_goldens():
    """Observed outputs of the faithful OpenAI normalization pipeline —
    titles, contractions, spoken numbers, currency, annotations, spelling.
    (The round-1 approximation got every one of these wrong.)"""
    from tools.english_normalizer import build_normalizer
    n = build_normalizer()
    cases = {
        "Mr. Brown's dog won't eat one hundred and twenty-three biscuits!":
            "mister brown is dog will not eat 123 biscuits",
        "It costs twenty dollars and fifty cents.": "it costs $20.50",
        "[APPLAUSE] He said (quietly): let's go":
            "he said let us go",
        "I have 1,000 reasons; nineteen eighty-four was a year.":
            "i have 1000 reasons 1984 was a year",
        "three point one four one five nine": "3.14159",
        "Dr. Smith lives on 5th Ave.": "doctor smith lives on 5th ave",
        "a hundred percent": "a 100%",
        "My favourite colour is grey": "my favorite color is gray",
    }
    for src, want in cases.items():
        assert n(src) == want, f"{src!r}: {n(src)!r} != {want!r}"


def test_wer_matches_jiwer_semantics():
    from tools.eval_wer import wer
    # substitution + deletion + insertion over 4 ref words
    w, n = wer("a b c d", "a x c d e")
    assert n == 4 and abs(w - 0.5) < 1e-9
    w, n = wer("a b", "a b")
    assert w == 0.0 and n == 2
