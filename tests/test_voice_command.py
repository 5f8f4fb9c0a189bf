"""examples/voice_command.py (the examples/command analog): matcher unit
tests + both script modes end-to-end on the stub checkpoint (in-process,
like the other CLI tests, so the conftest CPU pin applies)."""

import sys
import wave
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
STUB = Path("/root/reference/models/for-tests-ggml-tiny.en.bin")

sys.path.insert(0, str(REPO / "examples"))
import voice_command  # noqa: E402


def test_best_command_matching():
    cmds = ["turn on the light", "turn off the light", "stop"]
    assert voice_command.best_command(
        "turn on the light", cmds)[0] == "turn on the light"
    cmd, score = voice_command.best_command(
        "please turn off the light now", cmds)
    assert cmd == "turn off the light" and score == 1.0
    assert voice_command.best_command("xyzzy", cmds)[1] == 0.0


@pytest.fixture()
def cmd_wav(tmp_path):
    wav = tmp_path / "cmd.wav"
    rng = np.random.default_rng(0)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            (rng.standard_normal(16000 * 2) * 2000).astype(np.int16).tobytes())
    return wav


@pytest.mark.skipif(not STUB.exists(), reason="no stub model")
@pytest.mark.parametrize("grammar", [False, True])
def test_script_runs_on_stub(cmd_wav, grammar, capsys):
    argv = ["-m", str(STUB), "--input-wav", str(cmd_wav)]
    if grammar:
        argv += ["--commands", "turn on the light,stop"]
    # stub decode short-circuits to empty text: rc 0 + no output is the
    # expected result (whisper.cpp:7426); the run proves wiring end to end
    assert voice_command.main(argv) == 0
    out = capsys.readouterr()
    assert "Traceback" not in out.err
