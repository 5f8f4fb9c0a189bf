"""Sortformer cross-implementation goldens vs the reference C++ engine.

Builds `sortformer-diarize` from /root/reference/streaming-sortformer (via a
symlink overlay, since that project expects a ggml/ subdir it does not ship
with), writes a FULL-SIZE random-weight GGUF with models/sortformer/export
(the reference hard-codes 17 conformer + 18 transformer layers,
sortformer.cpp:31-91, so a tiny config cannot load there), and diffs every
pipeline stage via the CLI's dump modes (--dump-mel/--dump-preenc/
--dump-conformer/--dump-prediction, sortformer-cli.cpp:244-801).

This gives the conformer rel-pos attention (pos_bias_u/v, 2T-1 rel shift)
its first EXTERNAL numerical oracle — SURVEY §7 flags it "easy to get
subtly wrong" and round-1 testing was entirely self-referential.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import wave
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF_SF = Path("/root/reference/streaming-sortformer")
BUILD = Path("/tmp/owk_sfbuild")
OVERLAY = Path("/tmp/owk_sfsrc")


def _build_sortformer_cli() -> Path:
    exe = BUILD / "sortformer-diarize"
    if exe.exists():
        return exe
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("cmake/ninja not available")
    OVERLAY.mkdir(exist_ok=True)
    for f in REF_SF.iterdir():
        dst = OVERLAY / f.name
        if not dst.exists():
            dst.symlink_to(f)
    ggml = OVERLAY / "ggml"
    if not ggml.exists():
        ggml.symlink_to(REF_SF.parent / "ggml")
    subprocess.run(
        ["cmake", "-S", str(OVERLAY), "-B", str(BUILD), "-G", "Ninja",
         "-DCMAKE_BUILD_TYPE=Release", "-DGGML_NATIVE=OFF"],
        check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(BUILD), "sortformer-diarize"],
                   check=True, capture_output=True)
    return exe


@pytest.fixture(scope="module")
def cli():
    if not REF_SF.exists():
        pytest.skip("reference streaming-sortformer not available")
    try:
        return _build_sortformer_cli()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"sortformer build failed: {e.stderr[-500:]}")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    """Full-size random-weight model + its GGUF (f16 weights, f32 fb/win)."""
    from open_whisper_kit_tpu.io.gguf import load_gguf
    from open_whisper_kit_tpu.models.sortformer import model as SM
    from open_whisper_kit_tpu.models.sortformer.export import (
        write_sortformer_gguf)

    cfg = SM.SortformerConfig()        # defaults == the real 117 M model
    params = SM.init_params(cfg, seed=7)
    path = tmp_path_factory.mktemp("sf") / "random-sortformer.gguf"
    write_sortformer_gguf(path, cfg, params, half=True)
    # reload through our own reader so BOTH sides see the f16-rounded
    # values — isolates engine numerics from storage rounding
    cfg2, params2 = SM.params_from_gguf(load_gguf(path))
    return cfg2, params2, path


@pytest.fixture(scope="module")
def audio(tmp_path_factory):
    """2 s deterministic noise-burst wav (16 kHz mono s16)."""
    rng = np.random.default_rng(42)
    t = np.arange(32000) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.standard_normal(32000)).astype(np.float32)
    x *= np.where((t > 0.5) & (t < 1.5), 1.0, 0.05)  # speech-ish burst
    pcm16 = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    path = tmp_path_factory.mktemp("wav") / "burst.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm16.tobytes())
    return np.asarray(pcm16, np.float32) / 32768.0, path


def _dump(cli, gguf, wav, cwd, *flags):
    r = subprocess.run([str(cli), "-m", str(gguf), "-f", str(wav), *flags],
                       capture_output=True, text=True, cwd=cwd, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]


def _rel_max(ref, ours):
    return float(np.abs(ref - ours).max() / (np.abs(ref).max() + 1e-12))


def test_mel_matches_reference(cli, model, audio, tmp_path):
    from open_whisper_kit_tpu.models.sortformer import model as SM
    cfg, params, gguf = model
    pcm, wav = audio
    _dump(cli, gguf, wav, tmp_path, "--dump-mel")
    ref = np.fromfile(tmp_path / "cpp_mel.raw", np.float32)
    ref = ref.reshape(cfg.n_mels, -1).T            # -> (n_frames, n_mels)

    mel, seq_len = SM.compute_mel(cfg, params, pcm)
    ours = np.asarray(mel)
    n = min(ref.shape[0], ours.shape[0])
    d = _rel_max(ref[:n], ours[:n])
    assert d < 1e-4, f"mel rel diff {d}"


def test_preenc_matches_reference(cli, model, audio, tmp_path):
    from open_whisper_kit_tpu.models.sortformer import model as SM
    cfg, params, gguf = model
    pcm, wav = audio
    _dump(cli, gguf, wav, tmp_path, "--dump-preenc")
    ref = np.fromfile(tmp_path / "cpp_preenc.raw",
                      np.float32).reshape(-1, cfg.d_model)

    mel, _ = SM.compute_mel(cfg, params, pcm)
    ours = np.asarray(SM.preencode(cfg, params, jnp.asarray(mel)[None]))[0]
    n = min(ref.shape[0], ours.shape[0])
    d = _rel_max(ref[:n], ours[:n])
    assert d < 5e-3, f"preenc rel diff {d}"


def _run_conformer(cfg, params, x, n_layers):
    """xscale + rel-pos conformer layers 0..n_layers-1 on x (T, d)."""
    from open_whisper_kit_tpu.models.sortformer import model as SM
    T = x.shape[0]
    pos = SM.sinusoid_pos_emb(T, cfg.d_model)
    h = jnp.asarray(x)[None] * np.sqrt(cfg.d_model)
    sub = jax.tree.map(lambda a: a[:n_layers], params["conformer"])

    def body(h, bp):
        return SM._conformer_block(cfg, bp, h, pos, None, None), None

    h, _ = jax.lax.scan(body, h, sub)
    return np.asarray(h[0])


@pytest.mark.parametrize("layer", [0, 16])
def test_conformer_matches_reference(cli, model, audio, tmp_path, layer):
    """The rel-pos attention oracle: single layer and the full 17-stack."""
    cfg, params, gguf = model
    pcm, wav = audio
    _dump(cli, gguf, wav, tmp_path, "--dump-preenc")
    preenc = np.fromfile(tmp_path / "cpp_preenc.raw",
                         np.float32).reshape(-1, cfg.d_model)
    _dump(cli, gguf, wav, tmp_path, "--dump-conformer", str(layer))
    ref = np.fromfile(tmp_path / f"cpp_conf{layer}.raw",
                      np.float32).reshape(-1, cfg.d_model)

    ours = _run_conformer(cfg, params, preenc, layer + 1)
    n = min(ref.shape[0], ours.shape[0])
    d = _rel_max(ref[:n], ours[:n])
    assert d < 2e-2, f"conformer[0..{layer}] rel diff {d}"


def test_prediction_matches_reference(cli, model, audio, tmp_path):
    """Full head (conformer + projection + transformer + sigmoid probs)."""
    from open_whisper_kit_tpu.models.sortformer import model as SM
    cfg, params, gguf = model
    pcm, wav = audio
    _dump(cli, gguf, wav, tmp_path, "--dump-preenc")
    preenc = np.fromfile(tmp_path / "cpp_preenc.raw",
                         np.float32).reshape(-1, cfg.d_model)
    _dump(cli, gguf, wav, tmp_path, "--dump-prediction")
    ref = np.fromfile(tmp_path / "cpp_pred.raw",
                      np.float32).reshape(-1, cfg.n_spk)

    ours = np.asarray(SM.head(cfg, params, jnp.asarray(preenc)[None]))[0]
    n = min(ref.shape[0], ours.shape[0])
    diff = np.abs(ref[:n] - ours[:n]).max()
    assert diff < 2e-2, f"prediction probs max diff {diff}"
