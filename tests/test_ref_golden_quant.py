"""Quant-format goldens: io/quant.py vs the reference ggml quantizer.

For every supported block format, the reference library encodes a random
row with its own quantizer and decodes it with its own type traits; we
assert our decoder reproduces the reference's floats from the identical
encoded bytes (layout truth, not just self-consistent round-trips), and —
for the formats our writer encodes — that the reference decodes OUR bytes
to the values our decoder sees (writer layout truth).
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from open_whisper_kit_tpu.io import quant

REF = Path("/root/reference")
BUILD = Path("/tmp/owk_refbuild")
HARNESS_SRC = Path(__file__).parent / "data" / "ref_quant_harness.c"


def _build() -> Path:
    exe = BUILD / "ref_quant_harness"
    if exe.exists():
        return exe
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("cmake/ninja not available")
    if not (BUILD / "ggml").exists():
        subprocess.run(
            ["cmake", "-S", str(REF), "-B", str(BUILD), "-G", "Ninja",
             "-DCMAKE_BUILD_TYPE=Release", "-DGGML_NATIVE=OFF",
             "-DWHISPER_BUILD_TESTS=OFF", "-DWHISPER_BUILD_EXAMPLES=OFF"],
            check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(BUILD), "ggml"],
                   check=True, capture_output=True)
    d = BUILD / "ggml" / "src"
    subprocess.run(
        ["cc", str(HARNESS_SRC), "-O2", f"-I{REF/'ggml'/'include'}",
         "-o", str(exe), f"-L{d}", f"-Wl,-rpath,{d}",
         "-lggml", "-lggml-base", "-lm"],
        check=True, capture_output=True)
    return exe


@pytest.fixture(scope="module")
def harness():
    if not REF.exists():
        pytest.skip("reference tree not available")
    try:
        return _build()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"build failed: {e.stderr[-500:]}")


TYPES = [
    quant.GGML_TYPE_Q4_0, quant.GGML_TYPE_Q4_1, quant.GGML_TYPE_Q5_0,
    quant.GGML_TYPE_Q5_1, quant.GGML_TYPE_Q8_0, quant.GGML_TYPE_Q2_K,
    quant.GGML_TYPE_Q3_K, quant.GGML_TYPE_Q4_K, quant.GGML_TYPE_Q5_K,
    quant.GGML_TYPE_Q6_K, quant.GGML_TYPE_Q8_K,
    quant.GGML_TYPE_IQ4_NL, quant.GGML_TYPE_IQ4_XS,
    quant.GGML_TYPE_TQ1_0, quant.GGML_TYPE_TQ2_0, quant.GGML_TYPE_MXFP4,
    quant.GGML_TYPE_IQ2_XXS, quant.GGML_TYPE_IQ2_XS, quant.GGML_TYPE_IQ2_S,
    quant.GGML_TYPE_IQ3_XXS, quant.GGML_TYPE_IQ3_S,
    quant.GGML_TYPE_IQ1_S, quant.GGML_TYPE_IQ1_M,
]


@pytest.mark.parametrize("t", TYPES, ids=[quant.type_name(t) for t in TYPES])
def test_decode_matches_reference(harness, t, tmp_path):
    n = 1024
    rng = np.random.default_rng(t)
    src = (rng.standard_normal(n) * 0.5).astype(np.float32)
    inp = tmp_path / "in.f32"
    inp.write_bytes(src.tobytes())
    out_q = tmp_path / "row.q"
    out_f = tmp_path / "row.f32"
    r = subprocess.run(
        [str(harness), str(t), str(n), str(inp), str(out_q), str(out_f)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]

    qbytes = out_q.read_bytes()
    assert len(qbytes) == quant.nbytes_for(t, n), (
        f"row size mismatch: {len(qbytes)} vs {quant.nbytes_for(t, n)}")
    ref = np.fromfile(out_f, np.float32)
    ours = quant.dequantize(qbytes, t, n)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6,
                               err_msg=quant.type_name(t))


WRITER_TYPES = [
    quant.GGML_TYPE_Q8_0, quant.GGML_TYPE_Q5_0, quant.GGML_TYPE_Q2_K,
    quant.GGML_TYPE_Q3_K, quant.GGML_TYPE_Q4_K, quant.GGML_TYPE_Q5_K,
    quant.GGML_TYPE_Q6_K,
]


def _writer_inputs(t: int, kind: str) -> np.ndarray:
    n = 1024
    rng = np.random.default_rng(200 + t)
    if kind == "random":
        return (rng.standard_normal(n) * 0.5).astype(np.float32)
    # degenerate rows: zero blocks, constant groups, negative-constant
    # groups, and a zero-padded tail — the flat-group paths where sign-of-
    # zero/init-value divergences hide (C runs `if (v > max)` from +0.0f)
    src = np.zeros(n, np.float32)
    src[256:512] = 0.75
    src[512:768] = -1.25
    src[768:768 + 113] = (rng.standard_normal(113) * 0.5).astype(np.float32)
    return src


@pytest.mark.parametrize("kind", ["random", "degenerate"])
@pytest.mark.parametrize("t", WRITER_TYPES,
                         ids=[quant.type_name(t) for t in WRITER_TYPES])
def test_our_encoding_matches_reference_bytes(harness, t, kind, tmp_path):
    """STRONGEST writer check: our encoder's bytes == the reference
    quantize_row_*_ref bytes on the same input (the harness encodes with
    ggml_quantize_chunk, which routes to the _ref coder when no imatrix
    is given) — bit-exact coder parity, not just decodable layout."""
    from open_whisper_kit_tpu.io.ggml_writer import _encode_tensor
    n = 1024
    src = _writer_inputs(t, kind)
    inp = tmp_path / "in.f32"
    inp.write_bytes(src.tobytes())
    out_q = tmp_path / "row.q"
    out_f = tmp_path / "row.f32"
    r = subprocess.run(
        [str(harness), str(t), str(n), str(inp), str(out_q), str(out_f)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    ours = _encode_tensor(src, t)
    theirs = out_q.read_bytes()
    assert ours == theirs, (
        f"{quant.type_name(t)}: first differing byte at "
        f"{next(i for i, (a, b) in enumerate(zip(ours, theirs)) if a != b)}"
        f" of {len(theirs)}")


@pytest.mark.parametrize("t", WRITER_TYPES,
                         ids=[quant.type_name(t) for t in WRITER_TYPES])
def test_our_encoding_decodes_identically_in_reference(harness, t, tmp_path):
    """Their to_float(our bytes) == our dequantize(our bytes): proves the
    writer's block layout is consumable by the reference runtime."""
    from open_whisper_kit_tpu.io.ggml_writer import _encode_tensor
    n = 1024
    rng = np.random.default_rng(100 + t)
    src = (rng.standard_normal(n) * 0.5).astype(np.float32)
    qbytes = _encode_tensor(src, t)
    # decode OUR bytes with the reference's to_float, in-process via ctypes
    import ctypes
    lib = ctypes.CDLL(str(BUILD / "ggml" / "src" / "libggml-base.so"))
    lib.ggml_get_type_traits.restype = ctypes.c_void_p

    class Traits(ctypes.Structure):
        _fields_ = [("type_name", ctypes.c_char_p),
                    ("blck_size", ctypes.c_int64),
                    ("blck_size_interleave", ctypes.c_int64),
                    ("type_size", ctypes.c_size_t),
                    ("is_quantized", ctypes.c_bool),
                    ("to_float", ctypes.c_void_p),
                    ("from_float_ref", ctypes.c_void_p)]

    tr = Traits.from_address(lib.ggml_get_type_traits(ctypes.c_int(t)))
    to_float = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int64)(tr.to_float)
    out = np.zeros(n, np.float32)
    buf = ctypes.create_string_buffer(qbytes, len(qbytes))
    to_float(ctypes.addressof(buf),
             out.ctypes.data_as(ctypes.c_void_p), n)
    ours = quant.dequantize(qbytes, t, n)
    np.testing.assert_allclose(ours, out, rtol=0, atol=1e-6,
                               err_msg=quant.type_name(t))
