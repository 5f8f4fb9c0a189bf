"""LSP server: JSON-RPC dispatch, commandset registration, framing."""

import base64
import io
import json

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.cli import lsp as L
from open_whisper_kit_tpu.decode.full import WhisperContext


@pytest.fixture(scope="module")
def srv():
    import pathlib
    ref = pathlib.Path("/root/reference/models/for-tests-ggml-tiny.en.bin")
    if not ref.exists():
        pytest.skip("reference stub model not available")
    ctx = WhisperContext.from_file(str(ref), dtype=jnp.float32)
    return L.LspServer(ctx)


def _rpc(method, params, rid=1):
    return {"jsonrpc": "2.0", "method": method, "params": params, "id": rid}


def _audio_b64(seconds=2, seed=0):
    a = (np.random.default_rng(seed).standard_normal(16000 * seconds)
         .astype(np.float32) * 0.1)
    return base64.b64encode(a.tobytes()).decode()


def test_register_and_guided(srv):
    r = srv.handle(_rpc("registerCommandset", ["up", "down", "left", "right"]))
    assert r["result"] == {"index": 0}
    r2 = srv.handle(_rpc("guided", {"commandset_index": 0,
                                    "audio_b64": _audio_b64(),
                                    "timestamp": 42}, rid=2))
    res = r2["result"]
    assert res["command_index"] in range(4)
    assert res["command_text"] in ("up", "down", "left", "right")
    assert res["timestamp"] == 42 and r2["id"] == 2


def test_duplicate_token_rejected(srv):
    # same first token twice (lsp.cpp:309-315 -> error -31000)
    r = srv.handle(_rpc("registerCommandset", ["hello", "hello"]))
    assert r["error"]["code"] == L.DUPLICATE_TOKEN


def test_unguided_stub(srv):
    r = srv.handle(_rpc("unguided", {"audio_b64": _audio_b64(seed=3)}))
    assert "transcription" in r["result"]   # stub weights -> empty text


def test_jsonrpc_errors(srv):
    assert srv.handle({"jsonrpc": "1.0", "method": "unguided",
                       "id": 5})["error"]["message"] == "invalid jsonrpc version"
    assert srv.handle(_rpc("nosuch", {}))["error"]["code"] == L.METHOD_NOT_FOUND
    assert srv.handle(_rpc("seek", {}))["error"]["code"] == L.METHOD_NOT_FOUND
    assert srv.handle(_rpc("guided", {}))["error"]["code"] in (
        L.INVALID_REQUEST,)  # no commandset on a fresh server is caught too


def test_framing_roundtrip():
    buf = io.BytesIO()
    L._write_message(buf, {"jsonrpc": "2.0", "result": {"x": 1}, "id": 9})
    buf.seek(0)
    head = buf.readline()
    assert head.startswith(b"Content-Length: ")
    buf.seek(0)
    msg = L._read_message(buf)
    assert msg == {"jsonrpc": "2.0", "result": {"x": 1}, "id": 9}


def test_framing_with_content_type_header():
    body = json.dumps(_rpc("seek", {})).encode()
    raw = (b"Content-Length: %d\r\nContent-Type: application/json\r\n\r\n"
           % len(body)) + body
    msg = L._read_message(io.BytesIO(raw))
    assert msg["method"] == "seek"


def test_unexpected_exception_becomes_error_response(srv):
    # out-of-range commandset_index raises IndexError internally; handle()
    # must map it to a JSON-RPC error, not let it kill the server loop
    r = srv.handle(_rpc("guided", {"commandset_index": 99,
                                   "audio_b64": _audio_b64()}, rid=7))
    assert "error" in r and r["id"] == 7
    assert r["error"]["code"] == L.WHISPER_FAILED
    # unreadable audio_path likewise
    r2 = srv.handle(_rpc("unguided", {"audio_path": "/no/such/file.wav"},
                         rid=8))
    assert "error" in r2 and r2["error"]["code"] == L.WHISPER_FAILED


def test_strict_prompt_parity_flag(srv):
    """--strict-prompt-parity reproduces lsp.cpp:320-322's literal
    separator-less concat + 2-char chop; default keeps the intended join."""
    strict = L.LspServer(srv.ctx, strict_prompt_parity=True)
    words = ["up", "down", "go"]
    strict.handle(_rpc("registerCommandset", words))
    srv_default = L.LspServer(srv.ctx)
    srv_default.handle(_rpc("registerCommandset", words))
    vocab = srv.ctx.vocab
    # the reference: " select one from ...: " + "updowngo" minus last 2 chars
    ref_prompt = (" select one from the available words: updowngo"[:-2]
                  + ". Selected word:")
    assert strict.commandsets[-1]["prompt_tokens"] == vocab.tokenize(ref_prompt)
    intended = (" select one from the available words: up, down, go"
                + ". Selected word:")
    assert srv_default.commandsets[-1]["prompt_tokens"] == \
        vocab.tokenize(intended)
