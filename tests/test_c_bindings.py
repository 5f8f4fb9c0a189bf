"""C client binding: build + end-to-end against the HTTP server."""

import json
import subprocess
import threading
from pathlib import Path

import pytest
import jax.numpy as jnp

BINDINGS = Path(__file__).resolve().parent.parent / "bindings" / "c"


@pytest.fixture(scope="module")
def owk_cli():
    r = subprocess.run(["make", "-C", str(BINDINGS)], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"C toolchain unavailable: {r.stderr.decode()[:200]}")
    return BINDINGS / "owk_cli"


@pytest.fixture(scope="module")
def server(ref_models):
    from open_whisper_kit_tpu.server.http_server import serve
    srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                port=0, dtype=jnp.float32)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_c_client_transcribes(owk_cli, server, jfk_wav):
    r = subprocess.run(
        [str(owk_cli), "127.0.0.1", str(server), str(jfk_wav),
         '{"response_format":"json","temperature":0.0}'],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    data = json.loads(r.stdout.decode())
    assert "text" in data


def test_c_client_health_fail(owk_cli, tmp_path, jfk_wav):
    # nothing listening on this port
    r = subprocess.run([str(owk_cli), "127.0.0.1", "1", str(jfk_wav)],
                       capture_output=True, timeout=60)
    assert r.returncode != 0
