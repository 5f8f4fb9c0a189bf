"""HTTP transcription server.

Route/parameter-compatible port of the reference server
(examples/server/server.cpp:797-1165):

    POST /inference  — multipart form: file=<audio>, plus whisper params
                       (temperature, response_format text|json|verbose_json|
                       srt|vtt, language, translate, ...)
    POST /load       — {"model": path} hot-swap
    GET  /health     — {"status":"ok"}

Python stdlib http.server (threaded); no external web framework.
"""

from __future__ import annotations

import io
import json
import re
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ServerState:
    def __init__(self, model_path: str, dtype=None, mesh=None):
        self.lock = threading.Lock()
        self.model_path = model_path
        self._dtype = dtype
        self._mesh = mesh
        self._transcriber = None

    @property
    def transcriber(self):
        if self._transcriber is None:
            import jax.numpy as jnp

            from ..api import Transcriber
            self._transcriber = Transcriber(
                model_path=self.model_path,
                dtype=self._dtype or jnp.bfloat16,
                mesh=self._mesh)
        return self._transcriber

    def load(self, model_path: str):
        with self.lock:
            self.model_path = model_path
            self._transcriber = None
            _ = self.transcriber


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = b"--" + m.group(1).encode()
    fields: dict[str, bytes] = {}
    for part in body.split(boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        head, _, value = part.partition(b"\r\n\r\n")
        nm = re.search(rb'name="([^"]+)"', head)
        if nm:
            fields[nm.group(1).decode()] = value
    return fields


def _load_audio_bytes(data: bytes):
    from ..audio.wav import load_wav
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(data)
        f.flush()
        return load_wav(f.name)


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: str, ctype="application/json"):
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps({"status": "ok"}))
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if self.path == "/load":
                try:
                    ctype = self.headers.get("Content-Type", "")
                    if ctype.startswith("application/x-www-form-urlencoded"):
                        from urllib.parse import parse_qs
                        req = {k: v[0] for k, v in
                               parse_qs(body.decode()).items()}
                    elif ctype.startswith("multipart/form-data"):
                        req = {k: v.decode() for k, v in
                               _parse_multipart(body, ctype).items()}
                    else:
                        req = json.loads(body or b"{}")
                    state.load(req["model"])
                    self._send(200, json.dumps({"status": "ok"}))
                except Exception as e:  # noqa: BLE001
                    self._send(500, json.dumps({"error": str(e)}))
                return
            if self.path != "/inference":
                self._send(404, json.dumps({"error": "not found"}))
                return

            try:
                fields = _parse_multipart(
                    body, self.headers.get("Content-Type", ""))
                if "file" not in fields:
                    self._send(400, json.dumps(
                        {"error": "no 'file' field in multipart form data"}))
                    return
                audio = _load_audio_bytes(fields["file"])

                from ..decode.params import FullParams, SamplingStrategy
                p = FullParams(print_progress=False)

                def fval(key, cast, default):
                    if key in fields:
                        try:
                            return cast(fields[key].decode().strip())
                        except ValueError:
                            return default
                    return default

                p.language = fval("language", str, "en")
                p.translate = fval("translate", lambda s: s in ("1", "true"), False)
                p.temperature = fval("temperature", float, 0.0)
                p.temperature_inc = fval("temperature_inc", float, 0.2)
                p.no_timestamps = fval("no_timestamps", lambda s: s in ("1", "true"), False)
                p.audio_ctx = fval("audio_ctx", int, 0)
                p.initial_prompt = (fields.get("prompt") or b"").decode() or None
                best_of = fval("best_of", int, 2)
                beam_size = fval("beam_size", int, -1)
                if beam_size > 1:
                    p.strategy = SamplingStrategy.BEAM_SEARCH
                    p.beam_search.beam_size = beam_size
                p.greedy.best_of = best_of
                if fval("word_thold", float, -1.0) >= 0:
                    p.token_timestamps = True
                    p.thold_pt = fval("word_thold", float, 0.01)

                response_format = fval("response_format", str, "json")

                with state.lock:
                    tr = state.transcriber
                    res = tr.full(p, audio)

                from ..cli import outputs as O

                if response_format == "text":
                    self._send(200, res.text, ctype="text/plain")
                elif response_format == "srt":
                    buf = io.StringIO()
                    O.write_srt(res, buf)
                    self._send(200, buf.getvalue(), ctype="application/x-subrip")
                elif response_format == "vtt":
                    buf = io.StringIO()
                    O.write_vtt(res, buf)
                    self._send(200, buf.getvalue(), ctype="text/vtt")
                elif response_format == "verbose_json":
                    segs = [{
                        "id": i, "start": s.t0 / 100.0, "end": s.t1 / 100.0,
                        "text": s.text,
                        "no_speech_prob": s.no_speech_prob,
                        "tokens": [t.id for t in s.tokens],
                    } for i, s in enumerate(res.segments)]
                    self._send(200, json.dumps({
                        "task": "translate" if p.translate else "transcribe",
                        "language": p.language,
                        "duration": len(audio) / 16000.0,
                        "text": res.text,
                        "segments": segs,
                    }, ensure_ascii=False))
                else:
                    self._send(200, json.dumps({"text": res.text},
                                               ensure_ascii=False))
            except Exception as e:  # noqa: BLE001
                self._send(500, json.dumps({"error": str(e)}))

    return Handler


def serve(model_path: str, host: str = "127.0.0.1", port: int = 8080,
          dtype=None, mesh=None) -> ThreadingHTTPServer:
    """`mesh`: serve with dp/tp-sharded weights (api.Transcriber(mesh=));
    the multi-chip serving entry point (--mesh on the CLI)."""
    state = ServerState(model_path, dtype, mesh=mesh)
    server = ThreadingHTTPServer((host, port), make_handler(state))
    return server


def main(argv=None) -> int:
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import argparse
    ap = argparse.ArgumentParser(prog="whisper-server")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the model over all visible devices "
                         "(parallel.mesh.make_mesh dp/tp) for multi-chip "
                         "serving")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel width within the mesh")
    args = ap.parse_args(argv)
    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(tp=args.tp)
    server = serve(args.model, args.host, args.port, mesh=mesh)
    print(f"whisper server listening on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
