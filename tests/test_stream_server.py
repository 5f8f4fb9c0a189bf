"""Streaming transcriber + HTTP server tests."""

import json
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest
import jax.numpy as jnp

from open_whisper_kit_tpu.decode import stream as S
from open_whisper_kit_tpu.decode.full import WhisperContext


@pytest.fixture(scope="module")
def stub_ctx(ref_models):
    return WhisperContext.from_file(
        str(ref_models / "for-tests-ggml-tiny.en.bin"), dtype=jnp.float32)


class TestVadSimple:
    def test_silence_after_speech(self):
        pcm = np.zeros(32000, np.float32)
        pcm[:16000] = np.sin(np.arange(16000) * 0.2).astype(np.float32)
        assert S.vad_simple(pcm, 1000, 0.6, 100.0)

    def test_continuous_speech(self):
        pcm = np.sin(np.arange(32000) * 0.2).astype(np.float32)
        assert not S.vad_simple(pcm, 1000, 0.6, 100.0)

    def test_too_short(self):
        assert not S.vad_simple(np.zeros(8000, np.float32), 1000, 0.6, 100.0)

    def test_high_pass_removes_dc(self):
        x = np.ones(1600, np.float32)
        y = S.high_pass_filter(x, 100.0)
        # the reference's in-place filter leaves DC at ~alpha (0.038)
        assert abs(y[-1]) < 0.05


class TestStreamingTranscriber:
    def test_step_mode(self, stub_ctx):
        st = S.StreamingTranscriber(stub_ctx, S.StreamParams(
            step_ms=1000, length_ms=3000, keep_ms=200))
        rng = np.random.default_rng(0)
        events = []
        for _ in range(4):
            events += st.feed(rng.standard_normal(16000).astype(np.float32) * 0.05)
        assert st.n_iter == 4
        # stub model emits no segments but the loop must advance & commit
        assert st.n_iter % st.n_new_line in range(st.n_new_line)

    def test_small_feeds_accumulate(self, stub_ctx):
        st = S.StreamingTranscriber(stub_ctx, S.StreamParams(step_ms=1000))
        for _ in range(9):
            st.feed(np.zeros(1600, np.float32))  # 0.1 s each
        assert st.n_iter == 0
        st.feed(np.zeros(1600, np.float32))
        assert st.n_iter == 1

    def test_vad_mode(self, stub_ctx):
        st = S.StreamingTranscriber(stub_ctx, S.StreamParams(
            step_ms=0, length_ms=4000))
        speech = np.sin(np.arange(16000) * 0.2).astype(np.float32)
        st.feed(speech)
        assert st.n_iter == 0  # still "talking"
        st.feed(np.zeros(32000, np.float32))
        assert st.n_iter == 1  # silence gate fired


class TestServer:
    @pytest.fixture(scope="class")
    def server(self, ref_models):
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                    port=0, dtype=jnp.float32)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_health(self, server):
        with urllib.request.urlopen(f"{server}/health") as r:
            assert json.loads(r.read()) == {"status": "ok"}

    def test_inference_json(self, server, jfk_wav):
        body, ctype = _multipart({"file": jfk_wav.read_bytes(),
                                  "response_format": b"json",
                                  "temperature": b"0.0"})
        req = urllib.request.Request(f"{server}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req) as r:
            data = json.loads(r.read())
        assert "text" in data

    def test_concurrent_inference(self, server, jfk_wav):
        """ThreadingHTTPServer + shared jitted context: parallel requests
        all succeed and return consistent text."""
        body, ctype = _multipart({"file": jfk_wav.read_bytes(),
                                  "response_format": b"json"})
        results, errors = [], []

        def hit():
            try:
                req = urllib.request.Request(f"{server}/inference", data=body,
                                             headers={"Content-Type": ctype})
                with urllib.request.urlopen(req, timeout=300) as r:
                    results.append(json.loads(r.read()))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors and len(results) == 4
        assert len({r["text"] for r in results}) == 1

    def test_inference_no_file(self, server):
        body, ctype = _multipart({"language": b"en"})
        req = urllib.request.Request(f"{server}/inference", data=body,
                                     headers={"Content-Type": ctype})
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised


def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = "testboundary42"
    parts = []
    for k, v in fields.items():
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{k}"'.encode() +
            (b'; filename="a.wav"' if k == "file" else b"") +
            b"\r\n\r\n" + (v if isinstance(v, bytes) else str(v).encode())
            + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    return body, f'multipart/form-data; boundary="{boundary}"'


class TestBindingWireFormats:
    """The exact multipart bodies produced by bindings/{ruby,java,go} and
    the form body of /load must parse against the real server."""

    @pytest.fixture(scope="class")
    def server(self, ref_models):
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                    port=0, dtype=jnp.float32)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    @staticmethod
    def _wav_bytes(seconds=1):
        import io
        import wave
        pcm = (np.random.default_rng(0).standard_normal(16000 * seconds)
               * 3000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def _post(self, url, body, ctype):
        req = urllib.request.Request(url, data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()

    def test_ruby_java_multipart_layout(self, server):
        # mirror bindings/ruby/owk.rb transcribe() byte-for-byte
        b = "owk-ruby-boundary"
        wav = self._wav_bytes()
        body = (f"--{b}\r\nContent-Disposition: form-data; name=\"file\"; "
                f"filename=\"t.wav\"\r\nContent-Type: audio/wav\r\n\r\n"
                ).encode() + wav + f"\r\n--{b}\r\n".encode() + (
            "Content-Disposition: form-data; name=\"response_format\"\r\n\r\n"
            f"json\r\n--{b}--\r\n").encode()
        status, resp = self._post(f"{server}/inference", body,
                                  f"multipart/form-data; boundary={b}")
        assert status == 200
        assert "text" in json.loads(resp)

    def test_go_style_params_order(self, server):
        # Go's mime/multipart writes fields after the file part, CRLF framing
        b = "gob0undary"
        wav = self._wav_bytes()
        parts = [
            f"--{b}\r\nContent-Disposition: form-data; name=\"file\"; "
            f"filename=\"a.wav\"\r\n"
            "Content-Type: application/octet-stream\r\n\r\n".encode() + wav,
            f"--{b}\r\nContent-Disposition: form-data; "
            "name=\"temperature\"\r\n\r\n0.0".encode(),
            f"--{b}\r\nContent-Disposition: form-data; "
            "name=\"response_format\"\r\n\r\ntext".encode(),
        ]
        body = b"\r\n".join(parts) + f"\r\n--{b}--\r\n".encode()
        status, _resp = self._post(f"{server}/inference", body,
                                   f"multipart/form-data; boundary={b}")
        assert status == 200

    def test_load_form_urlencoded(self, server, ref_models):
        body = ("model=" + urllib.parse.quote(
            str(ref_models / "for-tests-ggml-tiny.en.bin"))).encode()
        status, resp = self._post(f"{server}/load", body,
                                  "application/x-www-form-urlencoded")
        assert status == 200


def _write_rand_ckpt(tmp_dir, ref_models):
    """Small random model with the real vocab (emits real segments,
    unlike the stub checkpoints). Shared by the batching and diarize
    server fixtures."""
    from open_whisper_kit_tpu.io import ggml_whisper, quant
    from open_whisper_kit_tpu.io.ggml_writer import write_checkpoint
    from open_whisper_kit_tpu.models.whisper import model as M
    from open_whisper_kit_tpu.models.whisper.export import (
        tensors_from_params)
    cfg = M.WhisperConfig(
        n_vocab=51864, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
        n_text_layer=2, n_mels=80)
    hp = ggml_whisper.WhisperHParams(
        n_vocab=51864, n_audio_ctx=64, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_text_ctx=32, n_text_state=64, n_text_head=4,
        n_text_layer=2, n_mels=80, ftype=1, qntvr=0)
    real = ggml_whisper.load_checkpoint(
        ref_models / "for-tests-ggml-tiny.en.bin", load_tensors=False)
    params = M.init_params(cfg, seed=0, dtype=jnp.float32)
    path = tmp_dir / "tiny-rand-f16.bin"
    write_checkpoint(path, hp, real.mel_filters, real.tokens,
                     tensors_from_params(cfg, params),
                     wtype=quant.GGML_TYPE_F16)
    return path


class TestBatchingServer:
    """Dynamic request batching (server --batch-window-ms): concurrent
    greedy requests run as ONE lockstep device dispatch. The batched
    responses must equal a direct transcribe_chunks run on the same
    weights (the server plumbing under test adds nothing numerically);
    the lockstep primitive's own equality vs serial whisper_full is
    pinned on a REAL-size model by test_batch.py — this fixture's
    degenerate 64-state model has near-uniform logits where the batched
    vs single encoder's reduction-order ties flip tokens by design."""

    @pytest.fixture(scope="class")
    def rand_ckpt(self, tmp_path_factory, ref_models):
        return _write_rand_ckpt(tmp_path_factory.mktemp("bsrv"), ref_models)

    @pytest.fixture(scope="class")
    def pair(self, rand_ckpt):
        """(serial_url, batched_url, batched_server) on the same weights."""
        from open_whisper_kit_tpu.server.http_server import serve
        srv_s = serve(str(rand_ckpt), port=0, dtype=jnp.float32)
        srv_b = serve(str(rand_ckpt), port=0, dtype=jnp.float32,
                      batch_window_ms=300.0, max_batch=4)
        for s in (srv_s, srv_b):
            threading.Thread(target=s.serve_forever, daemon=True).start()
        yield (f"http://127.0.0.1:{srv_s.server_address[1]}",
               f"http://127.0.0.1:{srv_b.server_address[1]}", srv_b)
        srv_s.shutdown()
        srv_b.shutdown()

    @staticmethod
    def _wav_bytes(seed, seconds=3):
        import io as _io
        import wave
        rng = np.random.default_rng(seed)
        x = (0.1 * rng.standard_normal(16000 * seconds) * 32767).astype(
            np.int16)
        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    @staticmethod
    def _post(url, wav):
        # srt keeps timestamps+text comparable AND stays lockstep-eligible
        # (verbose_json implies token_timestamps per server.cpp:939, which
        # correctly routes to the serial path)
        body, ctype = _multipart({"file": wav, "response_format": b"srt"})
        req = urllib.request.Request(f"{url}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.read().decode()

    def test_batched_equals_direct_lockstep(self, pair, rand_ckpt):
        url_s, url_b, srv_b = pair
        wavs = [self._wav_bytes(s) for s in (1, 2, 3)]

        out = [None] * len(wavs)
        errs = []

        def hit(i):
            try:
                out[i] = self._post(url_b, wavs[i])
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(wavs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        # the batcher must actually have grouped ALL concurrent requests
        # (otherwise the direct 3-chunk reference below is not comparable
        # on this tie-prone degenerate model)
        assert srv_b.state.batcher.max_group == 3

        # direct lockstep reference on the same weights + handler params
        import dataclasses as _dc
        import io as _io
        from open_whisper_kit_tpu.cli import outputs as O
        from open_whisper_kit_tpu.decode import full as F
        from open_whisper_kit_tpu.decode.batch import (
            transcribe_chunks_with_timings)
        from open_whisper_kit_tpu.decode.params import FullParams
        from open_whisper_kit_tpu.audio.wav import load_wav
        import tempfile as _tf
        ctx = F.WhisperContext.from_file(str(rand_ckpt), dtype=jnp.float32)
        p = FullParams(print_progress=False)
        p.language, p.temperature_inc = "en", 0.2
        p.max_len = 60
        p.greedy = _dc.replace(p.greedy, best_of=2)
        audios = []
        for w in wavs:
            with _tf.NamedTemporaryFile(suffix=".wav") as f:
                f.write(w)
                f.flush()
                audios.append(load_wav(f.name))
        segs, _t = transcribe_chunks_with_timings(ctx, p, audios)
        for got, want_segs in zip(out, segs):
            buf = _io.StringIO()
            O.write_srt(F.TranscribeResult(segments=want_segs), buf)
            assert got == buf.getvalue(), (got, buf.getvalue())

    def test_ineligible_params_fall_back(self, pair):
        """Beam-search requests take the serial path (still correct)."""
        url_s, url_b, _ = pair
        wav = self._wav_bytes(9)
        body, ctype = _multipart({"file": wav,
                                  "response_format": b"verbose_json",
                                  "beam_size": b"2"})
        req = urllib.request.Request(f"{url_b}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            got = json.loads(r.read())
        req = urllib.request.Request(f"{url_s}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            want = json.loads(r.read())
        assert got["segments"] == want["segments"]


class TestServerParamParity:
    """The /inference parameter surface of server.cpp:483-615 and the
    verbose_json response shape of server.cpp:1040-1106."""

    @pytest.fixture(scope="class")
    def server(self, ref_models):
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                    port=0, dtype=jnp.float32)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    @staticmethod
    def _post_fields(url, fields):
        body, ctype = _multipart(fields)
        req = urllib.request.Request(f"{url}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.read().decode(), r.headers.get("Content-Type")

    def test_verbose_json_language_block(self, server, jfk_wav):
        out, _ = self._post_fields(server, {
            "file": jfk_wav.read_bytes(),
            "response_format": b"verbose_json"})
        data = json.loads(out)
        # openai-style top level (server.cpp:1040-1063)
        for key in ("task", "language", "duration", "text", "segments",
                    "detected_language", "detected_language_probability",
                    "language_probabilities"):
            assert key in data, key
        assert data["language"] == "english"     # full name, not code
        assert isinstance(data["language_probabilities"], dict)

    def test_verbose_json_no_language_probabilities(self, server, jfk_wav):
        out, _ = self._post_fields(server, {
            "file": jfk_wav.read_bytes(),
            "response_format": b"verbose_json",
            "no_language_probabilities": b"true"})
        data = json.loads(out)
        assert "detected_language" not in data
        assert "language_probabilities" not in data

    def test_text_content_type_and_params_accepted(self, server, jfk_wav):
        """The reference's odd text/html content type, plus every scalar
        param parsing without error (stub model -> empty body is fine)."""
        out, ctype = self._post_fields(server, {
            "file": jfk_wav.read_bytes(),
            "response_format": b"text",
            "offset_t": b"0", "offset_n": b"3", "duration": b"0",
            "max_context": b"64", "max_len": b"30",
            "split_on_word": b"true", "entropy_thold": b"2.8",
            "logprob_thold": b"-0.5", "debug_mode": b"false",
            "suppress_nst": b"true", "tinydiarize": b"false",
            "temperature": b"0.0", "temperature_inc": b"0.2",
            "vad_threshold": b"0.6"})
        assert ctype == "text/html; charset=utf-8"
        assert isinstance(out, str)


class TestServerDiarizeStereo:
    """diarize=true + stereo wav: channel-energy speaker prefixes in the
    text/srt outputs (server.cpp output_str + estimate_diarization_speaker),
    exercised on a random-weight model that emits real segments."""

    @pytest.fixture(scope="class")
    def server(self, tmp_path_factory, ref_models):
        path = _write_rand_ckpt(tmp_path_factory.mktemp("dsrv"), ref_models)
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(path), port=0, dtype=jnp.float32)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    @staticmethod
    def _stereo_wav(seconds=2):
        import io as _io
        import wave
        rng = np.random.default_rng(5)
        left = 0.2 * rng.standard_normal(16000 * seconds)
        right = 0.002 * rng.standard_normal(16000 * seconds)
        x = (np.stack([left, right], axis=1) * 32767).astype(np.int16)
        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    def test_diarize_speaker_prefix(self, server):
        body, ctype = _multipart({"file": self._stereo_wav(),
                                  "response_format": b"text",
                                  "diarize": b"true"})
        req = urllib.request.Request(f"{server}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = r.read().decode()
        assert "(speaker 0)" in out    # left channel carries the energy

    def test_srt_offset_n(self, server):
        body, ctype = _multipart({"file": self._stereo_wav(),
                                  "response_format": b"srt",
                                  "offset_n": b"7"})
        req = urllib.request.Request(f"{server}/inference", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = r.read().decode()
        first_idx = out.splitlines()[0].strip()
        assert first_idx == "8"        # i + 1 + offset_n (server.cpp:1013)


class TestServerRouting:
    """--request-path / --inference-path / --public / --convert
    (server.cpp sparams)."""

    @pytest.fixture(scope="class")
    def server(self, ref_models, tmp_path_factory):
        pub = tmp_path_factory.mktemp("public")
        (pub / "index.html").write_text("<html>demo</html>")
        (pub / "app.js").write_text("var x = 1;")
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                    port=0, dtype=jnp.float32, request_path="/v1",
                    inference_path="/transcribe", public_path=str(pub))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_prefixed_health_and_inference(self, server, jfk_wav):
        with urllib.request.urlopen(f"{server}/v1/health") as r:
            assert json.loads(r.read()) == {"status": "ok"}
        body, ctype = _multipart({"file": jfk_wav.read_bytes(),
                                  "response_format": b"json"})
        req = urllib.request.Request(f"{server}/v1/transcribe", data=body,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            assert "text" in json.loads(r.read())
        # the unprefixed route is gone
        req = urllib.request.Request(f"{server}/inference", data=body,
                                     headers={"Content-Type": ctype})
        try:
            urllib.request.urlopen(req)
            assert False, "unprefixed route should 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_query_string_and_prefix_gate(self, server):
        # query strings are stripped before route matching (server.cpp
        # uses the parsed path; ours must too)
        with urllib.request.urlopen(f"{server}/v1/health?probe=1") as r:
            assert json.loads(r.read()) == {"status": "ok"}
        # GETs outside the prefix 404 instead of falling through to the
        # static handler
        try:
            urllib.request.urlopen(f"{server}/other/health")
            assert False, "outside-prefix GET should 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_static_public_files(self, server):
        with urllib.request.urlopen(f"{server}/v1/") as r:
            assert b"demo" in r.read()
        # percent-encoded paths are decoded before the filesystem lookup
        with urllib.request.urlopen(f"{server}/v1/%69ndex.html") as r:
            assert b"demo" in r.read()
        with urllib.request.urlopen(f"{server}/v1/app.js") as r:
            assert r.headers.get("Content-Type").startswith(
                ("text/javascript", "application/javascript"))
        try:
            urllib.request.urlopen(f"{server}/v1/../../etc/passwd")
            traversal_blocked = False
        except urllib.error.HTTPError as e:
            traversal_blocked = e.code == 404
        assert traversal_blocked

    def test_convert_without_ffmpeg_errors_cleanly(self, ref_models,
                                                   jfk_wav):
        import shutil
        if shutil.which("ffmpeg"):
            pytest.skip("ffmpeg present; conversion would succeed")
        from open_whisper_kit_tpu.server.http_server import serve
        srv = serve(str(ref_models / "for-tests-ggml-tiny.en.bin"),
                    port=0, dtype=jnp.float32, convert=True)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            body, ctype = _multipart({"file": jfk_wav.read_bytes()})
            req = urllib.request.Request(f"{url}/inference", data=body,
                                         headers={"Content-Type": ctype})
            try:
                urllib.request.urlopen(req, timeout=120)
                assert False, "expected 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "ffmpeg" in json.loads(e.read())["error"]
        finally:
            srv.shutdown()
