/**
 * Node.js client for the open-whisper-kit-tpu HTTP server — the serving-era
 * analog of the reference's addon.node N-API binding (examples/addon.node/)
 * and streaming-sortformer's node binding: the TPU runtime is a service, so
 * JS binds over HTTP instead of linking native code.
 *
 *   import { OwkClient } from "./owk_client.mjs";
 *   const c = new OwkClient("http://localhost:8080");
 *   const r = await c.transcribeFile("audio.wav", { response_format: "json" });
 *   console.log(r.text);
 *
 * Zero dependencies (uses global fetch / FormData / Blob, Node >= 18).
 */

import { readFile } from "node:fs/promises";
import { basename } from "node:path";

export class OwkClient {
  constructor(baseUrl = "http://127.0.0.1:8080") {
    this.baseUrl = baseUrl.replace(/\/$/, "");
  }

  async health() {
    const res = await fetch(`${this.baseUrl}/health`);
    return res.ok;
  }

  /** POST /inference with a wav file; opts maps to the server's form fields
   *  (temperature, response_format, language, translate, ...). */
  async transcribeFile(path, opts = {}) {
    const buf = await readFile(path);
    return this.transcribeBuffer(buf, basename(path), opts);
  }

  async transcribeBuffer(buf, name = "audio.wav", opts = {}) {
    const form = new FormData();
    form.append("file", new Blob([buf], { type: "audio/wav" }), name);
    for (const [k, v] of Object.entries(opts)) form.append(k, String(v));
    const res = await fetch(`${this.baseUrl}/inference`, {
      method: "POST",
      body: form,
    });
    if (!res.ok) throw new Error(`inference failed: HTTP ${res.status}`);
    const fmt = opts.response_format ?? "json";
    return fmt === "json" || fmt === "verbose_json"
      ? res.json()
      : res.text();
  }

  /** POST /load — swap the served model. */
  async loadModel(modelPath) {
    const form = new FormData();
    form.append("model", modelPath);
    const res = await fetch(`${this.baseUrl}/load`, { method: "POST", body: form });
    return res.ok;
  }

  async #postMultipart(path, buf, name, opts = {}) {
    const form = new FormData();
    form.append("file", new Blob([buf], { type: "audio/wav" }), name);
    for (const [k, v] of Object.entries(opts)) form.append(k, String(v));
    const res = await fetch(`${this.baseUrl}${path}`, {
      method: "POST",
      body: form,
    });
    if (!res.ok) throw new Error(`${path} failed: HTTP ${res.status}`);
    return res;
  }

  /** Transcribe with per-word timestamps (verbose_json): each segment
   *  carries a "words" array with start/end/probability. */
  async transcribeWords(path, opts = {}) {
    return this.transcribeFile(path, {
      ...opts,
      response_format: "verbose_json",
    });
  }

  /** POST /detect-language -> { detected_language, language, probability,
   *  language_probabilities }. */
  async detectLanguage(path) {
    const buf = await readFile(path);
    const res = await this.#postMultipart("/detect-language", buf, basename(path));
    return res.json();
  }

  /** POST /diarize (server needs --diarize-model). opts: threshold,
   *  median_window, preset, response_format ("json"|"rttm"), file_id. */
  async diarize(path, opts = {}) {
    const buf = await readFile(path);
    const res = await this.#postMultipart("/diarize", buf, basename(path), opts);
    return (opts.response_format ?? "json") === "rttm" ? res.text() : res.json();
  }

  /** Open a live streaming session (the addon.node StreamingSession analog).
   *  opts: step_ms, length_ms, keep_ms, language, translate, keep_context. */
  async streamStart(opts = {}) {
    const res = await fetch(`${this.baseUrl}/stream/start`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(opts),
    });
    if (!res.ok) throw new Error(`stream start failed: HTTP ${res.status}`);
    const { session } = await res.json();
    return new OwkStream(this, session);
  }
}

/** One live transcription session over /stream/{feed,finish}. */
export class OwkStream {
  constructor(client, id) {
    this.client = client;
    this.id = id;
  }

  async #post(kind, pcm) {
    const res = await fetch(
      `${this.client.baseUrl}/stream/${kind}?session=${encodeURIComponent(this.id)}`,
      {
        method: "POST",
        headers: { "Content-Type": "application/octet-stream" },
        body: pcm ?? new Uint8Array(0),
      },
    );
    if (!res.ok) throw new Error(`stream ${kind} failed: HTTP ${res.status}`);
    const { events } = await res.json();
    return events;
  }

  /** Feed 16 kHz mono s16le PCM bytes; resolves to the incremental events
   *  [{text, t0, t1, final, speaker_turn_next}...]. */
  async feed(pcmS16le) {
    return this.#post("feed", pcmS16le);
  }

  /** Flush + close; resolves to the final events. */
  async finish(pcmS16le) {
    return this.#post("finish", pcmS16le);
  }
}

// CLI: node owk_client.mjs <wav> [server-url]
if (import.meta.url === `file://${process.argv[1]}`) {
  const [wav, url] = process.argv.slice(2);
  if (!wav) {
    console.error("usage: node owk_client.mjs <wav> [server-url]");
    process.exit(1);
  }
  const c = new OwkClient(url);
  const r = await c.transcribeFile(wav, { response_format: "json" });
  console.log(r.text ?? JSON.stringify(r));
}
