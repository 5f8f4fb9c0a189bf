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
