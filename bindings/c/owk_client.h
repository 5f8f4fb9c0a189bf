/* owk_client: dependency-free C client for the transcription server.
 *
 * Bindings story for non-Python languages (the reference wraps whisper.h
 * into go/java/ruby/js; here the stable ABI is the HTTP server —
 * server/http_server.py). This header + owk_client.c give C/C++ (and
 * go/cgo, ruby-ffi, JNI, node-ffi) a one-call transcribe API over POSIX
 * sockets; no libcurl.
 *
 * Usage:
 *   owk_client c; owk_client_init(&c, "127.0.0.1", 8080);
 *   char *text = owk_transcribe_file(&c, "audio.wav", "{\"language\":\"en\"}");
 *   ...; free(text);
 */

#ifndef OWK_CLIENT_H
#define OWK_CLIENT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    char host[256];
    int port;
    int timeout_s;
} owk_client;

/* Initialize a client handle. Returns 0 on success. */
int owk_client_init(owk_client *c, const char *host, int port);

/* GET /health. Returns 0 when the server answers {"status":"ok"}. */
int owk_health(const owk_client *c);

/* POST /load with a new model path. Returns 0 on success. */
int owk_load_model(const owk_client *c, const char *model_path);

/* POST /inference with the given audio file and optional params.
 * `params_json` may be NULL or a flat JSON object of string/number fields
 * (language, temperature, beam_size, response_format, ...). Returns a
 * malloc'd response body (caller frees) or NULL on error. */
char *owk_transcribe_file(const owk_client *c, const char *audio_path,
                          const char *params_json);

/* Same, but from an in-memory WAV buffer. */
char *owk_transcribe_buffer(const owk_client *c, const void *wav_bytes,
                            size_t n_bytes, const char *params_json);

/* POST /inference with response_format=verbose_json: the returned JSON
 * carries per-word timestamps + probabilities ("words" arrays). Caller
 * frees. */
char *owk_transcribe_words(const owk_client *c, const char *audio_path,
                           const char *params_json);

/* POST /detect-language: returns malloc'd JSON
 * {"detected_language", "language", "probability",
 *  "language_probabilities"} or NULL. */
char *owk_detect_language(const owk_client *c, const char *audio_path);

/* POST /diarize (requires the server's --diarize-model): params_json may
 * set threshold / median_window / preset / response_format ("json"|"rttm")
 * / file_id. Returns malloc'd body (JSON segments or RTTM text). */
char *owk_diarize_file(const owk_client *c, const char *audio_path,
                       const char *params_json);

/* Streaming session (server /stream/{start,feed,finish}).
 * owk_stream_start: params_json may set step_ms/length_ms/keep_ms/
 * language/...; returns a malloc'd session id or NULL.
 * owk_stream_feed: sends 16 kHz mono s16le PCM; returns malloc'd JSON
 * {"events": [{"text", "t0", "t1", "final"}...]}.
 * owk_stream_finish: flushes + closes; returns the final events JSON. */
char *owk_stream_start(const owk_client *c, const char *params_json);
char *owk_stream_feed(const owk_client *c, const char *session,
                      const void *pcm_s16le, size_t n_bytes);
char *owk_stream_finish(const owk_client *c, const char *session,
                        const void *pcm_s16le, size_t n_bytes);

#ifdef __cplusplus
}
#endif

#endif /* OWK_CLIENT_H */
