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

#ifdef __cplusplus
}
#endif

#endif /* OWK_CLIENT_H */
