/* owk_client implementation: minimal HTTP/1.1 over POSIX sockets. */

#define _POSIX_C_SOURCE 200809L
#define _DEFAULT_SOURCE

#include "owk_client.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

static int owk_connect(const owk_client *c) {
    struct addrinfo hints, *res = NULL;
    memset(&hints, 0, sizeof(hints));
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    char port[16];
    snprintf(port, sizeof(port), "%d", c->port);
    if (getaddrinfo(c->host, port, &hints, &res) != 0) return -1;
    int fd = -1;
    for (struct addrinfo *p = res; p; p = p->ai_next) {
        fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
        if (fd < 0) continue;
        if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    return fd;
}

static int owk_send_all(int fd, const void *buf, size_t n) {
    const char *p = (const char *)buf;
    while (n > 0) {
        ssize_t w = write(fd, p, n);
        if (w <= 0) return -1;
        p += w;
        n -= (size_t)w;
    }
    return 0;
}

/* Reads the whole response; returns malloc'd body (headers stripped). */
static char *owk_read_response(int fd, int *status_out) {
    size_t cap = 1 << 16, len = 0;
    char *buf = (char *)malloc(cap);
    if (!buf) return NULL;
    ssize_t r;
    while ((r = read(fd, buf + len, cap - len - 1)) > 0) {
        len += (size_t)r;
        if (cap - len < 4096) {
            cap *= 2;
            char *nb = (char *)realloc(buf, cap);
            if (!nb) { free(buf); return NULL; }
            buf = nb;
        }
    }
    buf[len] = 0;
    int status = 0;
    sscanf(buf, "HTTP/%*s %d", &status);
    if (status_out) *status_out = status;
    char *body = strstr(buf, "\r\n\r\n");
    if (!body) { free(buf); return NULL; }
    body += 4;
    char *out = strdup(body);
    free(buf);
    return out;
}

int owk_client_init(owk_client *c, const char *host, int port) {
    if (!c || !host || strlen(host) >= sizeof(c->host)) return -1;
    strncpy(c->host, host, sizeof(c->host) - 1);
    c->host[sizeof(c->host) - 1] = 0;
    c->port = port;
    c->timeout_s = 300;
    return 0;
}

int owk_health(const owk_client *c) {
    int fd = owk_connect(c);
    if (fd < 0) return -1;
    char req[512];
    snprintf(req, sizeof(req),
             "GET /health HTTP/1.1\r\nHost: %s\r\nConnection: close\r\n\r\n",
             c->host);
    int rc = owk_send_all(fd, req, strlen(req));
    int status = 0;
    char *body = rc == 0 ? owk_read_response(fd, &status) : NULL;
    close(fd);
    int ok = (body && status == 200 && strstr(body, "ok")) ? 0 : -1;
    free(body);
    return ok;
}

int owk_load_model(const owk_client *c, const char *model_path) {
    int fd = owk_connect(c);
    if (fd < 0) return -1;
    char payload[1024];
    snprintf(payload, sizeof(payload), "{\"model\": \"%s\"}", model_path);
    char req[2048];
    snprintf(req, sizeof(req),
             "POST /load HTTP/1.1\r\nHost: %s\r\nConnection: close\r\n"
             "Content-Type: application/json\r\nContent-Length: %zu\r\n\r\n%s",
             c->host, strlen(payload), payload);
    int rc = owk_send_all(fd, req, strlen(req));
    int status = 0;
    char *body = rc == 0 ? owk_read_response(fd, &status) : NULL;
    close(fd);
    free(body);
    return status == 200 ? 0 : -1;
}

/* Very small JSON walker: emits each "key":value pair of a flat object as a
 * multipart field. */
static size_t owk_emit_json_fields(const char *json, const char *boundary,
                                   char *out, size_t cap) {
    size_t w = 0;
    if (!json) return 0;
    const char *p = json;
    while ((p = strchr(p, '"')) != NULL) {
        const char *k0 = p + 1;
        const char *k1 = strchr(k0, '"');
        if (!k1) break;
        const char *colon = strchr(k1, ':');
        if (!colon) break;
        const char *v0 = colon + 1;
        while (*v0 == ' ') v0++;
        char val[512];
        if (*v0 == '"') {
            const char *v1 = strchr(v0 + 1, '"');
            if (!v1) break;
            snprintf(val, sizeof(val), "%.*s", (int)(v1 - v0 - 1), v0 + 1);
            p = v1 + 1;
        } else {
            const char *v1 = v0;
            while (*v1 && *v1 != ',' && *v1 != '}') v1++;
            snprintf(val, sizeof(val), "%.*s", (int)(v1 - v0), v0);
            p = v1;
        }
        w += (size_t)snprintf(out + w, cap - w,
                              "--%s\r\nContent-Disposition: form-data; "
                              "name=\"%.*s\"\r\n\r\n%s\r\n",
                              boundary, (int)(k1 - k0), k0, val);
        if (w >= cap) return cap;
    }
    return w;
}

/* Multipart POST of (params fields + one file part) to `path`. */
static char *owk_post_multipart(const owk_client *c, const char *path,
                                const void *wav_bytes, size_t n_bytes,
                                const char *params_json) {
    const char *boundary = "owkclientboundary";
    char head[8192];
    size_t hw = owk_emit_json_fields(params_json, boundary, head, sizeof(head) - 512);
    hw += (size_t)snprintf(head + hw, sizeof(head) - hw,
                           "--%s\r\nContent-Disposition: form-data; "
                           "name=\"file\"; filename=\"audio.wav\"\r\n"
                           "Content-Type: audio/wav\r\n\r\n", boundary);
    char tail[64];
    size_t tw = (size_t)snprintf(tail, sizeof(tail), "\r\n--%s--\r\n", boundary);
    size_t content_len = hw + n_bytes + tw;

    int fd = owk_connect(c);
    if (fd < 0) return NULL;
    char req[1024];
    snprintf(req, sizeof(req),
             "POST %s HTTP/1.1\r\nHost: %s\r\nConnection: close\r\n"
             "Content-Type: multipart/form-data; boundary=\"%s\"\r\n"
             "Content-Length: %zu\r\n\r\n",
             path, c->host, boundary, content_len);
    if (owk_send_all(fd, req, strlen(req)) != 0 ||
        owk_send_all(fd, head, hw) != 0 ||
        owk_send_all(fd, wav_bytes, n_bytes) != 0 ||
        owk_send_all(fd, tail, tw) != 0) {
        close(fd);
        return NULL;
    }
    int status = 0;
    char *body = owk_read_response(fd, &status);
    close(fd);
    if (status != 200) {
        free(body);
        return NULL;
    }
    return body;
}

/* Raw-body POST (JSON or PCM) to `path`. */
static char *owk_post_raw(const owk_client *c, const char *path,
                          const char *content_type, const void *body_bytes,
                          size_t n_bytes) {
    int fd = owk_connect(c);
    if (fd < 0) return NULL;
    char req[1024];
    snprintf(req, sizeof(req),
             "POST %s HTTP/1.1\r\nHost: %s\r\nConnection: close\r\n"
             "Content-Type: %s\r\nContent-Length: %zu\r\n\r\n",
             path, c->host, content_type, n_bytes);
    if (owk_send_all(fd, req, strlen(req)) != 0 ||
        (n_bytes > 0 && owk_send_all(fd, body_bytes, n_bytes) != 0)) {
        close(fd);
        return NULL;
    }
    int status = 0;
    char *body = owk_read_response(fd, &status);
    close(fd);
    if (status != 200) {
        free(body);
        return NULL;
    }
    return body;
}

static char *owk_read_file(const char *path, size_t *n_out) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (n <= 0) { fclose(f); return NULL; }
    char *buf = (char *)malloc((size_t)n);
    if (!buf || fread(buf, 1, (size_t)n, f) != (size_t)n) {
        free(buf);
        fclose(f);
        return NULL;
    }
    fclose(f);
    *n_out = (size_t)n;
    return buf;
}

char *owk_transcribe_buffer(const owk_client *c, const void *wav_bytes,
                            size_t n_bytes, const char *params_json) {
    return owk_post_multipart(c, "/inference", wav_bytes, n_bytes,
                              params_json);
}

char *owk_transcribe_words(const owk_client *c, const char *audio_path,
                           const char *params_json) {
    char merged[4096];
    if (params_json && strlen(params_json) > 2) {
        /* splice response_format into the caller's object */
        snprintf(merged, sizeof(merged),
                 "{\"response_format\": \"verbose_json\", %s",
                 strchr(params_json, '{') ? strchr(params_json, '{') + 1
                                          : params_json);
    } else {
        snprintf(merged, sizeof(merged),
                 "{\"response_format\": \"verbose_json\"}");
    }
    return owk_transcribe_file(c, audio_path, merged);
}

char *owk_detect_language(const owk_client *c, const char *audio_path) {
    size_t n = 0;
    char *buf = owk_read_file(audio_path, &n);
    if (!buf) return NULL;
    char *out = owk_post_multipart(c, "/detect-language", buf, n, NULL);
    free(buf);
    return out;
}

char *owk_diarize_file(const owk_client *c, const char *audio_path,
                       const char *params_json) {
    size_t n = 0;
    char *buf = owk_read_file(audio_path, &n);
    if (!buf) return NULL;
    char *out = owk_post_multipart(c, "/diarize", buf, n, params_json);
    free(buf);
    return out;
}

char *owk_stream_start(const owk_client *c, const char *params_json) {
    const char *payload = params_json ? params_json : "{}";
    char *body = owk_post_raw(c, "/stream/start", "application/json",
                              payload, strlen(payload));
    if (!body) return NULL;
    /* extract {"session": "sN"} */
    char *p = strstr(body, "\"session\"");
    char *out = NULL;
    if (p && (p = strchr(p + 9, '"')) != NULL) {
        char *e = strchr(p + 1, '"');
        if (e) {
            out = (char *)malloc((size_t)(e - p));
            if (out) {
                memcpy(out, p + 1, (size_t)(e - p - 1));
                out[e - p - 1] = 0;
            }
        }
    }
    free(body);
    return out;
}

char *owk_stream_feed(const owk_client *c, const char *session,
                      const void *pcm_s16le, size_t n_bytes) {
    char path[512];
    snprintf(path, sizeof(path), "/stream/feed?session=%s", session);
    return owk_post_raw(c, path, "application/octet-stream",
                        pcm_s16le, n_bytes);
}

char *owk_stream_finish(const owk_client *c, const char *session,
                        const void *pcm_s16le, size_t n_bytes) {
    char path[512];
    snprintf(path, sizeof(path), "/stream/finish?session=%s", session);
    return owk_post_raw(c, path, "application/octet-stream",
                        pcm_s16le, n_bytes);
}

char *owk_transcribe_file(const owk_client *c, const char *audio_path,
                          const char *params_json) {
    size_t n = 0;
    char *buf = owk_read_file(audio_path, &n);
    if (!buf) return NULL;
    char *out = owk_transcribe_buffer(c, buf, n, params_json);
    free(buf);
    return out;
}
