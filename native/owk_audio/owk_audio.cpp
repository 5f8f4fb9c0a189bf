// owk_audio: native audio runtime for the TPU speech framework.
//
// C++ replacement for the reference's host-side audio layer
// (miniaudio decode in examples/common-whisper.cpp, SDL mic ring buffer in
// examples/common-sdl.cpp, AVFoundation resample in AudioProcessor.swift):
// WAV/PCM decode, windowed-sinc resampling to 16 kHz mono, a thread-safe
// streaming ring buffer, and the signal-energy / high-pass helpers used by
// the streaming VAD gate. Exposed through a plain C ABI for ctypes/cffi.
//
// Build: make -C native/owk_audio   (produces libowk_audio.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

#define OWK_API extern "C" __attribute__((visibility("default")))

namespace {

constexpr int kTargetRate = 16000;

struct WavInfo {
    uint16_t format = 0;
    uint16_t channels = 0;
    uint32_t sample_rate = 0;
    uint16_t bits = 0;
    const uint8_t * data = nullptr;
    size_t data_bytes = 0;
};

bool parse_wav(const uint8_t * buf, size_t n, WavInfo * out) {
    if (n < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0) {
        return false;
    }
    size_t pos = 12;
    bool have_fmt = false;
    while (pos + 8 <= n) {
        const char * id = reinterpret_cast<const char *>(buf + pos);
        uint32_t sz;
        memcpy(&sz, buf + pos + 4, 4);
        pos += 8;
        if (pos + sz > n) sz = static_cast<uint32_t>(n - pos);
        if (memcmp(id, "fmt ", 4) == 0 && sz >= 16) {
            memcpy(&out->format, buf + pos, 2);
            memcpy(&out->channels, buf + pos + 2, 2);
            memcpy(&out->sample_rate, buf + pos + 4, 4);
            memcpy(&out->bits, buf + pos + 14, 2);
            have_fmt = true;
        } else if (memcmp(id, "data", 4) == 0) {
            out->data = buf + pos;
            out->data_bytes = sz;
        }
        pos += sz + (sz & 1);
    }
    return have_fmt && out->data != nullptr;
}

// decode interleaved samples to float32 per channel frame
size_t decode_frames(const WavInfo & w, std::vector<float> * out) {
    const int ch = w.channels;
    size_t n_frames = 0;
    if (w.format == 1) {  // PCM
        if (w.bits == 16) {
            n_frames = w.data_bytes / (2 * ch);
            out->resize(n_frames * ch);
            const int16_t * s = reinterpret_cast<const int16_t *>(w.data);
            for (size_t i = 0; i < n_frames * ch; i++) {
                (*out)[i] = s[i] / 32768.0f;
            }
        } else if (w.bits == 32) {
            n_frames = w.data_bytes / (4 * ch);
            out->resize(n_frames * ch);
            const int32_t * s = reinterpret_cast<const int32_t *>(w.data);
            for (size_t i = 0; i < n_frames * ch; i++) {
                (*out)[i] = static_cast<float>(s[i] / 2147483648.0);
            }
        } else if (w.bits == 8) {
            n_frames = w.data_bytes / ch;
            out->resize(n_frames * ch);
            for (size_t i = 0; i < n_frames * ch; i++) {
                (*out)[i] = (w.data[i] - 128) / 128.0f;
            }
        } else if (w.bits == 24) {
            n_frames = w.data_bytes / (3 * ch);
            out->resize(n_frames * ch);
            for (size_t i = 0; i < n_frames * ch; i++) {
                int32_t v = (w.data[3 * i] << 8) | (w.data[3 * i + 1] << 16)
                            | (w.data[3 * i + 2] << 24);
                (*out)[i] = static_cast<float>(v / 2147483648.0);
            }
        }
    } else if (w.format == 3 && w.bits == 32) {  // IEEE float
        n_frames = w.data_bytes / (4 * ch);
        out->resize(n_frames * ch);
        memcpy(out->data(), w.data, n_frames * ch * 4);
    }
    return n_frames;
}

// windowed-sinc polyphase resampler (Hann window, 16 taps per phase)
void resample(const std::vector<float> & in, uint32_t src_rate,
              std::vector<float> * out) {
    if (src_rate == kTargetRate) {
        *out = in;
        return;
    }
    const double ratio = static_cast<double>(kTargetRate) / src_rate;
    const size_t n_out = static_cast<size_t>(in.size() * ratio);
    out->resize(n_out);
    const int half_taps = 8;
    // low-pass cutoff at min(src, dst) Nyquist
    const double fc = std::min(1.0, ratio);
    for (size_t i = 0; i < n_out; i++) {
        const double t = i / ratio;           // position in input samples
        const long center = static_cast<long>(std::floor(t));
        double acc = 0.0, wsum = 0.0;
        for (long k = center - half_taps + 1; k <= center + half_taps; k++) {
            const double x = (t - k) * fc;
            double sinc = (std::fabs(x) < 1e-9)
                ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
            const double wpos = (t - k) / half_taps;
            if (wpos <= -1.0 || wpos >= 1.0) continue;
            const double win = 0.5 * (1.0 + std::cos(M_PI * wpos));
            const double w = sinc * fc * win;
            const float s = (k >= 0 && k < static_cast<long>(in.size()))
                ? in[k] : 0.0f;
            acc += w * s;
            wsum += w;
        }
        // normalize by the window sum so DC stays at unit gain
        (*out)[i] = static_cast<float>(wsum > 1e-12 ? acc / wsum : 0.0);
    }
}

}  // namespace

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Decodes WAV bytes to mono (or stereo) 16 kHz f32.
// Returns number of frames written (<= max_frames query: call with
// out=nullptr to get the required frame count), or -1 on parse error.
OWK_API int64_t owk_decode_wav(const uint8_t * buf, int64_t n_bytes,
                               int stereo, float * out, int64_t max_frames) {
    WavInfo w;
    if (!parse_wav(buf, static_cast<size_t>(n_bytes), &w) || w.channels == 0) {
        return -1;
    }
    std::vector<float> frames;
    const size_t n_frames = decode_frames(w, &frames);
    if (n_frames == 0) return -1;
    const int ch = w.channels;
    const int out_ch = (stereo && ch >= 2) ? 2 : 1;

    // downmix / select channels
    std::vector<float> chan[2];
    for (int c = 0; c < out_ch; c++) {
        chan[c].resize(n_frames);
    }
    if (out_ch == 1) {
        for (size_t i = 0; i < n_frames; i++) {
            float acc = 0.0f;
            for (int c = 0; c < ch; c++) acc += frames[i * ch + c];
            chan[0][i] = acc / ch;
        }
    } else {
        for (size_t i = 0; i < n_frames; i++) {
            chan[0][i] = frames[i * ch];
            chan[1][i] = frames[i * ch + 1];
        }
    }

    std::vector<float> res[2];
    for (int c = 0; c < out_ch; c++) {
        resample(chan[c], w.sample_rate, &res[c]);
    }
    const int64_t n_out = static_cast<int64_t>(res[0].size());
    if (out == nullptr) {
        return n_out;
    }
    const int64_t n_copy = std::min(n_out, max_frames);
    for (int64_t i = 0; i < n_copy; i++) {
        for (int c = 0; c < out_ch; c++) {
            out[i * out_ch + c] = res[c][i];
        }
    }
    return n_copy;
}

OWK_API int64_t owk_resample(const float * in, int64_t n_in, int src_rate,
                             float * out, int64_t max_out) {
    std::vector<float> vin(in, in + n_in);
    std::vector<float> vout;
    resample(vin, static_cast<uint32_t>(src_rate), &vout);
    const int64_t n = static_cast<int64_t>(vout.size());
    if (out == nullptr) return n;
    const int64_t n_copy = std::min(n, max_out);
    memcpy(out, vout.data(), n_copy * sizeof(float));
    return n_copy;
}

// ---------------------------------------------------------------------------
// Streaming ring buffer (the common-sdl audio_async analog)
// ---------------------------------------------------------------------------

struct OwkRing {
    std::vector<float> buf;
    size_t head = 0;        // next write slot
    size_t len = 0;         // valid samples (<= capacity)
    uint64_t total = 0;     // samples ever written
    std::mutex mu;
};

OWK_API OwkRing * owk_ring_new(int64_t capacity) {
    auto * r = new OwkRing();
    r->buf.resize(static_cast<size_t>(capacity), 0.0f);
    return r;
}

OWK_API void owk_ring_free(OwkRing * r) { delete r; }

OWK_API void owk_ring_write(OwkRing * r, const float * data, int64_t n) {
    std::lock_guard<std::mutex> lock(r->mu);
    const size_t cap = r->buf.size();
    for (int64_t i = 0; i < n; i++) {
        r->buf[r->head] = data[i];
        r->head = (r->head + 1) % cap;
    }
    r->len = std::min(cap, r->len + static_cast<size_t>(n));
    r->total += static_cast<uint64_t>(n);
}

// Copies the most recent n samples (or all available if fewer); returns count.
OWK_API int64_t owk_ring_get(OwkRing * r, int64_t n, float * out) {
    std::lock_guard<std::mutex> lock(r->mu);
    const size_t cap = r->buf.size();
    const size_t take = std::min(static_cast<size_t>(n), r->len);
    size_t start = (r->head + cap - take) % cap;
    for (size_t i = 0; i < take; i++) {
        out[i] = r->buf[(start + i) % cap];
    }
    return static_cast<int64_t>(take);
}

OWK_API void owk_ring_clear(OwkRing * r) {
    std::lock_guard<std::mutex> lock(r->mu);
    r->len = 0;
    r->head = 0;
}

OWK_API int64_t owk_ring_len(OwkRing * r) {
    std::lock_guard<std::mutex> lock(r->mu);
    return static_cast<int64_t>(r->len);
}

// ---------------------------------------------------------------------------
// DSP helpers (energy envelope, high-pass) — vad_simple support
// ---------------------------------------------------------------------------

OWK_API void owk_signal_energy(const float * x, int64_t n, int half_window,
                               float * out) {
    // moving average of |x| (whisper.cpp:8425-8442 semantics)
    std::vector<double> c(static_cast<size_t>(n) + 1, 0.0);
    for (int64_t i = 0; i < n; i++) c[i + 1] = c[i] + std::fabs(x[i]);
    for (int64_t i = 0; i < n; i++) {
        const int64_t lo = std::max<int64_t>(0, i - half_window);
        const int64_t hi = std::min<int64_t>(n - 1, i + half_window);
        out[i] = static_cast<float>((c[hi + 1] - c[lo]) / (2 * half_window + 1));
    }
}

OWK_API void owk_high_pass(float * data, int64_t n, float cutoff,
                           float sample_rate) {
    if (n <= 0) return;
    const float rc = 1.0f / (2.0f * static_cast<float>(M_PI) * cutoff);
    const float dt = 1.0f / sample_rate;
    const float alpha = dt / (rc + dt);
    float y = data[0];
    for (int64_t i = 1; i < n; i++) {
        y = alpha * (y + data[i] - data[i - 1]);
        data[i] = y;
    }
}

// ---------------------------------------------------------------------------
// Live capture (ALSA via dlopen) — the mic loop of the reference's
// examples/common-sdl.cpp audio_async, feeding the same ring buffer.
// libasound is loaded at runtime so the library keeps zero build-time
// dependencies and degrades cleanly on capture-less hosts (this container
// has no /dev/snd): owk_capture_start then reports OWK_CAP_ERR_*.
// ---------------------------------------------------------------------------

#include <dlfcn.h>
#include <cstdlib>
#include <thread>

namespace {

// minimal ALSA surface (alsa/pcm.h), resolved at runtime
typedef struct _snd_pcm snd_pcm_t;
constexpr int SND_PCM_STREAM_CAPTURE_ = 1;
constexpr int SND_PCM_FORMAT_S16_LE_ = 2;
constexpr int SND_PCM_ACCESS_RW_INTERLEAVED_ = 3;

struct AlsaApi {
    int (*open_)(snd_pcm_t **, const char *, int, int) = nullptr;
    int (*set_params)(snd_pcm_t *, int, int, unsigned, unsigned, int,
                      unsigned) = nullptr;
    long (*readi)(snd_pcm_t *, void *, unsigned long) = nullptr;
    int (*recover)(snd_pcm_t *, int, int) = nullptr;
    int (*close_)(snd_pcm_t *) = nullptr;
    void * dl = nullptr;

    bool load() {
        if (dl) return true;
        for (const char * name : {"libasound.so.2", "libasound.so"}) {
            dl = dlopen(name, RTLD_NOW | RTLD_LOCAL);
            if (dl) break;
        }
        if (!dl) return false;
        open_ = reinterpret_cast<decltype(open_)>(dlsym(dl, "snd_pcm_open"));
        set_params = reinterpret_cast<decltype(set_params)>(
            dlsym(dl, "snd_pcm_set_params"));
        readi = reinterpret_cast<decltype(readi)>(dlsym(dl, "snd_pcm_readi"));
        recover = reinterpret_cast<decltype(recover)>(
            dlsym(dl, "snd_pcm_recover"));
        close_ = reinterpret_cast<decltype(close_)>(dlsym(dl, "snd_pcm_close"));
        return open_ && set_params && readi && recover && close_;
    }
};

struct Capture {
    AlsaApi api;
    snd_pcm_t * pcm = nullptr;
    OwkRing * ring = nullptr;
    std::thread worker;
    std::atomic<bool> running{false};
    int rate = kTargetRate;
    std::mutex mu;
};

Capture g_capture;

// If the process exits without owk_capture_stop (caller forgot, or
// interpreter teardown skipped the finally), the joinable worker thread's
// destructor would std::terminate a clean exit. Registered once at first
// capture start; performs the full stop sequence.
void capture_atexit() {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    g_capture.running.store(false);
    if (g_capture.worker.joinable()) g_capture.worker.join();
    if (g_capture.pcm) {
        g_capture.api.close_(g_capture.pcm);
        g_capture.pcm = nullptr;
    }
}

void capture_loop() {
    constexpr unsigned long kChunk = 1024;
    int16_t raw[kChunk];
    float f32[kChunk];
    while (g_capture.running.load(std::memory_order_relaxed)) {
        long n = g_capture.api.readi(g_capture.pcm, raw, kChunk);
        if (n < 0) {
            if (g_capture.api.recover(g_capture.pcm, static_cast<int>(n), 1) < 0) {
                break;
            }
            continue;
        }
        for (long i = 0; i < n; i++) {
            f32[i] = static_cast<float>(raw[i]) / 32768.0f;
        }
        if (n > 0) owk_ring_write(g_capture.ring, f32, n);
    }
}

} // namespace

enum {
    OWK_CAP_OK = 0,
    OWK_CAP_ERR_NO_LIB = -1,     // libasound not found / incomplete
    OWK_CAP_ERR_OPEN = -2,       // device open failed
    OWK_CAP_ERR_PARAMS = -3,     // format negotiation failed
    OWK_CAP_ERR_BUSY = -4,       // capture already running
};

// Start capturing `device` (e.g. "default") at `sample_rate` into an
// internal ring of `buffer_ms` milliseconds. Returns OWK_CAP_OK or an error.
OWK_API int owk_capture_start(const char * device, int sample_rate,
                              int buffer_ms) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (g_capture.running.load()) return OWK_CAP_ERR_BUSY;
    if (!g_capture.api.load()) return OWK_CAP_ERR_NO_LIB;
    if (sample_rate <= 0) sample_rate = kTargetRate;
    if (buffer_ms <= 0) buffer_ms = 30 * 1000;

    snd_pcm_t * pcm = nullptr;
    if (g_capture.api.open_(&pcm, device ? device : "default",
                            SND_PCM_STREAM_CAPTURE_, 0) < 0) {
        return OWK_CAP_ERR_OPEN;
    }
    // mono S16, soft resample to the requested rate, 100 ms latency
    if (g_capture.api.set_params(pcm, SND_PCM_FORMAT_S16_LE_,
                                 SND_PCM_ACCESS_RW_INTERLEAVED_, 1,
                                 static_cast<unsigned>(sample_rate), 1,
                                 100000) < 0) {
        g_capture.api.close_(pcm);
        return OWK_CAP_ERR_PARAMS;
    }
    g_capture.pcm = pcm;
    g_capture.rate = sample_rate;
    if (!g_capture.ring) {
        g_capture.ring = owk_ring_new(
            static_cast<int64_t>(sample_rate) * buffer_ms / 1000);
    }
    owk_ring_clear(g_capture.ring);
    g_capture.running.store(true);
    g_capture.worker = std::thread(capture_loop);
    static bool registered = [] { std::atexit(capture_atexit); return true; }();
    (void)registered;
    return OWK_CAP_OK;
}

// Most recent `ms` milliseconds (or all buffered if ms <= 0); returns the
// sample count copied into `out` (caller sizes it for ms, or buffer_ms).
OWK_API int64_t owk_capture_get(int ms, float * out, int64_t max_samples) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (!g_capture.ring) return 0;
    int64_t want = ms > 0
        ? static_cast<int64_t>(g_capture.rate) * ms / 1000
        : owk_ring_len(g_capture.ring);
    return owk_ring_get(g_capture.ring, std::min(want, max_samples), out);
}

OWK_API void owk_capture_clear(void) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (g_capture.ring) owk_ring_clear(g_capture.ring);
}

OWK_API int owk_capture_running(void) {
    return g_capture.running.load() ? 1 : 0;
}

// Total samples captured since start (ring write counter) — lets pollers
// fetch exactly the unseen tail: get(new = total - seen).
OWK_API int64_t owk_capture_total(void) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (!g_capture.ring) return 0;
    std::lock_guard<std::mutex> rlock(g_capture.ring->mu);
    return static_cast<int64_t>(g_capture.ring->total);
}

// Most recent n samples variant (sample-exact polling).
OWK_API int64_t owk_capture_get_n(int64_t n, float * out) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (!g_capture.ring) return 0;
    return owk_ring_get(g_capture.ring, n, out);
}

OWK_API int owk_capture_stop(void) {
    std::lock_guard<std::mutex> lock(g_capture.mu);
    if (!g_capture.running.load()) return 0;
    g_capture.running.store(false);
    if (g_capture.worker.joinable()) g_capture.worker.join();
    if (g_capture.pcm) {
        g_capture.api.close_(g_capture.pcm);
        g_capture.pcm = nullptr;
    }
    return 0;
}

OWK_API int owk_version(void) { return 2; }
