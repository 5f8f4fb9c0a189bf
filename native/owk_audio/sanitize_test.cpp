// Sanitizer self-test for the native audio runtime: exercises every
// pure-CPU entry point (WAV decode incl. malformed inputs, sinc resampler,
// ring buffer incl. a concurrent writer/reader, energy, high-pass) so an
// ASan/UBSan/TSan build has real work to check. The reference gates the
// same three sanitizers behind WHISPER_SANITIZE_{THREAD,ADDRESS,UNDEFINED}
// (CMakeLists.txt:74-76); this is the owk_audio equivalent.
//
// Build + run: make sanitize   (tools/ci.sh "native sanitizers" stage)
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
int64_t owk_decode_wav(const uint8_t *buf, int64_t n_bytes, int stereo,
                       float *out, int64_t max_frames);
int64_t owk_resample(const float *in, int64_t n_in, int src_rate,
                     float *out, int64_t max_out);
struct OwkRing;
OwkRing *owk_ring_new(int64_t capacity);
void owk_ring_free(OwkRing *r);
void owk_ring_write(OwkRing *r, const float *data, int64_t n);
int64_t owk_ring_get(OwkRing *r, int64_t n, float *out);
void owk_ring_clear(OwkRing *r);
int64_t owk_ring_len(OwkRing *r);
void owk_signal_energy(const float *x, int64_t n, int half_window,
                       float *out);
void owk_high_pass(float *data, int64_t n, float cutoff, int sample_rate);
int owk_version(void);
}

// minimal in-memory 16-bit PCM WAV writer
static std::vector<uint8_t> make_wav(int rate, int channels, int n_frames) {
    int data_bytes = n_frames * channels * 2;
    std::vector<uint8_t> w(44 + data_bytes);
    auto p32 = [&](int off, uint32_t v) { memcpy(&w[off], &v, 4); };
    auto p16 = [&](int off, uint16_t v) { memcpy(&w[off], &v, 2); };
    memcpy(&w[0], "RIFF", 4); p32(4, 36 + data_bytes);
    memcpy(&w[8], "WAVEfmt ", 8); p32(16, 16); p16(20, 1);
    p16(22, (uint16_t)channels); p32(24, (uint32_t)rate);
    p32(28, (uint32_t)(rate * channels * 2)); p16(32, (uint16_t)(channels * 2));
    p16(34, 16);
    memcpy(&w[36], "data", 4); p32(40, data_bytes);
    for (int i = 0; i < n_frames * channels; i++) {
        int16_t s = (int16_t)(10000.0 * sin(0.05 * i));
        memcpy(&w[44 + 2 * i], &s, 2);
    }
    return w;
}

int main() {
    assert(owk_version() >= 2);

    // WAV decode: stereo 44.1k -> mono 16k (decode + downmix + resample)
    auto wav = make_wav(44100, 2, 44100);
    int64_t need = owk_decode_wav(wav.data(), (int64_t)wav.size(), 0,
                                  nullptr, 0);
    assert(need > 15000 && need < 17000);
    std::vector<float> pcm((size_t)need);
    int64_t n = owk_decode_wav(wav.data(), (int64_t)wav.size(), 0,
                               pcm.data(), need);
    assert(n == need);
    // stereo output path (channel-energy pseudo-diarization input)
    std::vector<float> pcm2(2 * (size_t)need);
    (void)owk_decode_wav(wav.data(), (int64_t)wav.size(), 1,
                         pcm2.data(), need);

    // malformed inputs must fail cleanly, not read out of bounds
    float dummy[8];
    assert(owk_decode_wav(wav.data(), 10, 0, dummy, 8) < 0);
    auto bad = wav;
    bad[40] = 0xff; bad[41] = 0xff; bad[42] = 0xff; bad[43] = 0x7f;
    (void)owk_decode_wav(bad.data(), (int64_t)bad.size(), 0, dummy, 8);
    std::vector<uint8_t> tiny(44, 0);
    (void)owk_decode_wav(tiny.data(), 44, 0, dummy, 8);

    // resampler edge rates (output is always 16 kHz)
    std::vector<float> in(4800, 0.25f);
    std::vector<float> res(16000);
    int64_t m = owk_resample(in.data(), (int64_t)in.size(), 48000,
                             res.data(), (int64_t)res.size());
    assert(m >= 1590 && m <= 1610);
    m = owk_resample(in.data(), 1, 8000, res.data(), (int64_t)res.size());
    assert(m >= 1);

    // ring buffer: concurrent writer vs reader (the capture-thread pattern)
    OwkRing *r = owk_ring_new(4096);
    std::thread writer([&] {
        std::vector<float> chunk(160, 1.0f);
        for (int i = 0; i < 200; i++) owk_ring_write(r, chunk.data(), 160);
    });
    std::vector<float> buf(1024);
    int64_t got = 0;
    for (int i = 0; i < 400 && got < 160 * 50; i++)
        got += owk_ring_get(r, 512, buf.data());
    writer.join();
    owk_ring_clear(r);
    assert(owk_ring_len(r) == 0);
    owk_ring_free(r);

    // energy + high-pass over a non-trivial signal
    std::vector<float> sig(16000);
    for (size_t i = 0; i < sig.size(); i++)
        sig[i] = (float)sin(0.01 * (double)i);
    std::vector<float> energy(sig.size());
    owk_signal_energy(sig.data(), (int64_t)sig.size(), 32, energy.data());
    owk_high_pass(sig.data(), (int64_t)sig.size(), 100.0f, 16000);

    printf("owk_audio sanitize test ok\n");
    return 0;
}
