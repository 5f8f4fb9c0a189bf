/* Cross-implementation oracle harness over the reference whisper.h C API.
 *
 * Built by tests/test_ref_golden.py against the reference CPU build and run
 * on checkpoints authored by open_whisper_kit_tpu.io.ggml_writer, so the
 * TPU framework's numerics can be diffed against the reference runtime
 * without any network access or real weights.
 *
 * Usage:
 *   ref_harness logits model.bin pcm.f32 out.f32 tok0 [tok1 ...]
 *       encode window 0, then decode the given tokens ONE AT A TIME
 *       (exercising the KV cache); dumps the logits row after every step,
 *       concatenated: raw f32 [n_tokens * n_vocab].
 *   ref_harness logits_setmel model.bin mel.f32 out.f32 tok0 [tok1 ...]
 *       same, but the mel comes from the caller via whisper_set_mel
 *       (mel-major f32, n_len inferred from file size) — lets the python
 *       side A/B its own mel against whisper_pcm_to_mel's through the
 *       SAME reference encoder/decoder.
 *   ref_harness full   model.bin pcm.f32
 *       whisper_full greedy/t=0/no-fallback; prints one line per segment:
 *       "<t0>\t<t1>\t<text>".
 *   ref_harness beam   model.bin pcm.f32 beam_size
 *       whisper_full BEAM_SEARCH/t=0/no-fallback with the given beam
 *       width; same per-segment output (the composed beam-transcript
 *       oracle — candidate gathering, dedupe, kv shuffle, scoring,
 *       whisper.cpp:7020-7352/6519-6592).
 */
#include "whisper.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static float * read_f32(const char * path, long * n_out) {
    FILE * f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    float * buf = (float *) malloc(bytes);
    if (fread(buf, 1, bytes, f) != (size_t) bytes) { exit(1); }
    fclose(f);
    *n_out = bytes / 4;
    return buf;
}

int main(int argc, char ** argv) {
    if (argc < 4) { fprintf(stderr, "usage: see header\n"); return 2; }
    const char * mode  = argv[1];
    const char * model = argv[2];
    const char * pcmf  = argv[3];

    struct whisper_context_params cparams = whisper_context_default_params();
    cparams.use_gpu    = false;
    cparams.flash_attn = false;  /* exact-math reference path */
    struct whisper_context * ctx =
        whisper_init_from_file_with_params(model, cparams);
    if (!ctx) { fprintf(stderr, "model load failed\n"); return 1; }

    long n_samples = 0;
    float * pcm = read_f32(pcmf, &n_samples);

    if (strcmp(mode, "logits") == 0 || strcmp(mode, "logits_setmel") == 0) {
        if (argc < 6) { fprintf(stderr, "logits needs out + tokens\n"); return 2; }
        const char * outf = argv[4];
        if (strcmp(mode, "logits_setmel") == 0) {
            const int n_mel = whisper_model_n_mels(ctx);
            if (whisper_set_mel(ctx, pcm, (int) (n_samples / n_mel), n_mel) != 0) return 1;
        } else {
            if (whisper_pcm_to_mel(ctx, pcm, (int) n_samples, 1) != 0) return 1;
        }
        if (whisper_encode(ctx, 0, 1) != 0) return 1;
        FILE * out = fopen(outf, "wb");
        const int n_vocab = whisper_n_vocab(ctx);
        for (int i = 5; i < argc; i++) {
            whisper_token tok = (whisper_token) atoi(argv[i]);
            if (whisper_decode(ctx, &tok, 1, i - 5, 1) != 0) return 1;
            fwrite(whisper_get_logits(ctx), sizeof(float), n_vocab, out);
        }
        fclose(out);
    } else if (strcmp(mode, "beam") == 0) {
        struct whisper_full_params wparams =
            whisper_full_default_params(WHISPER_SAMPLING_BEAM_SEARCH);
        wparams.n_threads             = 1;
        wparams.temperature           = 0.0f;
        wparams.temperature_inc       = -1.0f;  /* no fallback */
        wparams.beam_search.beam_size = argc > 4 ? atoi(argv[4]) : 5;
        wparams.greedy.best_of        = wparams.beam_search.beam_size;
        wparams.print_progress        = false;
        wparams.language              = "en";
        if (whisper_full(ctx, wparams, pcm, (int) n_samples) != 0) return 1;
        const int n = whisper_full_n_segments(ctx);
        for (int i = 0; i < n; i++) {
            printf("%lld\t%lld\t%s\n",
                   (long long) whisper_full_get_segment_t0(ctx, i),
                   (long long) whisper_full_get_segment_t1(ctx, i),
                   whisper_full_get_segment_text(ctx, i));
        }
    } else if (strcmp(mode, "full") == 0) {
        struct whisper_full_params wparams =
            whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
        wparams.n_threads        = 1;
        wparams.temperature      = 0.0f;
        wparams.temperature_inc  = -1.0f;  /* no fallback */
        wparams.greedy.best_of   = 1;
        wparams.debug_mode       = true;
        wparams.print_progress   = false;
        wparams.language         = "en";
        if (whisper_full(ctx, wparams, pcm, (int) n_samples) != 0) return 1;
        const int n = whisper_full_n_segments(ctx);
        for (int i = 0; i < n; i++) {
            printf("%lld\t%lld\t%s\n",
                   (long long) whisper_full_get_segment_t0(ctx, i),
                   (long long) whisper_full_get_segment_t1(ctx, i),
                   whisper_full_get_segment_text(ctx, i));
        }
    } else {
        fprintf(stderr, "unknown mode %s\n", mode);
        return 2;
    }

    whisper_free(ctx);
    free(pcm);
    return 0;
}
