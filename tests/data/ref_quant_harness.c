/* Quantization oracle over the reference ggml library.
 *
 * Usage: ref_quant_harness <ggml_type_int> <n> <in_f32> <out_q> <out_f32>
 *
 * Reads n float32 values, encodes them with the reference's own
 * quantizer (ggml_quantize_chunk; from_float_ref traits for activation
 * formats like q8_K that quantize_chunk rejects), writes the raw encoded
 * block bytes to out_q and the reference's dequantization of those bytes
 * (type traits to_float) to out_f32. tests/test_ref_golden_quant.py then
 * asserts io/quant.py decodes the identical bytes to the identical
 * floats — layout truth for every supported block-quant format.
 */
#include "ggml.h"

#include <stdio.h>
#include <stdlib.h>

/* q8_K has no to_float/from_float in the traits table (ggml.c:833-838);
 * its row functions are exported directly from ggml-quants.c */
void quantize_row_q8_K_ref(const float * x, void * y, int64_t k);
void dequantize_row_q8_K(const void * x, float * y, int64_t k);

int main(int argc, char ** argv) {
    if (argc != 6) { fprintf(stderr, "usage: see header\n"); return 2; }
    enum ggml_type type = (enum ggml_type) atoi(argv[1]);
    const long n = atol(argv[2]);

    float * src = (float *) malloc(n * sizeof(float));
    FILE * f = fopen(argv[3], "rb");
    if (!f || fread(src, sizeof(float), n, f) != (size_t) n) return 1;
    fclose(f);

    const size_t row_bytes = ggml_row_size(type, n);
    void * q = malloc(row_bytes);
    float * back = (float *) malloc(n * sizeof(float));

    if (type == GGML_TYPE_Q8_K) {
        quantize_row_q8_K_ref(src, q, n);
        dequantize_row_q8_K(q, back, n);
    } else {
        const struct ggml_type_traits * tr = ggml_get_type_traits(type);
        if (!tr || !tr->to_float) { fprintf(stderr, "no traits\n"); return 1; }
        float * imat = NULL;
        if (ggml_quantize_requires_imatrix(type)) {
            /* codebook formats need an importance matrix; a uniform one
             * exercises the exact same encode/decode layout */
            imat = (float *) malloc(n * sizeof(float));
            for (long j = 0; j < n; ++j) imat[j] = 1.0f;
        }
        if (ggml_quantize_chunk(type, src, q, 0, 1, n, imat) == 0) return 1;
        tr->to_float(q, back, n);
    }

    f = fopen(argv[4], "wb");
    fwrite(q, 1, row_bytes, f);
    fclose(f);
    f = fopen(argv[5], "wb");
    fwrite(back, sizeof(float), n, f);
    fclose(f);
    return 0;
}
