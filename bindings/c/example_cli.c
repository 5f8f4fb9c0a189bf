/* Example: transcribe a wav through the server from C.
 *   ./owk_cli 127.0.0.1 8080 audio.wav '{"response_format":"text"}' */
#include "owk_client.h"
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s host port audio.wav [params_json]\n", argv[0]);
        return 1;
    }
    owk_client c;
    owk_client_init(&c, argv[1], atoi(argv[2]));
    if (owk_health(&c) != 0) {
        fprintf(stderr, "server not healthy\n");
        return 2;
    }
    char *text = owk_transcribe_file(&c, argv[3], argc > 4 ? argv[4] : NULL);
    if (!text) {
        fprintf(stderr, "transcription failed\n");
        return 3;
    }
    printf("%s\n", text);
    free(text);
    return 0;
}
