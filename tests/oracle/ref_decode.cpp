// Golden-oracle harness: compiles the unmodified reference decoder sources
// (/root/reference/src/{ogg,opusfile,opus_decoder,celt,silk}.cpp) against the
// Arduino shim and decodes an Ogg/Opus file to raw interleaved stereo s16le
// 48 kHz PCM, mirroring the device decode loop at
// /root/reference/src/main.cpp:270-282 (opusTask: op_read_stereo(buf, 2048)).
//
// Usage: ref_decode <in.opus> <out.pcm>
// The PCM written here is the bit-exactness target for the TPU framework.
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include "opusfile.h"

static FILE* g_in = nullptr;

// Byte source consumed via the weak hook at /root/reference/src/opusfile.h:19,
// matching the SD card callback semantics at /root/reference/src/main.cpp:264-269
// (0-byte read request -> 0, EOF -> -1).
int SD_read(unsigned char* buff, int nbytes) {
    if (nbytes == 0) return 0;
    int n = (int)fread(buff, 1, (size_t)nbytes, g_in);
    if (n == 0) return -1;
    return n;
}

int main(int argc, char** argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <in.opus> <out.pcm>\n", argv[0]);
        return 2;
    }
    g_in = fopen(argv[1], "rb");
    if (!g_in) { perror("open input"); return 1; }
    FILE* out = fopen(argv[2], "wb");
    if (!out) { perror("open output"); return 1; }

    if (opus_init_decoder() == nullptr) {
        fprintf(stderr, "opus_init_decoder failed\n");
        return 1;
    }
    // Same chunking as the device playback task (src/main.cpp:273).
    static int16_t buf[2048 * 2];
    long total = 0;
    int ret;
    do {
        ret = op_read_stereo(buf, 2048);
        if (ret > 0) {
            fwrite(buf, sizeof(int16_t), (size_t)ret * 2, out);
            total += ret;
        }
    } while (ret > 0);
    fclose(out);
    fclose(g_in);
    fprintf(stderr, "decoded %ld samples/ch (ret=%d)\n", total, ret);
    // OP_EREAD (-128) is the normal termination here: the SD_read hook
    // reports EOF as -1 (src/main.cpp:266) which op_get_data maps to OP_EREAD.
    if (total > 0 && (ret == 0 || ret == OP_EREAD)) return 0;
    return ret < 0 ? 1 : 0;
}
