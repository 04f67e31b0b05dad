// Loss-simulation oracle: decodes a length-prefixed packet dump through the
// reference multistream decoder, replacing every loss_period-th packet with
// a NULL (lost) decode. Exercises the reference's data==NULL path
// (src/opus_decoder.cpp:294-307: PLC loop) for parity testing.
//
// Packet dump format: u32 count, then per packet u32 len + bytes.
// Usage: ref_plc <packets.bin> <out.pcm> <channels> <loss_period>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include "opus_decoder.h"

extern bool SILKDecoder_AllocateBuffers();
extern bool CELTDecoder_AllocateBuffers(void);

int main(int argc, char** argv) {
    if (argc != 5) {
        fprintf(stderr,
                "usage: %s <packets.bin> <out.pcm> <ch> <loss_period>\n",
                argv[0]);
        return 2;
    }
    FILE* in = fopen(argv[1], "rb");
    FILE* out = fopen(argv[2], "wb");
    int ch = atoi(argv[3]);
    int loss_period = atoi(argv[4]);
    if (!in || !out) { perror("open"); return 1; }

    SILKDecoder_AllocateBuffers();
    CELTDecoder_AllocateBuffers();
    unsigned char mapping[2] = {0, 1};
    int err = 0;
    OpusMSDecoder_t* st = opus_multistream_decoder_create(
        48000, ch, 1, ch - 1, mapping, &err);
    if (!st || err) { fprintf(stderr, "create failed %d\n", err); return 1; }

    uint32_t count = 0;
    fread(&count, 4, 1, in);
    static int16_t buf[5760 * 2];
    static uint8_t pkt[4000];
    for (uint32_t i = 0; i < count; i++) {
        uint32_t len = 0;
        fread(&len, 4, 1, in);
        if (len > sizeof pkt) return 1;
        fread(pkt, 1, len, in);
        int ret;
        if (loss_period > 0 && i > 0 && (i % loss_period) == 0) {
            ret = opus_multistream_decode(st, NULL, 0, buf, 960);
        } else {
            ret = opus_multistream_decode(st, pkt, len, buf, 960);
        }
        if (ret < 0) { fprintf(stderr, "pkt %u -> %d\n", i, ret); return 1; }
        fwrite(buf, sizeof(int16_t), (size_t)ret * ch, out);
    }
    fclose(in); fclose(out);
    return 0;
}
