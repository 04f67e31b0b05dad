// Host-build shim standing in for the Arduino/ESP-IDF core so the reference
// decoder (mounted read-only at /root/reference) can be compiled on Linux as a
// golden test oracle. Provides exactly the symbols the five decoder TUs use:
// ps_malloc (PSRAM allocator -> plain malloc), the esp log macros, and the
// Arduino min/max. main.cpp (SD/I2S glue) is NOT built; tests/oracle/ref_decode.cpp
// provides the SD_read byte source and drives opus_init_decoder/op_read_stereo.
#pragma once
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <math.h>
#include <assert.h>
#include <limits.h>
#include <stdarg.h>
#include <algorithm>

static inline void* ps_malloc(size_t n) { return malloc(n); }
static inline void* ps_calloc(size_t n, size_t sz) { return calloc(n, sz); }
static inline void* ps_realloc(void* p, size_t n) { return realloc(p, n); }

using std::min;
using std::max;
#define _min(a, b) ((a) < (b) ? (a) : (b))
#define _max(a, b) ((a) > (b) ? (a) : (b))

#define PROGMEM
#define IRAM_ATTR

#ifndef ORACLE_QUIET
#define ORACLE_QUIET 1
#endif
#if ORACLE_QUIET
#define log_i(fmt, ...) do {} while (0)
#define log_w(fmt, ...) do {} while (0)
#define log_d(fmt, ...) do {} while (0)
#define log_e(fmt, ...) fprintf(stderr, "[E] " fmt "\n", ##__VA_ARGS__)
#else
#define log_i(fmt, ...) fprintf(stderr, "[I] " fmt "\n", ##__VA_ARGS__)
#define log_w(fmt, ...) fprintf(stderr, "[W] " fmt "\n", ##__VA_ARGS__)
#define log_d(fmt, ...) fprintf(stderr, "[D] " fmt "\n", ##__VA_ARGS__)
#define log_e(fmt, ...) fprintf(stderr, "[E] " fmt "\n", ##__VA_ARGS__)
#endif
