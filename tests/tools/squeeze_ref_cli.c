/* Golden-vector CLI for the attic "squeeze" codec.
 *
 * Compiles the UNMODIFIED reference headers from the read-only mount
 * (attic/map_experiment/{bitstream,huffman,map,squeeze}.h) into a tiny
 * compress/decompress driver over memory-mode bitstreams (the canonical
 * big-endian word layout, FORMAT.md §1.1). Test-only; built on demand by
 * tests/test_reference_golden.py and skipped when the mount is absent.
 *
 * Usage: squeeze_ref_cli c <win_bits> <in> <out>   compress
 *        squeeze_ref_cli d <in> <out>              decompress
 */
#include <errno.h>
#include <math.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdbool.h>
#include <assert.h>

typedef int errno_t;
#ifndef null
#define null NULL
#endif
#ifndef countof
#define countof(a) (sizeof(a) / sizeof((a)[0]))
#endif

#include "bitstream.h"
#include "huffman.h"
#define squeeze_implementation
#include "squeeze.h"

static uint8_t* read_file(const char* path, size_t* out_size) {
    FILE* f = fopen(path, "rb");
    if (!f) { perror(path); exit(1); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t* buf = malloc(n > 0 ? (size_t)n : 1);
    if ((long)fread(buf, 1, (size_t)n, f) != n) { perror("fread"); exit(1); }
    fclose(f);
    *out_size = (size_t)n;
    return buf;
}

static void write_file(const char* path, const uint8_t* data, size_t n) {
    FILE* f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    if (fwrite(data, 1, n, f) != n && n > 0) { perror("fwrite"); exit(1); }
    fclose(f);
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s c|d ...\n", argv[0]); return 2; }
    if (argv[1][0] == 'c') {
        uint8_t win_bits = (uint8_t)atoi(argv[2]);
        size_t n = 0;
        uint8_t* data = read_file(argv[3], &n);
        size_t cap = n * 2 + 1024;
        uint8_t* out = calloc(1, cap);
        bitstream bs = { .data = out, .capacity = cap };
        squeeze.write_header(&bs, n, win_bits);
        squeeze_type* s = squeeze.alloc(0);
        squeeze.compress(s, &bs, data, n, (uint16_t)(1u << win_bits));
        if (s->error != 0 || bs.error != 0) {
            fprintf(stderr, "compress error %d/%d\n", s->error, bs.error);
            return 1;
        }
        bitstream_flush(&bs);
        write_file(argv[4], out, bs.bytes);
        squeeze.free(s);
    } else {
        size_t n = 0;
        uint8_t* blob = read_file(argv[2], &n);
        bitstream bs = { .data = blob, .capacity = n, .bytes = n };
        uint64_t size = 0;
        uint8_t win_bits = 0;
        squeeze.read_header(&bs, &size, &win_bits);
        if (bs.error != 0) { fprintf(stderr, "header error\n"); return 1; }
        uint8_t* out = calloc(1, size ? size : 1);
        squeeze_type* s = squeeze.alloc(0);
        squeeze.decompress(s, &bs, out, size);
        if (s->error != 0) { fprintf(stderr, "decompress error %d\n", s->error); return 1; }
        write_file(argv[3], out, size);
        squeeze.free(s);
    }
    return 0;
}
