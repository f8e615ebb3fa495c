/* Golden-vector CLI for the HEAD "sqz4" codec.
 *
 * Compiles the UNMODIFIED reference src/sqz.c from the read-only mount
 * (the rt/ustd.h dependency is satisfied by the minimal shim in
 * tests/tools/shim/). Reference HEAD is literal-only (src/sqz.c:591 forces
 * map.n = 0), so golden vectors cover the literal-only mode; backref mode is
 * covered by our FORMAT.md §2.4 spec and cross-engine tests instead.
 *
 * Usage: sqz4_ref_cli c <in> <out>    compress (container: magic + LE size)
 *        sqz4_ref_cli d <in> <out>    decompress
 */
#include <errno.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifndef null
#define null NULL
#endif

#include "sqz/sqz.h"

typedef struct {
    struct sqz s;               /* rc must stay the first field */
    uint8_t* buf;
    size_t cap, len, pos;
} ctx_t;

static void put_byte(struct range_coder* rc, uint8_t b) {
    ctx_t* c = (ctx_t*)rc;
    if (c->len < c->cap) { c->buf[c->len++] = b; } else { rc->error = E2BIG; }
}

static uint8_t get_byte(struct range_coder* rc) {
    ctx_t* c = (ctx_t*)rc;
    return c->pos < c->len ? c->buf[c->pos++] : 0;
}

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

static const uint8_t magic[8] = {'s','q','u','e','e','z','e','4'};

int main(int argc, char** argv) {
    if (argc != 4) { fprintf(stderr, "usage: %s c|d in out\n", argv[0]); return 2; }
    static ctx_t c;
    if (argv[1][0] == 'c') {
        size_t n = 0;
        uint8_t* data = read_file(argv[2], &n);
        c.cap = n * 2 + 4096;
        c.buf = malloc(c.cap);
        c.s.rc.write = put_byte;
        sqz_init(&c.s, null, 0);  /* literal-only either way at HEAD */
        sqz_compress(&c.s, data, n, 1u << 15);
        if (c.s.rc.error != 0) { fprintf(stderr, "err %d\n", c.s.rc.error); return 1; }
        FILE* f = fopen(argv[3], "wb");
        uint64_t sz = (uint64_t)n;
        uint8_t le[8];
        for (int i = 0; i < 8; i++) { le[i] = (uint8_t)(sz >> (8 * i)); }
        fwrite(magic, 1, 8, f);
        fwrite(le, 1, 8, f);
        fwrite(c.buf, 1, c.len, f);
        fclose(f);
    } else {
        size_t n = 0;
        uint8_t* blob = read_file(argv[2], &n);
        if (n < 16 || memcmp(blob, magic, 8) != 0) { fprintf(stderr, "magic\n"); return 1; }
        uint64_t sz = 0;
        for (int i = 7; i >= 0; i--) { sz = (sz << 8) | blob[8 + i]; }
        c.buf = blob + 16;
        c.len = n - 16;
        c.pos = 0;
        c.s.rc.read = get_byte;
        sqz_init(&c.s, null, 0);
        uint8_t* out = calloc(1, sz ? sz : 1);
        uint64_t got = sqz_decompress(&c.s, out, sz);
        if (c.s.rc.error != 0) { fprintf(stderr, "err %d\n", c.s.rc.error); return 1; }
        write_file(argv[3], out, (size_t)got);
    }
    return 0;
}
