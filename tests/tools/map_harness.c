/* Differential harness for the reference hash-map dictionary.
 *
 * Compiles the UNMODIFIED reference src/sqz.c (included via -DSQZ_SRC so
 * its static map_* functions are reachable) and scripts them directly:
 * the Python replica (sqz_tpu/oracle/refmap.py) must reproduce every
 * printed result. The map machinery is dead code at reference HEAD
 * (src/sqz.c:591 clears the map; :656 discards map_best results), so this
 * is the only executable oracle for it.
 *
 * Usage: map_harness <data-file> < script
 * Script lines (offsets/lengths into the data file):
 *   I <n>                      sqz_init with an n-entry map
 *   P <off> <len>              map_put
 *   G <off> <len>              map_get
 *   B <off> <nbytes> <window>  map_best
 *   R <i>                      map_remove
 *   C                          map_clear
 * Results print as lines starting with "= " (map_best's internal
 * extension printf goes to stdout too; consumers filter on the prefix).
 */
#include <errno.h>
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifndef null
#define null NULL
#endif

#include SQZ_SRC   /* the unmodified reference source, statics and all */

static struct sqz g_s;
static struct map_entry* g_entry;

int main(int argc, char** argv) {
    if (argc != 2) { fprintf(stderr, "usage: map_harness <data>\n"); return 2; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("data"); return 2; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t* d = (uint8_t*)malloc((size_t)sz + 1);
    if (fread(d, 1, (size_t)sz, f) != (size_t)sz) { return 2; }
    fclose(f);

    char line[256];
    while (fgets(line, sizeof(line), stdin)) {
        char op; long a = 0, b = 0, c = 0;
        int k = sscanf(line, " %c %ld %ld %ld", &op, &a, &b, &c);
        if (k < 1) { continue; }
        switch (op) {
        case 'I': {
            free(g_entry);
            g_entry = (struct map_entry*)calloc((size_t)a, sizeof(*g_entry));
            sqz_init(&g_s, g_entry, (size_t)a);
            printf("= I %ld\n", a);
            break;
        }
        case 'P': {
            int32_t r = map_put(&g_s, d + a, (uint32_t)b);
            printf("= P %d %d %d %d\n", (int)r, (int)g_s.map.entries,
                   (int)g_s.map.max_chain, (int)g_s.map.max_bytes);
            break;
        }
        case 'G': {
            int32_t r = map_get(&g_s.map, d + a, (uint32_t)b);
            printf("= G %d\n", (int)r);
            break;
        }
        case 'B': {
            uint32_t dist = 0; uint8_t size = 0;
            map_best(&g_s, d + a, (size_t)b, &dist, &size, (uint32_t)c);
            printf("= B %u %u %d\n", dist, (unsigned)size,
                   (int)g_s.map.entries);
            break;
        }
        case 'R': {
            map_remove(&g_s.map, (int32_t)a);
            printf("= R %d\n", (int)g_s.map.entries);
            break;
        }
        case 'C': {
            map_clear(&g_s.map);
            printf("= C\n");
            break;
        }
        default: break;
        }
    }
    fflush(stdout);
    return 0;
}
