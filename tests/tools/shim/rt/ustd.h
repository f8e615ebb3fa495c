/* Test-only shim replacing the reference's Windows-leaning rt/ustd.h so the
 * UNMODIFIED reference codec sources (read-only mount at /root/reference) can
 * be compiled on Linux to produce golden vectors. This header provides only
 * the symbols src/sqz.c actually uses; it shadows the real rt/ustd.h via
 * include-path ordering. Never shipped with the framework. */
#ifndef ustd_shim_h
#define ustd_shim_h

#include <errno.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>
#include <stdint.h>
#include <stdbool.h>
#include <assert.h>

#ifndef null
#define null NULL
#endif

#ifndef countof
#define countof(a) (sizeof(a) / sizeof((a)[0]))
#endif

#ifndef swear
#define swear(b) do { if (!(b)) { fprintf(stderr, "swear failed: %s\n", #b); exit(1); } } while (0)
#endif

#endif
