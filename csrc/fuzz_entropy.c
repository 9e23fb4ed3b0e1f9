/* ASan fuzz driver for the entropy coders (huffman + rANS v2/v3/v4).
 *
 * Exercises the exact attack surface of the .tdc container: the native
 * decoders fed (a) valid streams, (b) bit/byte-mutated valid streams,
 * (c) random garbage — asserting valid streams round-trip bit-exactly
 * and everything else returns a clean error, never reads out of bounds
 * (build with -fsanitize=address,undefined and run; see csrc/Makefile
 * `make fuzz`).  tests/test_metrics.py runs the same shapes through
 * ctypes; this driver adds sanitizer instrumentation the .so used by
 * Python doesn't carry.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

long tpudct_huff_encode(const int16_t *c, int h, int w, uint8_t *out, long cap);
int tpudct_huff_decode(const uint8_t *d, long n, int h, int w, int16_t *out);
long tpudct_rans_encode(const int16_t *c, int h, int w, uint8_t *out, long cap,
                        int force_bands, int interleave);
int tpudct_rans_decode(const uint8_t *d, long n, int h, int w, int16_t *out);

static uint64_t s_ = 0x9e3779b97f4a7c15ull;
static uint64_t rnd(void) { /* splitmix64 */
    uint64_t z = (s_ += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
}

int main(void) {
    enum { MAXH = 256, MAXW = 256 };
    int16_t *c = malloc(MAXH * MAXW * 2), *back = malloc(MAXH * MAXW * 2);
    long cap = MAXH * MAXW * 4 + 65536;
    uint8_t *buf = malloc(cap), *mut = malloc(cap);
    int iter, checks = 0, v3_seen = 0, v4_seen = 0;
    if (!c || !back || !buf || !mut) return 2;
    for (iter = 0; iter < 400; iter++) {
        int h = (int)(1 + rnd() % (MAXH / 8)) * 8;
        int w = (int)(1 + rnd() % (MAXW / 8)) * 8;
        int bands = (int)(rnd() % 5); /* 0=auto .. 4 */
        int il = (iter & 2) ? 4 : 0;  /* alternate serial / v4 interleave */
        long i, n;
        int m;
        if (iter & 1) {
            /* DCT-like positional statistics: value spread decays with
             * the within-block position, which is what makes the
             * version-adaptive encoder pick the six-band v3 layout —
             * uniform fills never do (their per-band histograms are
             * identical, so the extra tables cannot pay). */
            int big = (h >= 128 && w >= 128);
            for (i = 0; i < (long)h * w; i++) {
                int bi = (int)((i / w) % 8) + (int)(i % w % 8);
                int spread = big ? (64 >> (bi > 6 ? 6 : bi)) : 1;
                uint64_t r = rnd();
                c[i] = (int16_t)(((int)(r % 3) - 1) *
                                 (int)((r >> 8) % (unsigned)(spread + 1)));
            }
        } else {
            for (i = 0; i < (long)h * w; i++) {
                uint64_t r = rnd();
                c[i] = (r & 7) ? 0 : (int16_t)((int)(r >> 8 & 0xff) - 128);
            }
        }
        if (!(iter % 37)) { c[0] = 32767; c[(long)h * w - 1] = -32767; }
        /* rANS: valid roundtrip */
        n = tpudct_rans_encode(c, h, w, buf, cap, bands, il);
        if (n <= 0) { fprintf(stderr, "rans encode failed\n"); return 1; }
        if (buf[0] == 3) v3_seen++;
        if (buf[0] == 4) v4_seen++;
        if (tpudct_rans_decode(buf, n, h, w, back) != 0 ||
            memcmp(c, back, (long)h * w * 2) != 0) {
            fprintf(stderr, "rans roundtrip mismatch h=%d w=%d b=%d\n", h, w, bands);
            return 1;
        }
        checks++;
        /* mutated streams: must not crash (ASan watches) */
        for (m = 0; m < 24; m++) {
            long nm = n;
            memcpy(mut, buf, n);
            for (i = 0; i < 1 + (long)(rnd() % 8); i++)
                mut[rnd() % n] = (uint8_t)rnd();
            if (!(m % 5)) nm = 1 + (long)(rnd() % n); /* truncation */
            tpudct_rans_decode(mut, nm, h, w, back);
        }
        /* huffman: same routine */
        n = tpudct_huff_encode(c, h, w, buf, cap);
        if (n <= 0) { fprintf(stderr, "huff encode failed\n"); return 1; }
        /* adversarial canonical-overflow table: bits[1] = 255 smashed the
         * LUT builder's stack before the round-5 bound (review finding) */
        memcpy(mut, buf, n);
        mut[1] = 255;
        if (tpudct_huff_decode(mut, n, h, w, back) == 0) {
            fprintf(stderr, "overflow table accepted\n");
            return 1;
        }
        if (tpudct_huff_decode(buf, n, h, w, back) != 0 ||
            memcmp(c, back, (long)h * w * 2) != 0) {
            fprintf(stderr, "huff roundtrip mismatch h=%d w=%d\n", h, w);
            return 1;
        }
        checks++;
        for (m = 0; m < 24; m++) {
            long nm = n;
            memcpy(mut, buf, n);
            for (i = 0; i < 1 + (long)(rnd() % 8); i++)
                mut[rnd() % n] = (uint8_t)rnd();
            if (!(m % 5)) nm = 1 + (long)(rnd() % n);
            tpudct_huff_decode(mut, nm, h, w, back);
        }
        /* pure garbage, both decoders */
        for (m = 0; m < 8; m++) {
            long ng = 1 + (long)(rnd() % 4096);
            for (i = 0; i < ng; i++) mut[i] = (uint8_t)rnd();
            mut[0] = (m & 1) ? 2 : (uint8_t)rnd();
            tpudct_rans_decode(mut, ng, h, w, back);
            tpudct_huff_decode(mut, ng, h, w, back);
        }
    }
    if (!v3_seen || !v4_seen) {
        /* every stream version's decode paths must actually be fuzzed */
        fprintf(stderr, "missing stream versions (v3 %d, v4 %d) — fuzz "
                "coverage gap\n", v3_seen, v4_seen);
        return 1;
    }
    printf("fuzz ok: %d valid roundtrips (%d rans-v3, %d rans-v4) + %d "
           "mutated/garbage decodes\n", checks, v3_seen, v4_seen,
           400 * (24 + 24 + 16));
    free(c); free(back); free(buf); free(mut);
    return 0;
}
