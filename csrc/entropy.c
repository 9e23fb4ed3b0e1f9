/* JPEG-grade entropy coding for quantized coefficient maps (.tdc codec 2).
 *
 * The reference never persists its compressed payload at all (the only
 * artifact is a quality-100 libjpeg re-encode of the reconstruction,
 * utils.cu:98-147), so its compression factor is unmeasurable end-to-end.
 * tpudct's .tdc container stores the quantized map; round 1 entropy-coded
 * it as spectral-reorder + zlib.  This module is the round-2 upgrade to
 * the real JPEG entropy stage (ITU-T T.81 §F): per-block zig-zag scan,
 * DC delta + AC (run,size) symbols with appended magnitude bits, and
 * OPTIMAL canonical Huffman tables built from the image's own symbol
 * histogram (the §K.2 two-pass algorithm libjpeg runs under -optimize).
 *
 * Differences from an interchange JPEG stream (this is a container
 * payload, not a .jpg): no marker segments, no 0xFF byte stuffing, DC
 * symbols may exceed 11 (int16 deltas reach size 17), AC sizes may reach
 * 15, and the two table descriptors are stored raw (BITS[16] + HUFFVAL).
 *
 * Stream layout:
 *   u8  version (=1)
 *   DC table: 16 x u8 BITS, then sum(BITS) x u8 HUFFVAL
 *   AC table: same
 *   u32le payload_bits
 *   ceil(payload_bits/8) bytes of MSB-first bitstream
 *
 * Exported (ctypes, see tpudct/utils/entropy.py):
 *   tpudct_huff_encode(coeffs, h, w, out, cap) -> bytes written | -1
 *   tpudct_huff_decode(data, n, h, w, out)     -> 0 | negative error
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NSYM 256 /* symbol alphabet: DC size / AC (run<<4|size) bytes */

/* zig-zag index -> row-major index within an 8x8 block (ITU-T T.81 Fig 5) */
static const uint8_t ZZ[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

static int bit_size(int v) { /* JPEG magnitude category */
    int a = v < 0 ? -v : v, s = 0;
    while (a) { s++; a >>= 1; }
    return s;
}

/* ---- optimal code lengths (ITU-T T.81 Annex K.2, as in libjpeg) ---------- */

static void count_code_sizes(long freq[NSYM + 1], int codesize[NSYM + 1]) {
    int others[NSYM + 1];
    int i;
    for (i = 0; i <= NSYM; i++) { codesize[i] = 0; others[i] = -1; }
    freq[NSYM] = 1; /* reserved symbol guarantees no all-ones code */
    for (;;) {
        int c1 = -1, c2 = -1;
        long v1 = 0x7fffffffL, v2 = 0x7fffffffL;
        for (i = 0; i <= NSYM; i++) {
            if (freq[i] && freq[i] <= v1) { v2 = v1; c2 = c1; v1 = freq[i]; c1 = i; }
            else if (freq[i] && freq[i] <= v2) { v2 = freq[i]; c2 = i; }
        }
        if (c2 < 0) break;
        freq[c1] += freq[c2];
        freq[c2] = 0;
        codesize[c1]++;
        while (others[c1] >= 0) { c1 = others[c1]; codesize[c1]++; }
        others[c1] = c2;
        codesize[c2]++;
        while (others[c2] >= 0) { c2 = others[c2]; codesize[c2]++; }
    }
}

static int build_table(const long *histogram, uint8_t bits[17], uint8_t *huffval) {
    long freq[NSYM + 1];
    int codesize[NSYM + 1];
    int counts[65] = {0};
    int i, j, n = 0;
    memcpy(freq, histogram, sizeof(long) * NSYM);
    count_code_sizes(freq, codesize);
    for (i = 0; i <= NSYM; i++)
        if (codesize[i]) counts[codesize[i] > 64 ? 64 : codesize[i]]++;
    /* limit code length to 16 (T.81 Figure K.3) */
    for (i = 64; i > 16; i--) {
        while (counts[i] > 0) {
            j = i - 2;
            while (counts[j] == 0) j--;
            counts[i] -= 2;
            counts[i - 1]++;
            counts[j + 1] += 2;
            counts[j]--;
        }
    }
    while (i > 0 && counts[i] == 0) i--;
    if (i > 0) counts[i]--; /* drop the reserved symbol's slot */
    memset(bits, 0, 17);
    for (i = 1; i <= 16; i++) bits[i] = (uint8_t)counts[i];
    /* symbols sorted by (codesize, value); reserved NSYM excluded */
    for (i = 1; i <= 64; i++)
        for (j = 0; j < NSYM; j++)
            if (codesize[j] == i) huffval[n++] = (uint8_t)j;
    return n;
}

/* canonical code assignment (T.81 Figure C.2) */
static void assign_codes(const uint8_t bits[17], const uint8_t *huffval,
                         uint16_t ecode[NSYM], uint8_t esize[NSYM]) {
    int i, k = 0;
    uint16_t code = 0;
    memset(esize, 0, NSYM);
    for (i = 1; i <= 16; i++) {
        int n = bits[i];
        while (n--) {
            ecode[huffval[k]] = code++;
            esize[huffval[k]] = (uint8_t)i;
            k++;
        }
        code <<= 1;
    }
}

/* ---- bit I/O ------------------------------------------------------------- */

typedef struct {
    uint8_t *buf;
    long cap, pos;  /* bytes */
    uint64_t acc;
    int nbits;
    int overflow;
} BitWriter;

static void bw_put(BitWriter *w, uint32_t v, int n) {
    if (!n) return;
    w->acc = (w->acc << n) | (v & ((1u << n) - 1));
    w->nbits += n;
    while (w->nbits >= 8) {
        if (w->pos >= w->cap) { w->overflow = 1; return; }
        w->buf[w->pos++] = (uint8_t)(w->acc >> (w->nbits - 8));
        w->nbits -= 8;
    }
}

static long bw_flush(BitWriter *w) { /* returns total BITS written */
    long bits = w->pos * 8 + w->nbits;
    if (w->nbits) {
        if (w->pos >= w->cap) { w->overflow = 1; return bits; }
        w->buf[w->pos++] = (uint8_t)(w->acc << (8 - w->nbits));
        w->nbits = 0;
    }
    return bits;
}

typedef struct {
    const uint8_t *buf;
    long nbits, pos; /* bit cursor */
} BitReader;

static int br_bit(BitReader *r) {
    if (r->pos >= r->nbits) return -1;
    int b = (r->buf[r->pos >> 3] >> (7 - (r->pos & 7))) & 1;
    r->pos++;
    return b;
}

static long br_bits(BitReader *r, int n) {
    long v = 0;
    while (n--) {
        int b = br_bit(r);
        if (b < 0) return -1;
        v = (v << 1) | b;
    }
    return v;
}

/* ---- per-block symbolization --------------------------------------------- */

typedef void (*SymbolSink)(void *ctx, int table /*0=DC 1=AC*/, int sym,
                           int extra_bits, uint32_t extra);

static void emit_blocks(const int16_t *c, int h, int w, SymbolSink sink, void *ctx) {
    int by, bx, k;
    int prev_dc = 0;
    for (by = 0; by < h / 8; by++) {
        for (bx = 0; bx < w / 8; bx++) {
            const int16_t *blk = c + (long)by * 8 * w + bx * 8;
            int16_t zz[64];
            int diff, s, run, last;
            for (k = 0; k < 64; k++)
                zz[k] = blk[(ZZ[k] >> 3) * (long)w + (ZZ[k] & 7)];
            diff = zz[0] - prev_dc;
            prev_dc = zz[0];
            s = bit_size(diff);
            sink(ctx, 0, s, s, (uint32_t)(diff < 0 ? diff + ((1L << s) - 1) : diff));
            last = 63;
            while (last >= 1 && zz[last] == 0) last--;
            run = 0;
            for (k = 1; k <= last; k++) {
                if (zz[k] == 0) { run++; continue; }
                while (run > 15) { sink(ctx, 1, 0xF0, 0, 0); run -= 16; }
                s = bit_size(zz[k]);
                sink(ctx, 1, (run << 4) | s, s,
                     (uint32_t)(zz[k] < 0 ? zz[k] + ((1 << s) - 1) : zz[k]));
                run = 0;
            }
            if (last < 63) sink(ctx, 1, 0x00, 0, 0); /* EOB */
        }
    }
}

typedef struct { long dc[NSYM]; long ac[NSYM]; } Hist;

static void hist_sink(void *ctx, int table, int sym, int eb, uint32_t ev) {
    Hist *hs = (Hist *)ctx;
    (void)eb; (void)ev;
    (table ? hs->ac : hs->dc)[sym]++;
}

typedef struct {
    BitWriter *w;
    uint16_t dcode[NSYM]; uint8_t dsize[NSYM];
    uint16_t acode[NSYM]; uint8_t asize[NSYM];
    int bad;
} EncCtx;

static void enc_sink(void *ctx, int table, int sym, int eb, uint32_t ev) {
    EncCtx *e = (EncCtx *)ctx;
    const uint16_t *codes = table ? e->acode : e->dcode;
    const uint8_t *sizes = table ? e->asize : e->dsize;
    if (!sizes[sym]) { e->bad = 1; return; }
    bw_put(e->w, codes[sym], sizes[sym]);
    if (eb) bw_put(e->w, ev, eb);
}

/* ---- public API ---------------------------------------------------------- */

long tpudct_huff_encode(const int16_t *coeffs, int h, int w,
                        uint8_t *out, long cap) {
    Hist hist;
    uint8_t dbits[17], abits[17], dval[NSYM], aval[NSYM];
    int ndc, nac;
    long head, bits_pos, total_bits;
    EncCtx e;
    BitWriter bw;
    if (h <= 0 || w <= 0 || (h % 8) || (w % 8)) return -1;
    memset(&hist, 0, sizeof(hist));
    emit_blocks(coeffs, h, w, hist_sink, &hist);
    ndc = build_table(hist.dc, dbits, dval);
    nac = build_table(hist.ac, abits, aval);
    head = 1 + 16 + ndc + 16 + nac + 4;
    if (cap < head) return -1;
    out[0] = 1;
    memcpy(out + 1, dbits + 1, 16);
    memcpy(out + 17, dval, ndc);
    memcpy(out + 17 + ndc, abits + 1, 16);
    memcpy(out + 33 + ndc, aval, nac);
    bits_pos = 33 + ndc + nac;
    memset(&e, 0, sizeof(e));
    assign_codes(dbits, dval, e.dcode, e.dsize);
    assign_codes(abits, aval, e.acode, e.asize);
    bw.buf = out + head;
    bw.cap = cap - head;
    bw.pos = 0; bw.acc = 0; bw.nbits = 0; bw.overflow = 0;
    e.w = &bw;
    emit_blocks(coeffs, h, w, enc_sink, &e);
    total_bits = bw_flush(&bw);
    if (e.bad || bw.overflow) return -1;
    out[bits_pos + 0] = (uint8_t)(total_bits & 0xff);
    out[bits_pos + 1] = (uint8_t)((total_bits >> 8) & 0xff);
    out[bits_pos + 2] = (uint8_t)((total_bits >> 16) & 0xff);
    out[bits_pos + 3] = (uint8_t)((total_bits >> 24) & 0xff);
    return head + bw.pos;
}

/* decode-side table (T.81 Figure F.15) */
typedef struct {
    long mincode[17], maxcode[18];
    int valptr[17];
    uint8_t huffval[NSYM];
} DecTable;

static void dec_table(const uint8_t bits[17], const uint8_t *huffval, DecTable *t) {
    int i, k = 0;
    long code = 0;
    memcpy(t->huffval, huffval, NSYM);
    for (i = 1; i <= 16; i++) {
        t->valptr[i] = k;
        t->mincode[i] = code;
        code += bits[i];
        k += bits[i];
        t->maxcode[i] = code - 1;
        code <<= 1;
        if (!bits[i]) t->maxcode[i] = -1;
    }
    t->maxcode[17] = 0x7fffffffL;
}

static int dec_sym(BitReader *r, const DecTable *t) {
    int i = 1, b = br_bit(r);
    long code;
    if (b < 0) return -1;
    code = b;
    while (t->maxcode[i] < 0 || code > t->maxcode[i]) {
        if (++i > 16) return -1;
        b = br_bit(r);
        if (b < 0) return -1;
        code = (code << 1) | b;
    }
    return t->huffval[t->valptr[i] + (int)(code - t->mincode[i])];
}

static long extend(long v, int s) { /* T.81 F.12: magnitude bits -> value */
    return (s && v < (1L << (s - 1))) ? v - (1L << s) + 1 : v;
}

int tpudct_huff_decode(const uint8_t *data, long n, int h, int w, int16_t *out) {
    DecTable dct, act;
    uint8_t dbits[17] = {0}, abits[17] = {0}, dval[NSYM], aval[NSYM];
    int ndc = 0, nac = 0, i;
    long off, total_bits, prev_dc = 0;
    BitReader br;
    int by, bx, k;
    if (h <= 0 || w <= 0 || (h % 8) || (w % 8)) return -2;
    if (n < 1 || data[0] != 1) return -3;
    if (n < 17) return -4;
    for (i = 1; i <= 16; i++) { dbits[i] = data[i]; ndc += data[i]; }
    if (ndc > NSYM || n < 17 + ndc + 16) return -4;
    memset(dval, 0, NSYM);
    memcpy(dval, data + 17, ndc);
    for (i = 1; i <= 16; i++) { abits[i] = data[17 + ndc + i - 1]; nac += abits[i]; }
    if (nac > NSYM || n < 33 + ndc + nac + 4) return -4;
    memset(aval, 0, NSYM);
    memcpy(aval, data + 33 + ndc, nac);
    off = 33 + ndc + nac;
    total_bits = (long)data[off] | ((long)data[off + 1] << 8) |
                 ((long)data[off + 2] << 16) | ((long)data[off + 3] << 24);
    off += 4;
    if ((n - off) * 8 < total_bits) return -4;
    dec_table(dbits, dval, &dct);
    dec_table(abits, aval, &act);
    br.buf = data + off;
    br.nbits = total_bits;
    br.pos = 0;
    memset(out, 0, sizeof(int16_t) * (long)h * w);
    for (by = 0; by < h / 8; by++) {
        for (bx = 0; bx < w / 8; bx++) {
            int16_t *blk = out + (long)by * 8 * w + bx * 8;
            int s = dec_sym(&br, &dct);
            long v;
            if (s < 0) return -5;
            v = s ? br_bits(&br, s) : 0;
            if (v < 0) return -5;
            prev_dc += extend(v, s);
            blk[0] = (int16_t)prev_dc;
            k = 1;
            while (k < 64) {
                int sym = dec_sym(&br, &act);
                int run, size;
                if (sym < 0) return -5;
                if (sym == 0x00) break; /* EOB */
                run = sym >> 4;
                size = sym & 15;
                if (sym == 0xF0) { k += 16; continue; }
                k += run;
                if (k > 63) return -6;
                v = br_bits(&br, size);
                if (v < 0) return -5;
                blk[(ZZ[k] >> 3) * (long)w + (ZZ[k] & 7)] = (int16_t)extend(v, size);
                k++;
            }
        }
    }
    return 0;
}
