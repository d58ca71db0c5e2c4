/* Native elliptic-curve engine: Jacobian group law, Pippenger MSM, radix-2
 * FFT and batched inversion over the shared Montgomery core (fp_core.h).
 *
 * This is the host-side runtime equivalent of libff's multiexp + libfqfft
 * (SURVEY.md section 2b) — an independent C implementation serving two
 * roles: the fast CPU prover path (zero-hardware recursion tests, serving
 * hosts without a TPU) and the oracle for the TPU kernels at scale.
 *
 * Field elements are vectors of ext_k * nl u64 limbs (ext_k = 1 for Fq,
 * 2 for Fq2 towers with non-residue nr).  Points:
 *   affine:   2 coords + uint8 infinity flag array (separate)
 *   jacobian: 3 coords, Z == 0 encodes infinity.
 * All coordinates Montgomery form.
 */

#include <stdlib.h>

#include "fp_core.h"

#define MAX_EXT 3
#define MAX_EW (MAX_EXT * MAX_LIMBS)

typedef struct {
    fp_ctx fp;
    int k;                 /* extension degree: 1, 2 or 3 */
    int ew;                /* element width in u64 = k * nl */
    u64 nr[MAX_LIMBS];     /* non-residue (Montgomery) for k == 2 */
} ext_ctx;

long ext_ctx_size(void) { return (long)sizeof(ext_ctx); }

void ext_init(ext_ctx *e, int nl, const u64 *mod, const u64 *r2, u64 n0inv,
              int k, const u64 *nr_mont)
{
    e->fp.nl = nl;
    memcpy(e->fp.mod, mod, nl * sizeof(u64));
    memcpy(e->fp.r2, r2, nl * sizeof(u64));
    e->fp.n0inv = n0inv;
    e->k = k;
    e->ew = k * nl;
    if (k >= 2)
        memcpy(e->nr, nr_mont, nl * sizeof(u64));
}

/* -- extension field ops ---------------------------------------------------*/

static void eadd(const ext_ctx *e, u64 *o, const u64 *a, const u64 *b)
{
    for (int i = 0; i < e->k; ++i)
        fp_add(&e->fp, o + i * e->fp.nl, a + i * e->fp.nl, b + i * e->fp.nl);
}

static void esub(const ext_ctx *e, u64 *o, const u64 *a, const u64 *b)
{
    for (int i = 0; i < e->k; ++i)
        fp_sub(&e->fp, o + i * e->fp.nl, a + i * e->fp.nl, b + i * e->fp.nl);
}

static void emul(const ext_ctx *e, u64 *o, const u64 *a, const u64 *b)
{
    const fp_ctx *c = &e->fp;
    int nl = c->nl;
    if (e->k == 1) {
        fp_montmul(c, o, a, b);
        return;
    }
    if (e->k == 2) {
        /* Karatsuba over Fq2 = Fq[u]/(u^2 - nr) */
        u64 t0[MAX_LIMBS], t1[MAX_LIMBS], sa[MAX_LIMBS], sb[MAX_LIMBS],
            mid[MAX_LIMBS], nr_t1[MAX_LIMBS];
        fp_montmul(c, t0, a, b);
        fp_montmul(c, t1, a + nl, b + nl);
        fp_add(c, sa, a, a + nl);
        fp_add(c, sb, b, b + nl);
        fp_montmul(c, mid, sa, sb);
        fp_sub(c, mid, mid, t0);
        fp_sub(c, mid, mid, t1);
        fp_montmul(c, nr_t1, t1, e->nr);
        fp_add(c, o, t0, nr_t1);
        memcpy(o + nl, mid, nl * sizeof(u64));
        return;
    }
    /* Karatsuba over Fq3 = Fq[u]/(u^3 - nr): 6 base muls */
    {
        const u64 *a0 = a, *a1 = a + nl, *a2 = a + 2 * nl;
        const u64 *b0 = b, *b1 = b + nl, *b2 = b + 2 * nl;
        u64 t0[MAX_LIMBS], t1[MAX_LIMBS], t2[MAX_LIMBS];
        u64 s01[MAX_LIMBS], s02[MAX_LIMBS], s12[MAX_LIMBS];
        u64 sa[MAX_LIMBS], sb[MAX_LIMBS], tmp[MAX_LIMBS];
        fp_montmul(c, t0, a0, b0);
        fp_montmul(c, t1, a1, b1);
        fp_montmul(c, t2, a2, b2);
        fp_add(c, sa, a0, a1); fp_add(c, sb, b0, b1);
        fp_montmul(c, s01, sa, sb);
        fp_sub(c, s01, s01, t0); fp_sub(c, s01, s01, t1);
        fp_add(c, sa, a0, a2); fp_add(c, sb, b0, b2);
        fp_montmul(c, s02, sa, sb);
        fp_sub(c, s02, s02, t0); fp_sub(c, s02, s02, t2);
        fp_add(c, sa, a1, a2); fp_add(c, sb, b1, b2);
        fp_montmul(c, s12, sa, sb);
        fp_sub(c, s12, s12, t1); fp_sub(c, s12, s12, t2);
        /* c0 = t0 + nr*s12 ; c1 = s01 + nr*t2 ; c2 = s02 + t1 */
        fp_montmul(c, tmp, s12, e->nr);
        fp_add(c, o, t0, tmp);
        fp_montmul(c, tmp, t2, e->nr);
        fp_add(c, o + nl, s01, tmp);
        fp_add(c, o + 2 * nl, s02, t1);
    }
}

static void esqr(const ext_ctx *e, u64 *o, const u64 *a) { emul(e, o, a, a); }

static void edbl_(const ext_ctx *e, u64 *o, const u64 *a)
{
    eadd(e, o, a, a);
}

static int eis_zero(const ext_ctx *e, const u64 *a)
{
    for (int i = 0; i < e->ew; ++i)
        if (a[i])
            return 0;
    return 1;
}

/* -- Jacobian group law (short Weierstrass, generic a via a_mont) --------- */

typedef struct {
    ext_ctx f;
    u64 a_coeff[MAX_EW]; /* curve a (Montgomery); 0 for BLS/BW6 */
    int a_is_zero;
} curve_ctx;

long curve_ctx_size(void) { return (long)sizeof(curve_ctx); }

void curve_init(curve_ctx *cc, int nl, const u64 *mod, const u64 *r2,
                u64 n0inv, int k, const u64 *nr_mont, const u64 *a_mont)
{
    ext_init(&cc->f, nl, mod, r2, n0inv, k, nr_mont);
    memcpy(cc->a_coeff, a_mont, cc->f.ew * sizeof(u64));
    cc->a_is_zero = eis_zero(&cc->f, a_mont);
}

/* P <- 2P (dbl-2007-bl general-a / dbl-2009-l for a=0). */
static void jac_dbl(const curve_ctx *cc, u64 *X, u64 *Y, u64 *Z)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    u64 A[MAX_EW], B[MAX_EW], C[MAX_EW], D[MAX_EW], E[MAX_EW], F[MAX_EW],
        t[MAX_EW], t2[MAX_EW];
    if (eis_zero(e, Z))
        return;
    esqr(e, A, X);              /* A = X^2 */
    esqr(e, B, Y);              /* B = Y^2 */
    esqr(e, C, B);              /* C = B^2 */
    eadd(e, t, X, B);
    esqr(e, t, t);
    esub(e, t, t, A);
    esub(e, t, t, C);
    edbl_(e, D, t);             /* D = 2((X+B)^2 - A - C) */
    edbl_(e, E, A);
    eadd(e, E, E, A);           /* E = 3A */
    if (!cc->a_is_zero) {       /* + a Z^4 */
        esqr(e, t, Z);
        esqr(e, t, t);
        emul(e, t, t, cc->a_coeff);
        eadd(e, E, E, t);
    }
    esqr(e, F, E);              /* F = E^2 */
    edbl_(e, t, D);
    esub(e, F, F, t);           /* X3 = F - 2D */
    emul(e, t2, Y, Z);
    edbl_(e, Z, t2);            /* Z3 = 2YZ */
    esub(e, t, D, F);
    emul(e, t, E, t);
    edbl_(e, t2, C);
    edbl_(e, t2, t2);
    edbl_(e, t2, t2);
    esub(e, Y, t, t2);          /* Y3 = E(D - X3) - 8C */
    memcpy(X, F, w * sizeof(u64));
}

/* (X,Y,Z) += affine (x2,y2); handles all special cases. */
static void jac_add_mixed(const curve_ctx *cc, u64 *X, u64 *Y, u64 *Z,
                          const u64 *x2, const u64 *y2, const u64 *one_m)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    u64 Z1Z1[MAX_EW], U2[MAX_EW], S2[MAX_EW], H[MAX_EW], R[MAX_EW],
        HH[MAX_EW], I[MAX_EW], J[MAX_EW], V[MAX_EW], t[MAX_EW];
    if (eis_zero(e, Z)) {
        memcpy(X, x2, w * sizeof(u64));
        memcpy(Y, y2, w * sizeof(u64));
        memcpy(Z, one_m, w * sizeof(u64));
        return;
    }
    esqr(e, Z1Z1, Z);
    emul(e, U2, x2, Z1Z1);
    emul(e, S2, Z, Z1Z1);
    emul(e, S2, y2, S2);
    esub(e, H, U2, X);
    esub(e, R, S2, Y);
    if (eis_zero(e, H)) {
        if (eis_zero(e, R)) {
            jac_dbl(cc, X, Y, Z);
            return;
        }
        memset(Z, 0, w * sizeof(u64)); /* inverse: infinity */
        return;
    }
    esqr(e, HH, H);
    edbl_(e, I, HH);
    edbl_(e, I, I);             /* I = 4HH */
    emul(e, J, H, I);
    edbl_(e, R, R);             /* r = 2R */
    emul(e, V, X, I);
    esqr(e, t, R);
    esub(e, t, t, J);
    esub(e, t, t, V);
    esub(e, t, t, V);           /* X3 */
    emul(e, Y, Y, J);
    edbl_(e, Y, Y);             /* 2 Y1 J */
    esub(e, V, V, t);
    emul(e, V, R, V);
    esub(e, Y, V, Y);           /* Y3 = r(V - X3) - 2 Y1 J */
    eadd(e, Z, Z, H);
    esqr(e, Z, Z);
    esub(e, Z, Z, Z1Z1);
    esub(e, Z, Z, HH);          /* Z3 = (Z1+H)^2 - Z1Z1 - HH */
    memcpy(X, t, w * sizeof(u64));
}

/* (X,Y,Z) += (X2,Y2,Z2) full Jacobian (add-2007-bl with special cases). */
static void jac_add(const curve_ctx *cc, u64 *X, u64 *Y, u64 *Z,
                    const u64 *X2, const u64 *Y2, const u64 *Z2)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    if (eis_zero(e, Z2))
        return;
    if (eis_zero(e, Z)) {
        memcpy(X, X2, w * sizeof(u64));
        memcpy(Y, Y2, w * sizeof(u64));
        memcpy(Z, Z2, w * sizeof(u64));
        return;
    }
    u64 Z1Z1[MAX_EW], Z2Z2[MAX_EW], U1[MAX_EW], U2[MAX_EW], S1[MAX_EW],
        S2[MAX_EW], H[MAX_EW], R[MAX_EW], I[MAX_EW], J[MAX_EW], V[MAX_EW],
        t[MAX_EW];
    esqr(e, Z1Z1, Z);
    esqr(e, Z2Z2, Z2);
    emul(e, U1, X, Z2Z2);
    emul(e, U2, X2, Z1Z1);
    emul(e, S1, Z2, Z2Z2);
    emul(e, S1, Y, S1);
    emul(e, S2, Z, Z1Z1);
    emul(e, S2, Y2, S2);
    esub(e, H, U2, U1);
    esub(e, R, S2, S1);
    if (eis_zero(e, H)) {
        if (eis_zero(e, R)) {
            jac_dbl(cc, X, Y, Z);
            return;
        }
        memset(Z, 0, w * sizeof(u64));
        return;
    }
    edbl_(e, I, H);
    esqr(e, I, I);              /* I = (2H)^2 */
    emul(e, J, H, I);
    edbl_(e, R, R);
    emul(e, V, U1, I);
    esqr(e, t, R);
    esub(e, t, t, J);
    esub(e, t, t, V);
    esub(e, t, t, V);           /* X3 */
    emul(e, S1, S1, J);
    edbl_(e, S1, S1);
    esub(e, V, V, t);
    emul(e, V, R, V);
    esub(e, Y, V, S1);          /* Y3 */
    eadd(e, Z, Z, Z2);
    esqr(e, Z, Z);
    esub(e, Z, Z, Z1Z1);
    esub(e, Z, Z, Z2Z2);
    emul(e, Z, Z, H);           /* Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H */
    memcpy(X, t, w * sizeof(u64));
}

/* -- Pippenger MSM ---------------------------------------------------------
 * scalars: n * sbytes bytes little-endian (standard form);
 * points: affine coords x|y interleaved per point (2*ew u64 each) +
 *         uint8 infinity flags; one_m = Montgomery 1 element (ew u64).
 * out: one Jacobian point (3*ew u64).
 */
static void msm_one_window(const curve_ctx *cc, u64 *win_out, u64 *buckets,
                           const uint8_t *scalars, long sbytes,
                           const u64 *pts, const uint8_t *inf, long n,
                           int cbits, long bitpos, const u64 *one_m)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    long nb = 1L << cbits;
    memset(buckets, 0, (size_t)nb * 3 * w * sizeof(u64));
    for (long i = 0; i < n; ++i) {
        if (inf && inf[i])
            continue;
        long byte = bitpos >> 3;
        int shift = (int)(bitpos & 7);
        u64 vraw = 0;
        for (int bby = 0; bby < 4 && byte + bby < sbytes; ++bby)
            vraw |= (u64)scalars[i * sbytes + byte + bby] << (8 * bby);
        u64 d = (vraw >> shift) & (nb - 1);
        if (!d)
            continue;
        u64 *bk = buckets + (size_t)d * 3 * w;
        jac_add_mixed(cc, bk, bk + w, bk + 2 * w, pts + (size_t)i * 2 * w,
                      pts + (size_t)i * 2 * w + w, one_m);
    }
    /* suffix-sum bucket reduction */
    u64 run[3 * MAX_EW];
    memset(run, 0, 3 * w * sizeof(u64));
    memset(win_out, 0, 3 * w * sizeof(u64));
    for (long d = nb - 1; d >= 1; --d) {
        u64 *bk = buckets + (size_t)d * 3 * w;
        jac_add(cc, run, run + w, run + 2 * w, bk, bk + w, bk + 2 * w);
        jac_add(cc, win_out, win_out + w, win_out + 2 * w, run, run + w,
                run + 2 * w);
    }
}

void msm_pippenger(const curve_ctx *cc, u64 *out, const uint8_t *scalars,
                   long sbytes, const u64 *pts, const uint8_t *inf, long n,
                   int cbits, const u64 *one_m)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    int nbits = (int)(sbytes * 8);
    int W = (nbits + cbits - 1) / cbits;
    long nb = 1L << cbits;
    u64 *wins = (u64 *)malloc((size_t)W * 3 * w * sizeof(u64));
    u64 *all_buckets = (u64 *)malloc((size_t)W * nb * 3 * w * sizeof(u64));

    /* windows are independent — parallel across cores (the reference's
     * MULTICORE/OpenMP axis, CMakeLists.txt:80-84) */
#pragma omp parallel for schedule(dynamic)
    for (int win = 0; win < W; ++win)
        msm_one_window(cc, wins + (size_t)win * 3 * w,
                       all_buckets + (size_t)win * nb * 3 * w, scalars,
                       sbytes, pts, inf, n, cbits, (long)win * cbits,
                       one_m);

    u64 *acc = out;
    memset(acc, 0, 3 * w * sizeof(u64));
    for (int win = W - 1; win >= 0; --win) {
        if (win != W - 1)
            for (int b = 0; b < cbits; ++b)
                jac_dbl(cc, acc, acc + w, acc + 2 * w);
        u64 *s = wins + (size_t)win * 3 * w;
        jac_add(cc, acc, acc + w, acc + 2 * w, s, s + w, s + 2 * w);
    }
    free(all_buckets);
    free(wins);
}

/* -- fixed-base batch scalar multiplication (trusted setup) ----------------
 * out[i] = scalars[i] * base, base affine (2*ew u64).  Windowed with an
 * on-the-fly table (2^c entries, Jacobian).
 */
void fixed_base_mul_batch(const curve_ctx *cc, u64 *out,
                          const uint8_t *scalars, long sbytes, long n,
                          const u64 *base_aff, int cbits, const u64 *one_m)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    int nbits = (int)(sbytes * 8);
    int W = (nbits + cbits - 1) / cbits;
    long nb = 1L << cbits;
    /* table[w][d] = d * 2^(c*w) * base (Jacobian) */
    u64 *table = (u64 *)malloc((size_t)W * nb * 3 * w * sizeof(u64));
    u64 cur[3 * MAX_EW];
    memcpy(cur, base_aff, 2 * w * sizeof(u64));
    memcpy(cur + 2 * w, one_m, w * sizeof(u64));
    for (int win = 0; win < W; ++win) {
        u64 *row = table + (size_t)win * nb * 3 * w;
        memset(row, 0, 3 * w * sizeof(u64)); /* d = 0: infinity */
        for (long d = 1; d < nb; ++d) {
            u64 *dst = row + (size_t)d * 3 * w;
            memcpy(dst, row + (size_t)(d - 1) * 3 * w, 3 * w * sizeof(u64));
            jac_add(cc, dst, dst + w, dst + 2 * w, cur, cur + w, cur + 2 * w);
        }
        for (int b = 0; b < cbits; ++b)
            jac_dbl(cc, cur, cur + w, cur + 2 * w);
    }
#pragma omp parallel for schedule(static)
    for (long i = 0; i < n; ++i) {
        u64 *o = out + (size_t)i * 3 * w;
        memset(o, 0, 3 * w * sizeof(u64));
        for (int win = 0; win < W; ++win) {
            long bitpos = (long)win * cbits;
            long byte = bitpos >> 3;
            int shift = (int)(bitpos & 7);
            u64 vraw = 0;
            for (int bby = 0; bby < 4 && byte + bby < sbytes; ++bby)
                vraw |= (u64)scalars[i * sbytes + byte + bby] << (8 * bby);
            u64 d = (vraw >> shift) & (nb - 1);
            if (!d)
                continue;
            const u64 *src = table + ((size_t)win * nb + d) * 3 * w;
            jac_add(cc, o, o + w, o + 2 * w, src, src + w, src + 2 * w);
        }
    }
    free(table);
}

/* -- batched inversion + Jacobian -> affine --------------------------------*/

static void epow(const ext_ctx *e, u64 *out, const u64 *a, const u64 *exp,
                 int explimbs, const u64 *one_m)
{
    int w = e->ew;
    u64 acc[MAX_EW];
    memcpy(acc, one_m, w * sizeof(u64));
    int top = explimbs * 64 - 1;
    while (top >= 0 && !((exp[top / 64] >> (top % 64)) & 1))
        --top;
    for (int b = top; b >= 0; --b) {
        esqr(e, acc, acc);
        if ((exp[b / 64] >> (b % 64)) & 1)
            emul(e, acc, acc, a);
    }
    memcpy(out, acc, w * sizeof(u64));
}

/* out affine pairs + inf flags from n Jacobian points.  exp = p - 2 for the
 * base field (inversion via Fermat on Z products, Montgomery trick). */
void jac_to_affine_batch(const curve_ctx *cc, u64 *out_xy, uint8_t *out_inf,
                         const u64 *jac, long n, const u64 *exp,
                         int explimbs, const u64 *one_m)
{
    const ext_ctx *e = &cc->f;
    int w = e->ew;
    u64 *pref = (u64 *)malloc((size_t)(n + 1) * w * sizeof(u64));
    memcpy(pref, one_m, w * sizeof(u64));
    for (long i = 0; i < n; ++i) {
        const u64 *Z = jac + (size_t)i * 3 * w + 2 * w;
        if (eis_zero(e, Z))
            memcpy(pref + (size_t)(i + 1) * w, pref + (size_t)i * w,
                   w * sizeof(u64));
        else
            emul(e, pref + (size_t)(i + 1) * w, pref + (size_t)i * w, Z);
    }
    u64 inv_all[MAX_EW], zi[MAX_EW], zi2[MAX_EW];
    epow(e, inv_all, pref + (size_t)n * w, exp, explimbs, one_m);
    for (long i = n - 1; i >= 0; --i) {
        const u64 *Z = jac + (size_t)i * 3 * w + 2 * w;
        u64 *oxy = out_xy + (size_t)i * 2 * w;
        if (eis_zero(e, Z)) {
            out_inf[i] = 1;
            memset(oxy, 0, 2 * w * sizeof(u64));
            continue;
        }
        out_inf[i] = 0;
        emul(e, zi, inv_all, pref + (size_t)i * w); /* 1/Z_i */
        emul(e, inv_all, inv_all, Z);
        esqr(e, zi2, zi);
        emul(e, oxy, jac + (size_t)i * 3 * w, zi2);
        emul(e, zi2, zi2, zi);
        emul(e, oxy + w, jac + (size_t)i * 3 * w + w, zi2);
    }
    free(pref);
}

/* -- radix-2 FFT over the base field (k must be 1) --------------------------
 * values: n elements Montgomery form, in place; omega: n-th root
 * (Montgomery); if sinv != NULL multiply all outputs by it (1/n for ifft).
 */
void fft_radix2(const ext_ctx *e, u64 *v, long n, const u64 *omega,
                const u64 *sinv, const u64 *one_m)
{
    const fp_ctx *c = &e->fp;
    int nl = c->nl;
    int bits = 0;
    while ((1L << bits) < n)
        ++bits;
    /* bit reversal */
    for (long i = 0; i < n; ++i) {
        long r = 0;
        for (int b = 0; b < bits; ++b)
            if (i & (1L << b))
                r |= 1L << (bits - 1 - b);
        if (r > i) {
            u64 tmp[MAX_LIMBS];
            memcpy(tmp, v + i * nl, nl * sizeof(u64));
            memcpy(v + i * nl, v + r * nl, nl * sizeof(u64));
            memcpy(v + r * nl, tmp, nl * sizeof(u64));
        }
    }
    u64 *stage_w = (u64 *)malloc((size_t)(n / 2 > 0 ? n / 2 : 1) * nl *
                                 sizeof(u64));
    for (long half = 1; half < n; half <<= 1) {
        /* w = omega^(n / (2 half)) ; twiddles w^0..w^(half-1) */
        u64 wstep[MAX_LIMBS];
        memcpy(wstep, omega, nl * sizeof(u64));
        for (long m = n / (2 * half); m > 1; m >>= 1)
            fp_montmul(c, wstep, wstep, wstep);
        memcpy(stage_w, one_m, nl * sizeof(u64));
        for (long j = 1; j < half; ++j)
            fp_montmul(c, stage_w + j * nl, stage_w + (j - 1) * nl, wstep);
        for (long blk = 0; blk < n; blk += 2 * half) {
            for (long j = 0; j < half; ++j) {
                u64 *u = v + (blk + j) * nl;
                u64 *t = v + (blk + half + j) * nl;
                u64 tv[MAX_LIMBS];
                fp_montmul(c, tv, t, stage_w + j * nl);
                fp_sub(c, t, u, tv);
                fp_add(c, u, u, tv);
            }
        }
    }
    free(stage_w);
    if (sinv)
        for (long i = 0; i < n; ++i)
            fp_montmul(c, v + i * nl, v + i * nl, sinv);
}

/* elementwise ops used by the QAP pipeline (all Montgomery, k == 1) */
void fp_mul_arrays(const ext_ctx *e, u64 *out, const u64 *a, const u64 *b,
                   long n)
{
    for (long i = 0; i < n; ++i)
        fp_montmul(&e->fp, out + i * e->fp.nl, a + i * e->fp.nl,
                   b + i * e->fp.nl);
}

void fp_mul_scalar_sub_mul(const ext_ctx *e, u64 *out, const u64 *a,
                           const u64 *b, const u64 *cc, const u64 *zinv,
                           long n)
{
    /* out = (a*b - cc) * zinv */
    const fp_ctx *c = &e->fp;
    u64 t[MAX_LIMBS];
    for (long i = 0; i < n; ++i) {
        fp_montmul(c, t, a + i * c->nl, b + i * c->nl);
        fp_sub(c, t, t, cc + i * c->nl);
        fp_montmul(c, out + i * c->nl, t, zinv);
    }
}
