/* Native witness/constraint engine.
 *
 * The host-side control plane of the prover (sparse R1CS evaluation,
 * satisfiability checks, big Lagrange accumulations) runs over 256..768-bit
 * scalars.  This C engine replaces the Python big-int loops on those paths
 * (the role GMP-backed libff/libsnark plays in the reference's runtime,
 * SURVEY.md section 2b) with fixed-width Montgomery arithmetic:
 * 64-bit limbs, unsigned __int128 partial products, no external deps.
 *
 * Layout conventions (shared with zecale_tpu/native/witness.py):
 *   - field elements are little-endian uint64 limb vectors of fixed length
 *     NL = ceil(bits/64), carried in flat arrays;
 *   - values passed in NON-Montgomery (standard) form; the engine converts
 *     internally where beneficial.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

#define MAX_LIMBS 12 /* up to 768 bits (BW6-761) */

typedef struct {
    int nl;                  /* number of 64-bit limbs */
    u64 mod[MAX_LIMBS];      /* modulus */
    u64 r2[MAX_LIMBS];       /* R^2 mod p (R = 2^(64*nl)) */
    u64 n0inv;               /* -p^-1 mod 2^64 */
} fp_ctx;

/* -- basic fixed-width ops ------------------------------------------------ */

static int geq(const fp_ctx *c, const u64 *a, const u64 *b)
{
    for (int i = c->nl - 1; i >= 0; --i) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static void sub_nocarry(const fp_ctx *c, u64 *out, const u64 *a, const u64 *b)
{
    u128 borrow = 0;
    for (int i = 0; i < c->nl; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        out[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static void addmod_(const fp_ctx *c, u64 *out, const u64 *a, const u64 *b)
{
    u128 carry = 0;
    for (int i = 0; i < c->nl; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        out[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(c, out, c->mod))
        sub_nocarry(c, out, out, c->mod);
}

static void submod_(const fp_ctx *c, u64 *out, const u64 *a, const u64 *b)
{
    u64 tmp[MAX_LIMBS];
    u128 borrow = 0;
    for (int i = 0; i < c->nl; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        tmp[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < c->nl; ++i) {
            u128 s = (u128)tmp[i] + c->mod[i] + carry;
            tmp[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(out, tmp, c->nl * sizeof(u64));
}

/* CIOS Montgomery multiplication. */
static void montmul(const fp_ctx *c, u64 *out, const u64 *a, const u64 *b)
{
    int nl = c->nl;
    u64 t[MAX_LIMBS + 2];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < nl; ++i) {
        u128 carry = 0;
        u64 ai = a[i];
        for (int j = 0; j < nl; ++j) {
            u128 s = (u128)t[j] + (u128)ai * b[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[nl] + carry;
        t[nl] = (u64)s;
        t[nl + 1] = (u64)(s >> 64);

        u64 m = t[0] * c->n0inv;
        carry = ((u128)t[0] + (u128)m * c->mod[0]) >> 64;
        for (int j = 1; j < nl; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * c->mod[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[nl] + carry;
        t[nl - 1] = (u64)s;
        t[nl] = t[nl + 1] + (u64)(s >> 64);
    }
    if (t[nl] || geq(c, t, c->mod))
        sub_nocarry(c, t, t, c->mod);
    memcpy(out, t, nl * sizeof(u64));
}

/* -- exported API --------------------------------------------------------- */

void fp_init(fp_ctx *c, int nl, const u64 *mod, const u64 *r2, u64 n0inv)
{
    c->nl = nl;
    memcpy(c->mod, mod, nl * sizeof(u64));
    memcpy(c->r2, r2, nl * sizeof(u64));
    c->n0inv = n0inv;
}

/* out[i] = a[i] * b[i] mod p over batches (standard form in/out). */
void fp_mulmod_batch(const fp_ctx *c, u64 *out, const u64 *a, const u64 *b,
                     long n)
{
    int nl = c->nl;
    u64 am[MAX_LIMBS], bm[MAX_LIMBS], one[MAX_LIMBS];
    for (long i = 0; i < n; ++i) {
        montmul(c, am, a + i * nl, c->r2);
        montmul(c, bm, b + i * nl, c->r2);
        montmul(c, am, am, bm);
        memset(one, 0, sizeof(one));
        one[0] = 1;
        montmul(c, out + i * nl, am, one);
    }
}

/* Sparse linear-combination evaluation:
 *   for each term k: acc[row[k]] += coeff[k] * assignment[col[k]]  (mod p)
 * rows must be grouped (any order within a row).  Assignment and coeffs in
 * standard form; result in standard form.
 */
void lc_matvec(const fp_ctx *c, u64 *out_rows, long num_rows,
               const int32_t *rows, const int32_t *cols, const u64 *coeffs_m,
               const u64 *assignment_m, long nnz)
{
    int nl = c->nl;
    memset(out_rows, 0, (size_t)num_rows * nl * sizeof(u64));
    u64 prod[MAX_LIMBS];
    for (long k = 0; k < nnz; ++k) {
        const u64 *cf = coeffs_m + (size_t)k * nl;
        const u64 *av = assignment_m + (size_t)cols[k] * nl;
        montmul(c, prod, cf, av); /* both Montgomery -> Montgomery product */
        u64 *dst = out_rows + (size_t)rows[k] * nl;
        addmod_(c, dst, dst, prod);
    }
}

/* Batched to/from Montgomery conversion. */
void fp_to_mont_batch(const fp_ctx *c, u64 *out, const u64 *in, long n)
{
    for (long i = 0; i < n; ++i)
        montmul(c, out + i * c->nl, in + i * c->nl, c->r2);
}

void fp_from_mont_batch(const fp_ctx *c, u64 *out, const u64 *in, long n)
{
    u64 one[MAX_LIMBS];
    memset(one, 0, sizeof(one));
    one[0] = 1;
    for (long i = 0; i < n; ++i)
        montmul(c, out + i * c->nl, in + i * c->nl, one);
}

/* R1CS satisfiability: returns the first failing constraint index or -1.
 * All inputs in Montgomery form; az/bz/cz are per-row evaluations already
 * computed by lc_matvec.
 */
long r1cs_first_failing(const fp_ctx *c, const u64 *az, const u64 *bz,
                        const u64 *cz, long rows)
{
    u64 ab[MAX_LIMBS];
    for (long i = 0; i < rows; ++i) {
        montmul(c, ab, az + i * c->nl, bz + i * c->nl);
        if (memcmp(ab, cz + i * c->nl, c->nl * sizeof(u64)) != 0)
            return i;
    }
    return -1;
}

long fp_ctx_size(void) { return (long)sizeof(fp_ctx); }
