// Native witness kernels: Goldilocks arithmetic + Poseidon row engine.
//
// The reference's witness oracle is native Rust (SURVEY.md §2.2 L2 — curve
// and field math the generators call from run_once).  Here the host-side
// hot loops of witness generation run in C++ behind a ctypes boundary:
// the Poseidon permutation-with-checkpoints that fills a PoseidonGate row
// (gates/poseidon_gate.py), and batched Goldilocks helpers.
//
// Build: plonky2_tpu/native/__init__.py compiles this with g++ -O3 at
// first import (cached by content hash); pure-Python fallbacks remain.
//
// p = 2^64 - 2^32 + 1.  Reduction uses unsigned __int128.

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL;   // 2^64 mod p

static inline u64 gl_add(u64 a, u64 b) {
    u64 s = a + b;
    if (s < a) s += EPS;                // wrapped: + 2^64 mod p
    if (s >= P) s -= P;
    return s;
}

static inline u64 gl_mul(u64 a, u64 b) {
    u128 t = (u128)a * b;
    u64 lo = (u64)t, hi = (u64)(t >> 64);
    u64 hi_hi = hi >> 32, hi_lo = hi & EPS;
    u64 r = lo - hi_hi;
    if (lo < hi_hi) r -= EPS;           // borrow (wrapping)
    u64 c = hi_lo * EPS;
    r += c;
    if (r < c) r += EPS;
    if (r >= P) r -= P;
    return r;
}

static inline u64 gl_sbox(u64 x) {      // x^7
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    return gl_mul(gl_mul(x3, x3), x);
}

extern "C" {

// Poseidon row engine: for `count` rows, given inputs[count][12] and
// swap[count], write the full PoseidonGate aux/output wire values:
//   out[count][4 + 36 + 22 + 48 + 12] in wire order
//   (delta[4], full1 checkpoints r=1..3 [36], partial s-box lanes [22],
//    full2 checkpoints r=0..3 [48], outputs [12]).
// rc: [n_rounds][12] round constants; mds: [12][12] dense matrix
// (small-entry circulant in the default instantiation, but the dense form
// keeps this independent of that choice); n_full2 = 4, n_partial = 22.
void poseidon_rows(const u64* inputs, const u64* swaps, u64* out,
                   long count, const u64* rc, const u64* mds,
                   int n_full_half, int n_partial) {
    const int W = 12;
    for (long row = 0; row < count; ++row) {
        const u64* in = inputs + row * W;
        u64* o = out + row * (4 + 3 * W + n_partial + 4 * W + W);
        u64 s[12], tmp[12];
        u64 swap = swaps[row];
        // delta_i = swap * (in[4+i] - in[i]);  swapped state
        u64 delta[4];
        for (int i = 0; i < 4; ++i) {
            u64 a = in[4 + i] % P, b = in[i] % P;
            u64 diff = a >= b ? a - b : a + P - b;
            delta[i] = swap ? gl_mul(swap % P, diff) : 0;
            o[i] = delta[i];
        }
        for (int i = 0; i < 4; ++i) s[i] = gl_add(in[i] % P, delta[i]);
        for (int i = 0; i < 4; ++i) {
            u64 a = in[4 + i] % P, d = delta[i];
            s[4 + i] = a >= d ? a - d : a + P - d;
        }
        for (int i = 8; i < 12; ++i) s[i] = in[i] % P;

        int r = 0;
        u64* chk1 = o + 4;                         // 3*12 checkpoints
        u64* part = chk1 + 3 * W;                  // n_partial lanes
        u64* chk2 = part + n_partial;              // 4*12 checkpoints
        u64* outw = chk2 + 4 * W;                  // 12 outputs

        auto mds_layer = [&](u64* st) {
            for (int i = 0; i < W; ++i) {
                u128 acc = 0;
                const u64* mrow = mds + i * W;
                for (int j = 0; j < W; ++j)
                    acc += (u128)mrow[j] * st[j];
                tmp[i] = (u64)(acc % P);
            }
            std::memcpy(st, tmp, sizeof(tmp));
        };

        for (int fr = 0; fr < n_full_half; ++fr) {
            for (int i = 0; i < W; ++i) s[i] = gl_add(s[i], rc[r * W + i]);
            if (fr > 0)
                for (int i = 0; i < W; ++i) chk1[(fr - 1) * W + i] = s[i];
            for (int i = 0; i < W; ++i) s[i] = gl_sbox(s[i]);
            mds_layer(s);
            ++r;
        }
        for (int k = 0; k < n_partial; ++k) {
            for (int i = 0; i < W; ++i) s[i] = gl_add(s[i], rc[r * W + i]);
            part[k] = s[0];
            s[0] = gl_sbox(s[0]);
            mds_layer(s);
            ++r;
        }
        for (int fr = 0; fr < n_full_half; ++fr) {
            for (int i = 0; i < W; ++i) s[i] = gl_add(s[i], rc[r * W + i]);
            for (int i = 0; i < W; ++i) chk2[fr * W + i] = s[i];
            for (int i = 0; i < W; ++i) s[i] = gl_sbox(s[i]);
            mds_layer(s);
            ++r;
        }
        for (int i = 0; i < W; ++i) outw[i] = s[i];
    }
}

// Batched Goldilocks modmul (self-test / host helpers).
void gl_mul_arr(const u64* a, const u64* b, u64* out, long n) {
    for (long i = 0; i < n; ++i) out[i] = gl_mul(a[i] % P, b[i] % P);
}

}  // extern "C"
