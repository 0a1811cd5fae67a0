// hostmath — native host-side field/curve/MSM library.
//
// The TPU-native counterpart of the reference's mcl C++ layer
// (reference: mcl-rust FFI behind src/bls12_381/building_block/, SURVEY.md
// L0): the device path is JAX/XLA; this library is the fast HOST path —
// proof (de)serialization checks, transcript point decompression, test-vector
// generation, and a CPU fallback oracle ~1000x faster than the pure-Python
// golden model.
//
// Design: fixed 64-bit-limb Montgomery arithmetic, generic over modulus
// (4 limbs for <=256-bit fields, 6 limbs for bls12-381 Fq), complete
// projective/extended point formulas (same as the device path: RCB a=0 and
// twisted-Edwards a=-1), windowed-NAF-free Pippenger bucket MSM.
//
// Exposed as a C ABI consumed via ctypes (native/hostmath.py).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

constexpr int MAXL = 6;

struct FieldCtx {
  int L;             // limbs
  u64 p[MAXL];       // modulus
  u64 r2[MAXL];      // R^2 mod p
  u64 one[MAXL];     // R mod p (Montgomery 1)
  u64 n0inv;         // -p^-1 mod 2^64
};

inline bool geq(const u64* a, const u64* b, int L) {
  for (int i = L - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_raw(u64* r, const u64* a, const u64* b, int L) {
  u128 borrow = 0;
  for (int i = 0; i < L; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void fadd(const FieldCtx& f, u64* r, const u64* a, const u64* b) {
  u128 carry = 0;
  u64 t[MAXL + 1];
  for (int i = 0; i < f.L; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  t[f.L] = (u64)carry;
  if (t[f.L] || geq(t, f.p, f.L)) {
    sub_raw(r, t, f.p, f.L);
  } else {
    std::memcpy(r, t, f.L * 8);
  }
}

inline void fsub(const FieldCtx& f, u64* r, const u64* a, const u64* b) {
  if (geq(a, b, f.L)) {
    sub_raw(r, a, b, f.L);
  } else {
    u64 t[MAXL];
    sub_raw(t, b, a, f.L);      // b - a
    sub_raw(r, f.p, t, f.L);    // p - (b - a)
  }
}

inline void fneg(const FieldCtx& f, u64* r, const u64* a) {
  bool zero = true;
  for (int i = 0; i < f.L; ++i) zero &= (a[i] == 0);
  if (zero) { std::memset(r, 0, f.L * 8); return; }
  sub_raw(r, f.p, a, f.L);
}

// CIOS Montgomery multiplication.
inline void fmul(const FieldCtx& f, u64* r, const u64* a, const u64* b) {
  int L = f.L;
  u64 t[MAXL + 2];
  std::memset(t, 0, sizeof(t));
  for (int i = 0; i < L; ++i) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < L; ++j) {
      u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[L] + carry;
    t[L] = (u64)s;
    t[L + 1] = (u64)(s >> 64);
    // reduce one limb
    u64 m = t[0] * f.n0inv;
    carry = 0;
    {
      u128 s0 = (u128)t[0] + (u128)m * f.p[0];
      carry = s0 >> 64;
    }
    for (int j = 1; j < L; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * f.p[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[L] + carry;
    t[L - 1] = (u64)s3;
    t[L] = t[L + 1] + (u64)(s3 >> 64);
    t[L + 1] = 0;
  }
  if (t[L] || geq(t, f.p, L)) {
    sub_raw(r, t, f.p, L);
  } else {
    std::memcpy(r, t, L * 8);
  }
}

inline void fsqr(const FieldCtx& f, u64* r, const u64* a) { fmul(f, r, a, a); }

inline void fcopy(u64* r, const u64* a, int L) { std::memcpy(r, a, L * 8); }

inline bool fis0(const u64* a, int L) {
  for (int i = 0; i < L; ++i) if (a[i]) return false;
  return true;
}

void fpow(const FieldCtx& f, u64* r, const u64* a, const u64* e, int eL) {
  u64 acc[MAXL];
  fcopy(acc, f.one, f.L);
  bool started = false;
  for (int i = eL - 1; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      if (started) fsqr(f, acc, acc);
      if ((e[i] >> b) & 1) {
        if (started) fmul(f, acc, acc, a); else { fcopy(acc, a, f.L); }
        started = true;
      }
    }
  }
  if (!started) fcopy(acc, f.one, f.L);
  fcopy(r, acc, f.L);
}

// ---------------------------------------------------------------------------
// Curves
// ---------------------------------------------------------------------------

struct CurveCtx {
  FieldCtx fp;
  FieldCtx fn_;
  int kind;          // 0 = short Weierstrass a=0 (projective, RCB), 1 = twisted Edwards a=-1 (extended)
  u64 b3[MAXL];      // Weierstrass: 3b in Montgomery form
  u64 k2d[MAXL];     // Edwards: 2d in Montgomery form
};

struct Pt {
  u64 c[4][MAXL];    // X,Y,Z[,T]
};

inline int ncoords(const CurveCtx& c) { return c.kind == 0 ? 3 : 4; }

void pt_identity(const CurveCtx& c, Pt& o) {
  std::memset(&o, 0, sizeof(o));
  if (c.kind == 0) {
    fcopy(o.c[1], c.fp.one, c.fp.L);  // (0,1,0)
  } else {
    fcopy(o.c[1], c.fp.one, c.fp.L);  // (0,1,1,0)
    fcopy(o.c[2], c.fp.one, c.fp.L);
  }
}

// RCB 2015/1060 algorithm 7 (a = 0), complete.
void w_add(const CurveCtx& c, Pt& o, const Pt& P, const Pt& Q) {
  const FieldCtx& f = c.fp;
  u64 t0[MAXL], t1[MAXL], t2[MAXL], t3[MAXL], t4[MAXL], t5[MAXL];
  u64 s1[MAXL], s2[MAXL], x3[MAXL], y3[MAXL], z3[MAXL], tm[MAXL];
  fmul(f, t0, P.c[0], Q.c[0]);
  fmul(f, t1, P.c[1], Q.c[1]);
  fmul(f, t2, P.c[2], Q.c[2]);
  fadd(f, s1, P.c[0], P.c[1]); fadd(f, s2, Q.c[0], Q.c[1]);
  fmul(f, t3, s1, s2); fadd(f, tm, t0, t1); fsub(f, t3, t3, tm);
  fadd(f, s1, P.c[1], P.c[2]); fadd(f, s2, Q.c[1], Q.c[2]);
  fmul(f, t4, s1, s2); fadd(f, tm, t1, t2); fsub(f, t4, t4, tm);
  fadd(f, s1, P.c[0], P.c[2]); fadd(f, s2, Q.c[0], Q.c[2]);
  fmul(f, t5, s1, s2); fadd(f, tm, t0, t2); fsub(f, t5, t5, tm);
  u64 t0_3[MAXL];
  fadd(f, t0_3, t0, t0); fadd(f, t0_3, t0_3, t0);
  u64 t2b[MAXL], t5b[MAXL], z3s[MAXL], t1m[MAXL];
  fmul(f, t2b, c.b3, t2);
  fmul(f, t5b, c.b3, t5);
  fadd(f, z3s, t1, t2b);
  fsub(f, t1m, t1, t2b);
  u64 ma[MAXL], mb[MAXL], mc[MAXL], md[MAXL], me[MAXL], mf[MAXL];
  fmul(f, ma, t4, t5b);
  fmul(f, mb, t3, t1m);
  fmul(f, mc, t5b, t0_3);
  fmul(f, md, t1m, z3s);
  fmul(f, me, t0_3, t3);
  fmul(f, mf, z3s, t4);
  fsub(f, x3, mb, ma);
  fadd(f, y3, md, mc);
  fadd(f, z3, mf, me);
  fcopy(o.c[0], x3, f.L); fcopy(o.c[1], y3, f.L); fcopy(o.c[2], z3, f.L);
}

// Extended twisted Edwards a=-1 complete add (add-2008-hwcd-3).
void e_add(const CurveCtx& c, Pt& o, const Pt& P, const Pt& Q) {
  const FieldCtx& f = c.fp;
  u64 A[MAXL], B[MAXL], C[MAXL], D[MAXL], E[MAXL], F[MAXL], G[MAXL], H[MAXL];
  u64 s1[MAXL], s2[MAXL];
  fsub(f, s1, P.c[1], P.c[0]); fsub(f, s2, Q.c[1], Q.c[0]);
  fmul(f, A, s1, s2);
  fadd(f, s1, P.c[1], P.c[0]); fadd(f, s2, Q.c[1], Q.c[0]);
  fmul(f, B, s1, s2);
  fmul(f, C, P.c[3], c.k2d); fmul(f, C, C, Q.c[3]);
  fadd(f, s1, P.c[2], P.c[2]); fmul(f, D, s1, Q.c[2]);
  fsub(f, E, B, A);
  fsub(f, F, D, C);
  fadd(f, G, D, C);
  fadd(f, H, B, A);
  fmul(f, o.c[0], E, F);
  fmul(f, o.c[1], G, H);
  fmul(f, o.c[3], E, H);
  fmul(f, o.c[2], F, G);
}

void pt_add(const CurveCtx& c, Pt& o, const Pt& P, const Pt& Q) {
  if (c.kind == 0) w_add(c, o, P, Q); else e_add(c, o, P, Q);
}

void pt_dbl(const CurveCtx& c, Pt& o, const Pt& P) { pt_add(c, o, P, P); }

void pt_scalar_mul(const CurveCtx& c, Pt& o, const Pt& P, const u64* k, int kL) {
  Pt acc; pt_identity(c, acc);
  Pt base = P;
  for (int i = 0; i < kL * 64; ++i) {
    if ((k[i / 64] >> (i % 64)) & 1) { Pt t; pt_add(c, t, acc, base); acc = t; }
    Pt d; pt_dbl(c, d, base); base = d;
  }
  o = acc;
}

// Pippenger bucket MSM (the reference's MulVec is a naive loop,
// mulvec.rs:20-33; this is the real algorithm).
void msm(const CurveCtx& c, Pt& out, const u64* scalars, const Pt* points,
         long n, int sL) {
  int cbits = 4;
  if (n > 32) cbits = 8;
  if (n > 4096) cbits = 12;
  int nbits = sL * 64;
  int nwin = (nbits + cbits - 1) / cbits;
  long nbuckets = 1L << cbits;
  std::vector<Pt> buckets(nbuckets);
  Pt total; pt_identity(c, total);
  for (int w = nwin - 1; w >= 0; --w) {
    for (int b = 0; b < cbits; ++b) { Pt t; pt_dbl(c, t, total); total = t; }
    for (long b = 0; b < nbuckets; ++b) pt_identity(c, buckets[b]);
    for (long i = 0; i < n; ++i) {
      int bitpos = w * cbits;
      u64 digit = 0;
      for (int b = 0; b < cbits; ++b) {
        int pos = bitpos + b;
        if (pos < nbits) digit |= (((scalars[i * sL + pos / 64] >> (pos % 64)) & 1) << b);
      }
      if (digit) { Pt t; pt_add(c, t, buckets[digit], points[i]); buckets[digit] = t; }
    }
    // running-sum bucket reduction
    Pt run, sum; pt_identity(c, run); pt_identity(c, sum);
    for (long b = nbuckets - 1; b >= 1; --b) {
      Pt t; pt_add(c, t, run, buckets[b]); run = t;
      Pt s; pt_add(c, s, sum, run); sum = s;
    }
    Pt t; pt_add(c, t, total, sum); total = t;
  }
  out = total;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI — limbs are little-endian u64 arrays; field elements in PLAIN form
// (conversion to/from Montgomery happens inside).
// ---------------------------------------------------------------------------

extern "C" {

// ctx layout handle
void* bpp_field_new(const u64* p, const u64* r2, const u64* one, u64 n0inv, int L) {
  FieldCtx* f = new FieldCtx();
  f->L = L;
  std::memset(f->p, 0, sizeof(f->p));
  std::memset(f->r2, 0, sizeof(f->r2));
  std::memset(f->one, 0, sizeof(f->one));
  std::memcpy(f->p, p, L * 8);
  std::memcpy(f->r2, r2, L * 8);
  std::memcpy(f->one, one, L * 8);
  f->n0inv = n0inv;
  return f;
}

void bpp_field_free(void* f) { delete (FieldCtx*)f; }

void* bpp_curve_new(void* fp, void* fn_, int kind, const u64* const_mont) {
  CurveCtx* c = new CurveCtx();
  c->fp = *(FieldCtx*)fp;
  c->fn_ = *(FieldCtx*)fn_;
  c->kind = kind;
  std::memset(c->b3, 0, sizeof(c->b3));
  std::memset(c->k2d, 0, sizeof(c->k2d));
  if (kind == 0) std::memcpy(c->b3, const_mont, c->fp.L * 8);
  else std::memcpy(c->k2d, const_mont, c->fp.L * 8);
  return c;
}

void bpp_curve_free(void* c) { delete (CurveCtx*)c; }

// Montgomery conversion helpers for the Python wrapper
void bpp_to_mont(void* fv, u64* out, const u64* in) {
  FieldCtx* f = (FieldCtx*)fv;
  fmul(*f, out, in, f->r2);
}

void bpp_from_mont(void* fv, u64* out, const u64* in) {
  FieldCtx* f = (FieldCtx*)fv;
  u64 one_plain[MAXL];
  std::memset(one_plain, 0, sizeof(one_plain));
  one_plain[0] = 1;
  fmul(*f, out, in, one_plain);
}

void bpp_field_mul(void* fv, u64* out, const u64* a, const u64* b) {
  fmul(*(FieldCtx*)fv, out, a, b);
}

void bpp_field_add(void* fv, u64* out, const u64* a, const u64* b) {
  fadd(*(FieldCtx*)fv, out, a, b);
}

void bpp_field_sub(void* fv, u64* out, const u64* a, const u64* b) {
  fsub(*(FieldCtx*)fv, out, a, b);
}

void bpp_field_inv(void* fv, u64* out, const u64* a, const u64* pm2, int eL) {
  fpow(*(FieldCtx*)fv, out, a, pm2, eL);
}

// Points: coords Montgomery form, ncoords × L limbs per point.
// scalar_mul: k plain little-endian, kL limbs.
void bpp_scalar_mul(void* cv, u64* out, const u64* pt, const u64* k, int kL) {
  CurveCtx* c = (CurveCtx*)cv;
  int nc = ncoords(*c);
  Pt P; std::memset(&P, 0, sizeof(P));
  for (int i = 0; i < nc; ++i) std::memcpy(P.c[i], pt + i * c->fp.L, c->fp.L * 8);
  Pt O; pt_scalar_mul(*c, O, P, k, kL);
  for (int i = 0; i < nc; ++i) std::memcpy(out + i * c->fp.L, O.c[i], c->fp.L * 8);
}

void bpp_point_add(void* cv, u64* out, const u64* a, const u64* b) {
  CurveCtx* c = (CurveCtx*)cv;
  int nc = ncoords(*c);
  Pt P, Q; std::memset(&P, 0, sizeof(P)); std::memset(&Q, 0, sizeof(Q));
  for (int i = 0; i < nc; ++i) {
    std::memcpy(P.c[i], a + i * c->fp.L, c->fp.L * 8);
    std::memcpy(Q.c[i], b + i * c->fp.L, c->fp.L * 8);
  }
  Pt O; pt_add(*c, O, P, Q);
  for (int i = 0; i < nc; ++i) std::memcpy(out + i * c->fp.L, O.c[i], c->fp.L * 8);
}

void bpp_msm(void* cv, u64* out, const u64* scalars, const u64* points,
             long n, int sL) {
  CurveCtx* c = (CurveCtx*)cv;
  int nc = ncoords(*c);
  std::vector<Pt> pts(n);
  for (long i = 0; i < n; ++i) {
    std::memset(&pts[i], 0, sizeof(Pt));
    for (int j = 0; j < nc; ++j)
      std::memcpy(pts[i].c[j], points + (i * nc + j) * c->fp.L, c->fp.L * 8);
  }
  Pt O;
  msm(*c, O, scalars, pts.data(), n, sL);
  for (int i = 0; i < nc; ++i) std::memcpy(out + i * c->fp.L, O.c[i], c->fp.L * 8);
}

}  // extern "C"
