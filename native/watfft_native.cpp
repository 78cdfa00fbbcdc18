// watfft_native: host-side native layer for watfft_tpu.
//
// TPU-native analog of the compute-adjacent native code the reference keeps
// in its WAT modules: twiddle precomputation (reference:
// modules/fft_split_native_f32.wat precompute_twiddles_split :151-192 and
// $build_r4_tables :196-265, done there with an in-WASM Taylor-series
// sin/cos) and an INDEPENDENT O(N^2) DFT oracle used to cross-validate the
// JAX kernels against a second implementation stack (reference analog:
// tools/wasm_compare.js — WASM vs JS vs DFT three-way comparison).
//
// Everything here uses long-double trig for twiddles, which makes this
// oracle slightly *more* accurate than the numpy f64 tables it checks.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)
// Python binding: watfft_tpu/native.py via ctypes, with numpy fallback.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// O(N^2) reference DFT in f64 (sign=-1 forward, +1 inverse-unscaled).
// ---------------------------------------------------------------------------
void wf_dft_c128(const double* xre, const double* xim,
                 double* ore, double* oim, int32_t n, int32_t sign) {
  const long double two_pi = 6.283185307179586476925286766559L;
  for (int32_t k = 0; k < n; ++k) {
    long double sre = 0.0L, sim = 0.0L;
    for (int32_t j = 0; j < n; ++j) {
      long double ang = sign * two_pi * ((long double)((int64_t)j * k % n)) / n;
      long double c = cosl(ang), s = sinl(ang);
      sre += xre[j] * c - xim[j] * s;
      sim += xre[j] * s + xim[j] * c;
    }
    ore[k] = (double)sre;
    oim[k] = (double)sim;
  }
}

// ---------------------------------------------------------------------------
// Stockham stage plan + packed per-stage twiddle columns, mirroring
// watfft_tpu/ops/pallas_stockham.py: stage_plan / make_twiddle_pack.
// Mixed-radix plan: n = 16^a * r, radices [16, r?, 16, 16, ...] with the
// {2,4,8} remainder inserted at position 1. For each stage with l > 1,
// (R-1) columns of length n/R holding w_{R*l}^{p*(row mod l)}, p=1..R-1,
// concatenated over stages. The final stage carries the folded 1/n when
// inverse != 0. Phases reduced mod R*l before the trig call.
// ---------------------------------------------------------------------------
static int32_t build_plan(int32_t n, int32_t* radices) {
  // Measured per-size radix-32/64 overrides (Exp 39) — must stay in sync
  // with _PLAN_OVERRIDES in watfft_tpu/ops/pallas_stockham.py (the
  // test_native parity test enforces this).
  switch (n) {
    case 32:   radices[0] = 32; return 1;
    case 1024: radices[0] = 64; radices[1] = 16; return 2;
    case 2048: radices[0] = 64; radices[1] = 32; return 2;
    case 4096: radices[0] = 64; radices[1] = 64; return 2;
    case 8192: radices[0] = 32; radices[1] = 16; radices[2] = 16; return 3;
    default: break;
  }
  int32_t m = 0;
  while ((1 << m) < n) ++m;
  int32_t count = 0;
  int32_t sixteens = m / 4, rem = m % 4;
  for (int32_t i = 0; i < sixteens; ++i) radices[count++] = 16;
  if (rem) {
    int32_t r = 1 << rem;
    if (!count) {
      radices[count++] = r;
    } else if (r == 8) {  // radix-8 leads: twiddle-free, pad-free (Exp 15)
      for (int32_t i = count; i > 0; --i) radices[i] = radices[i - 1];
      radices[0] = r;
      ++count;
    } else {  // rem 2/4 after the first 16
      for (int32_t i = count; i > 1; --i) radices[i] = radices[i - 1];
      radices[1] = r;
      ++count;
    }
  }
  return count;
}

int32_t wf_twiddle_pack_rows(int32_t n) {
  int32_t radices[32];
  int32_t count = build_plan(n, radices);
  int64_t rows = 0, l = 1;
  for (int32_t i = 0; i < count; ++i) {
    if (l > 1) rows += (int64_t)(radices[i] - 1) * (n / radices[i]);
    l *= radices[i];
  }
  return rows > 0 ? (int32_t)rows : 1;
}

void wf_twiddle_pack(int32_t n, int32_t inverse, float* out_re, float* out_im) {
  const long double two_pi = 6.283185307179586476925286766559L;
  const long double sign = inverse ? 1.0L : -1.0L;
  int32_t radices[32];
  int32_t count = build_plan(n, radices);
  int64_t off = 0, l = 1;
  bool wrote = false;
  for (int32_t idx = 0; idx < count; ++idx) {
    int32_t r = radices[idx];
    if (l > 1) {
      int64_t rows = n / r;
      int64_t rl = (int64_t)r * l;
      long double scale = (inverse && idx == count - 1) ? 1.0L / n : 1.0L;
      for (int32_t p = 1; p < r; ++p) {
        for (int64_t row = 0; row < rows; ++row) {
          int64_t k = row % l;
          long double ang = sign * two_pi * ((p * k) % rl) / (long double)rl;
          out_re[off] = (float)(scale * cosl(ang));
          out_im[off] = (float)(scale * sinl(ang));
          ++off;
        }
      }
      wrote = true;
    }
    l *= r;
  }
  if (!wrote) { out_re[0] = 1.0f; out_im[0] = 0.0f; }
}

// ---------------------------------------------------------------------------
// DFT matrix (for the four-step MXU surface tables).
// ---------------------------------------------------------------------------
void wf_dft_matrix(int32_t n, int32_t sign, double scale,
                   double* wre, double* wim) {
  const long double two_pi = 6.283185307179586476925286766559L;
  for (int32_t j = 0; j < n; ++j) {
    for (int32_t k = 0; k < n; ++k) {
      long double ang = sign * two_pi * ((long double)((int64_t)j * k % n)) / n;
      wre[(int64_t)j * n + k] = (double)(scale * cosl(ang));
      wim[(int64_t)j * n + k] = (double)(scale * sinl(ang));
    }
  }
}

int32_t wf_version() { return 1; }

}  // extern "C"
