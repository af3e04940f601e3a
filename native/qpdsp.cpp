// qpdsp — native host-DSP core for qpnet_tpu.
//
// The MLSA (mel log spectrum approximation) filter is a per-sample
// recursive IIR (see qpnet_tpu/dsp/mlsa.py for the algorithm derivation:
// mel basis Phi_m cascade + order-L Pade approximation of exp, split into
// the b[1] stage and the b[2:] stage, gain exp(b[0])).  The JAX scan
// version recompiles per signal length (~1 s per new length) and pays scan
// dispatch; this C implementation runs the same math directly and is used
// by the feature pipeline when the shared library is available
// (qpnet_tpu/dsp/native.py loads it via ctypes, falling back to the scan).
//
// Build: make -C native   (produces libqpdsp.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPade4[5] = {1.0, 4.999273e-1, 1.067005e-1, 1.170221e-2,
                              5.656279e-4};
constexpr double kPade5[6] = {1.0, 4.999391e-1, 1.107098e-1, 1.369984e-2,
                              9.564853e-4, 3.041721e-5};

// One exp(sum_{m>=1} b_m Phi_m) filter realized with the Pade rational
// exp(w) ~= N(w)/N(-w); every Phi_m carries >= 1 sample delay so the
// feedback is computable sample-by-sample.
struct ExpFilter {
  int L;       // Pade order
  int M;       // filter order (number of Phi basis terms)
  double alpha;
  const double* A;  // Pade coefficients A_1..A_L
  std::vector<double> u_prev;  // (L)
  std::vector<double> y_prev;  // (L, M)

  ExpFilter(int pd, int order, double a)
      : L(pd), M(order), alpha(a),
        A(pd == 5 ? kPade5 + 1 : kPade4 + 1),
        u_prev(pd, 0.0), y_prev(pd * order, 0.0) {}

  // Phi outputs for stage l from stored state (strictly delayed), then
  // F = sum_m b[m] * y_m; returns F and writes the new y into scratch.
  inline double stage_output(int l, const double* b, double* y_new) {
    const double aa = 1.0 - alpha * alpha;
    const double* yp = &y_prev[l * M];
    double up = u_prev[l];
    double f = 0.0;
    double y1 = aa * up + alpha * yp[0];
    y_new[0] = y1;
    f += b[1] * y1;
    for (int m = 1; m < M; ++m) {
      double ym = yp[m - 1] - alpha * y_new[m - 1] + alpha * yp[m];
      y_new[m] = ym;
      f += b[m + 1] * ym;
    }
    return f;
  }

  inline double step(double x, const double* b, double* scratch /* L*M */) {
    double s[8];  // L <= 5
    for (int l = 0; l < L; ++l)
      s[l] = stage_output(l, b, scratch + l * M);
    double u = x;
    double y = 0.0;
    double sign = -1.0;
    for (int l = 0; l < L; ++l) {
      u -= sign * A[l] * s[l];
      y += A[l] * s[l];
      sign = -sign;
    }
    y += u;
    // update states: stage 0 input is u, stage l input is s_{l-1}
    u_prev[0] = u;
    for (int l = 1; l < L; ++l) u_prev[l] = s[l - 1];
    std::memcpy(y_prev.data(), scratch, sizeof(double) * L * M);
    return y;
  }
};

}  // namespace

extern "C" {

// x: (n) input waveform.  b_frames: (F, M+1) MLSA coefficients (from
// mc2b).  Coefficients switch every `hopsize` samples.  out: (n).
// Returns 0 on success.
int qpdsp_mlsa_filter(const double* x, int64_t n, const double* b_frames,
                      int64_t n_frames, int order_plus1, double alpha,
                      int hopsize, int pd, double* out) {
  if (pd != 4 && pd != 5) return 1;
  const int M = order_plus1 - 1;
  if (M < 1 || n_frames < 1 || hopsize < 1) return 2;
  ExpFilter f1(pd, M, alpha);  // b[1] term only
  ExpFilter f2(pd, M, alpha);  // b[2:] cascade
  std::vector<double> scratch(static_cast<size_t>(pd) * M);
  std::vector<double> b1(order_plus1, 0.0), b2(order_plus1, 0.0);
  int64_t frame = -1;
  double gain = 1.0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t fr = i / hopsize;
    if (fr >= n_frames) fr = n_frames - 1;
    if (fr != frame) {
      frame = fr;
      const double* b = b_frames + fr * order_plus1;
      std::fill(b1.begin(), b1.end(), 0.0);
      std::fill(b2.begin(), b2.end(), 0.0);
      b1[1] = b[1];
      for (int m = 2; m <= M; ++m) b2[m] = b[m];
      gain = std::exp(b[0]);
    }
    double v = f1.step(x[i], b1.data(), scratch.data());
    double y = f2.step(v, b2.data(), scratch.data());
    out[i] = y * gain;
  }
  return 0;
}

// mc2b recursion (SPTK convention): b[M]=mc[M]; b[m]=mc[m]-alpha*b[m+1]
void qpdsp_mc2b(const double* mc, int order_plus1, double alpha,
                double* b) {
  b[order_plus1 - 1] = mc[order_plus1 - 1];
  for (int m = order_plus1 - 2; m >= 0; --m)
    b[m] = mc[m] - alpha * b[m + 1];
}

// Causal FIR filter: out[i] = sum_k taps[k] * x[i-k]
void qpdsp_fir(const double* x, int64_t n, const double* taps, int n_taps,
               double* out) {
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    int kmax = static_cast<int>(i < n_taps - 1 ? i : n_taps - 1);
    for (int k = 0; k <= kmax; ++k) acc += taps[k] * x[i - k];
    out[i] = acc;
  }
}

}  // extern "C"
