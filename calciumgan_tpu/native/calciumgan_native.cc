// Native host-side kernels for CalciumGAN-TPU, exposed via ctypes.
//
// Contents:
//  - crc32c (Castagnoli, slice-by-8): record framing checksums for the
//    TFRecord container (calciumgan_tpu/data/tfrecord.py).
//  - oasis_ar1 / oasis_ar1_batch: OASIS AR(1) spike deconvolution
//    (pool-adjacency algorithm, Friedrich et al. 2017 — same spec as
//    calciumgan_tpu/ops/oasis_ref.py). The batch variant fans traces over
//    OpenMP threads; this is the host fallback / preprocessing path, the
//    TPU path lives in calciumgan_tpu/ops/oasis.py.
//  - ar1_filter_batch: spikes -> calcium AR(1)/AR(2) synthesis (the DG
//    generators' hot loop).
//
// Build: make -C calciumgan_tpu/native  (produces libcalciumgan_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// crc32c
// ---------------------------------------------------------------------------

// Table construction runs inside a C++11 magic static (thread-safe,
// guaranteed-once): ctypes releases the GIL during calls and the record
// codec hashes from prefetch/sweep threads concurrently — a plain
// check-then-set flag could serve a partially built table to the second
// thread in.
struct CrcTables {
  uint32_t t[8][256];
  CrcTables() {
    const uint32_t poly = 0x82F63B78u;
    for (int i = 0; i < 256; ++i) {
      uint32_t c = static_cast<uint32_t>(i);
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
      t[0][i] = c;
    }
    for (int s = 1; s < 8; ++s) {
      for (int i = 0; i < 256; ++i) {
        uint32_t c = t[s - 1][i];
        t[s][i] = t[0][c & 0xFF] ^ (c >> 8);
      }
    }
  }
};

static const uint32_t (&crc_tables_ref())[8][256] {
  static const CrcTables tables;  // magic static: thread-safe init
  return tables.t;
}

uint32_t cg_crc32c(const uint8_t* data, uint64_t n) {
  const uint32_t (&crc_tables)[8][256] = crc_tables_ref();
  uint32_t crc = 0xFFFFFFFFu;
  uint64_t i = 0;
  // align + slice-by-8
  while (n - i >= 8) {
    uint32_t lo;
    uint32_t hi;
    std::memcpy(&lo, data + i, 4);
    std::memcpy(&hi, data + i + 4, 4);
    lo ^= crc;
    crc = crc_tables[7][lo & 0xFF] ^ crc_tables[6][(lo >> 8) & 0xFF] ^
          crc_tables[5][(lo >> 16) & 0xFF] ^ crc_tables[4][(lo >> 24) & 0xFF] ^
          crc_tables[3][hi & 0xFF] ^ crc_tables[2][(hi >> 8) & 0xFF] ^
          crc_tables[1][(hi >> 16) & 0xFF] ^ crc_tables[0][(hi >> 24) & 0xFF];
    i += 8;
  }
  for (; i < n; ++i) crc = (crc >> 8) ^ crc_tables[0][(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// OASIS AR(1)
// ---------------------------------------------------------------------------

// Single trace; c and s must hold T doubles.
void cg_oasis_ar1(const double* y, int64_t T, double g, double lam,
                  double s_min, double* c, double* s) {
  if (T <= 0) return;
  std::vector<double> v(T), w(T);
  std::vector<int64_t> t0(T), len(T);

  int64_t p = -1;
  for (int64_t t = 0; t < T; ++t) {
    double yt = (t == T - 1) ? y[t] - lam : y[t] - lam * (1.0 - g);
    ++p;
    v[p] = yt;
    w[p] = 1.0;
    t0[p] = t;
    len[p] = 1;
    while (p > 0) {
      double gl = std::pow(g, static_cast<double>(len[p - 1]));
      if (v[p] / w[p] >= gl * (v[p - 1] / w[p - 1]) + s_min) break;
      v[p - 1] += gl * v[p];
      w[p - 1] += gl * gl * w[p];
      len[p - 1] += len[p];
      --p;
    }
  }

  for (int64_t i = 0; i <= p; ++i) {
    double h = std::max(v[i] / w[i], 0.0);
    double dec = h;
    for (int64_t k = 0; k < len[i]; ++k) {
      c[t0[i] + k] = dec;
      dec *= g;
    }
  }
  s[0] = 0.0;
  for (int64_t t = 1; t < T; ++t) s[t] = c[t] - g * c[t - 1];
}

// Batched: signals (N, T) float32 row-major -> binary spikes (N, T) float32
// thresholded at `threshold` (the reference pipeline recipe:
// spike_helper.py:23-29). OpenMP across traces.
void cg_deconvolve_batch(const float* signals, int64_t N, int64_t T, double g,
                         double s_min, double threshold, float* out) {
#pragma omp parallel
  {
    std::vector<double> y(T), c(T), s(T);
#pragma omp for schedule(dynamic, 1)
    for (int64_t i = 0; i < N; ++i) {
      const float* row = signals + i * T;
      for (int64_t t = 0; t < T; ++t) y[t] = static_cast<double>(row[t]);
      cg_oasis_ar1(y.data(), T, g, 0.0, s_min, c.data(), s.data());
      float* orow = out + i * T;
      for (int64_t t = 0; t < T; ++t)
        orow[t] = s[t] > threshold ? 1.0f : 0.0f;
    }
  }
}

// Batched raw (c, s) output in float64, for spike_train_inference parity.
void cg_oasis_batch(const double* signals, int64_t N, int64_t T, double g,
                    double lam, double s_min, double* c_out, double* s_out) {
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < N; ++i)
    cg_oasis_ar1(signals + i * T, T, g, lam, s_min, c_out + i * T,
                 s_out + i * T);
}

// ---------------------------------------------------------------------------
// spikes -> calcium AR filter (reference generate_dg_data.py:54-70:
// recurrence starts at t=2)
// ---------------------------------------------------------------------------

void cg_ar_filter_batch(float* x, int64_t N, int64_t T, double g1, double g2,
                        int32_t order) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < N; ++i) {
    float* row = x + i * T;
    if (order == 1) {
      for (int64_t t = 2; t < T; ++t)
        row[t] += static_cast<float>(g1 * row[t - 1]);
    } else {
      for (int64_t t = 2; t < T; ++t)
        row[t] +=
            static_cast<float>(g1 * row[t - 1] + g2 * row[t - 2]);
    }
  }
}

}  // extern "C"
