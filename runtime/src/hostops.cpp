// Host-side data-pipeline kernels exposed to the Python loader via ctypes.
//
// The training input pipeline's one compute-heavy host op is the speed
// perturbation (reference: sox `speed 0.9/1.1` inside WavReader,
// speakerlab/process/processor.py:30-43) — a rational polyphase resample.
// scipy.signal.resample_poly's upfirdn kernel is a scalar Cython loop
// (~1.3 GMAC/s measured on this box) and costs ~1.2 ms per 4 s utterance,
// which is most of the loader's per-sample budget and starves the chip on
// small hosts (docs/BENCH.md soak section). This kernel computes ONLY the
// output samples the random crop needs, directly in polyphase direct form,
// and lets the compiler vectorize the contiguous taps dot product.
//
// Numerics: the caller passes the FIR filter (designed in Python with the
// exact scipy design: firwin(2*10*max_rate+1, 1/max_rate, kaiser 5.0) * up)
// so the frequency response is identical to resample_poly; outputs match
// scipy within float32 reassociation (<= 2e-6 abs, pinned by
// tests/test_host_resample.py).

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

// y[m] = sum_i x[i] * h_pad[(m + n_pre_remove) * down - i * up]
// for m in [o0, o0 + n_out), with x zero outside [0, n_in).
// h_pad is the scipy-style front-padded filter; taps = ceil(len(h_pad)/up).
void resample_segment_f32(const float* x, int64_t n_in, int32_t up,
                          int32_t down, const float* h_pad, int64_t h_len,
                          int64_t n_pre_remove, int64_t o0, int64_t n_out,
                          float* out) {
  const int64_t taps = (h_len + up - 1) / up;
  // Per-phase coefficient bank, reversed so the inner loop pairs
  // c[k] with the ascending-index window x[i_hi - taps + 1 + k].
  std::vector<float> bank(static_cast<size_t>(up) * taps, 0.0f);
  for (int32_t p = 0; p < up; ++p)
    for (int64_t j = 0; p + j * up < h_len; ++j)
      bank[static_cast<size_t>(p) * taps + (taps - 1 - j)] =
          h_pad[p + j * up];

  // Copy the needed input window into a zero-padded buffer once so the
  // inner dot product is branch-free and contiguous.
  const int64_t T_lo = (o0 + n_pre_remove) * down;
  const int64_t T_hi = (o0 + n_out - 1 + n_pre_remove) * down;
  const int64_t i_lo = T_lo / up - taps + 1;
  const int64_t i_hi_max = T_hi / up;
  const int64_t a = i_lo < 0 ? 0 : i_lo;
  const int64_t b = (i_hi_max + 1) < n_in ? (i_hi_max + 1) : n_in;
  const int64_t core = b > a ? b - a : 0;
  std::vector<float> xp(static_cast<size_t>(taps + core + taps), 0.0f);
  for (int64_t i = 0; i < core; ++i) xp[taps + i] = x[a + i];

  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t T = (o0 + m + n_pre_remove) * down;
    const int64_t i_hi = T / up;
    const float* c = bank.data() + static_cast<size_t>(T - i_hi * up) * taps;
    const float* w = xp.data() + (i_hi - taps + 1 - a + taps);
    float acc = 0.0f;
    for (int64_t k = 0; k < taps; ++k) acc += c[k] * w[k];
    out[m] = acc;
  }
}

}  // namespace

extern "C" {

// ctypes entry point. Returns 0 on success.
int s3d_resample_segment_f32(const float* x, int64_t n_in, int32_t up,
                             int32_t down, const float* h_pad, int64_t h_len,
                             int64_t n_pre_remove, int64_t o0, int64_t n_out,
                             float* out) {
  if (up <= 0 || down <= 0 || n_out < 0 || n_in < 0 || h_len <= 0) return 1;
  resample_segment_f32(x, n_in, up, down, h_pad, h_len, n_pre_remove, o0,
                       n_out, out);
  return 0;
}
}
