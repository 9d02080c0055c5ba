// Native host-side runtime kernels.
//
// The reference outsources its host-native work to external C libraries
// (Cython monotonic_align, libsndfile, libsamplerate via librosa).  This
// library provides the equivalents owned in-tree:
//
//   - maximum_path: the monotonic Viterbi DP (CPU fallback / data prep;
//     the on-device scan/Pallas versions are the training path)
//   - resample_poly: windowed-sinc polyphase resampling for the host data
//     pipeline (24 kHz normalization of source corpora)
//   - pcm16_to_float: vectorizable PCM decode for the WAV loader
//
// Build: `make -C native` -> libstyletts2_native.so, loaded via ctypes
// (styletts2_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Monotonic maximum-path DP, matching the semantics of the Cython
// maximum_path_c (ref: utils.py:11-24).  values: (b, t_text, t_mel) row-major,
// paths: same shape, int32 out.
void maximum_path(const float* values, int32_t* paths, int b, int t_text,
                  int t_mel, const int32_t* t_xs, const int32_t* t_ys) {
  const float neg_inf = -1e9f;
  std::vector<float> v(static_cast<size_t>(t_text) * t_mel);
  for (int ib = 0; ib < b; ++ib) {
    const float* val = values + static_cast<size_t>(ib) * t_text * t_mel;
    int32_t* path = paths + static_cast<size_t>(ib) * t_text * t_mel;
    std::memset(path, 0, sizeof(int32_t) * t_text * t_mel);
    std::fill(v.begin(), v.end(), neg_inf);
    const int tx = t_xs[ib], ty = t_ys[ib];
    if (tx <= 0 || ty <= 0) continue;

    for (int y = 0; y < ty; ++y) {
      const int x_lo = std::max(0, tx + y - ty);
      const int x_hi = std::min(tx, y + 1);
      for (int x = x_lo; x < x_hi; ++x) {
        const float v_cur =
            (x == y || y == 0) ? neg_inf : v[x * t_mel + (y - 1)];
        float v_prev;
        if (x == 0) {
          v_prev = (y == 0) ? 0.0f : neg_inf;
        } else {
          v_prev = (y == 0) ? neg_inf : v[(x - 1) * t_mel + (y - 1)];
        }
        v[x * t_mel + y] = std::max(v_prev, v_cur) + val[x * t_mel + y];
      }
    }
    int index = tx - 1;
    for (int y = ty - 1; y >= 0; --y) {
      path[index * t_mel + y] = 1;
      if (index != 0 &&
          (index == y || (y > 0 && v[index * t_mel + (y - 1)] <
                                       v[(index - 1) * t_mel + (y - 1)]))) {
        --index;
      }
    }
  }
}

// Polyphase windowed-sinc resampling.  kernels: (n_phases, k_len) produced by
// the Python side (same Hann-sinc design as audio/resample.py); input is
// assumed pre-padded by the caller with (width, width + orig) zeros.
void resample_poly(const float* padded, int64_t n_padded, float* out,
                   int64_t n_out, const float* kernels, int n_phases,
                   int k_len, int orig) {
  int64_t idx = 0;
  for (int64_t frame = 0; idx < n_out; ++frame) {
    const int64_t base = frame * orig;
    if (base + k_len > n_padded) break;
    for (int ph = 0; ph < n_phases && idx < n_out; ++ph, ++idx) {
      const float* k = kernels + static_cast<size_t>(ph) * k_len;
      const float* x = padded + base;
      float acc = 0.0f;
      for (int i = 0; i < k_len; ++i) acc += x[i] * k[i];
      out[idx] = acc;
    }
  }
}

void pcm16_to_float(const int16_t* in, float* out, int64_t n) {
  const float scale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * scale;
}

}  // extern "C"
