// Native host-side intensity normalization for the serving/data pipeline.
//
// The steady-state serving cost on a real TPU host is host decode
// (BENCH.md configs[4] attribution: ~0.7 s/case of numpy percentile
// normalization + ~0.5 s of stack/cast on 5 modalities at 192x192x160).
// numpy spends it in separate full-buffer passes: float32 cast, two
// percentile partitions, clip (copy), subtract (copy), divide (copy),
// np.stack (copy), astype(float32) (copy), astype(bfloat16) (copy).
// This kernel fuses all of it: one scratch copy for the order statistics
// plus ONE pass that writes the normalized value — optionally cast to
// bfloat16 (round-to-nearest-even, identical to ml_dtypes) — directly
// into its strided slot of the (D,H,W,C) network input stack.
//
// Semantics match pcmseg_tpu/data/resample.py::normalize_intensity
// (which itself resolves the reference's train/predict normalization
// mismatch, SURVEY.md §8.5): percentiles use numpy's 'linear'
// interpolation of order statistics at pos = (n-1)*p/100; p<=0 / p>=100
// short-circuit to exact min/max (so minmax mode is p=(0,100));
// hi <= lo writes zeros, exactly like the numpy path.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)
// Python binding: pcmseg_tpu/data/native.py (ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// float32 -> bfloat16 with round-to-nearest-even — bit-identical to
// ml_dtypes/XLA truncation (the wire format the device consumes).
inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, sizeof(x));
  const uint32_t rounding_bias = 0x7fffu + ((x >> 16) & 1u);
  x += rounding_bias;
  return static_cast<uint16_t>(x >> 16);
}

// numpy 'linear'-method percentile of the scratch buffer (mutated).
// p in [0,100]; exact min/max at the ends (== numpy).
double percentile_linear(std::vector<float>& v, double p) {
  const int64_t n = static_cast<int64_t>(v.size());
  if (p <= 0.0) return static_cast<double>(*std::min_element(v.begin(), v.end()));
  if (p >= 100.0) return static_cast<double>(*std::max_element(v.begin(), v.end()));
  const double pos = (static_cast<double>(n) - 1.0) * (p / 100.0);
  const int64_t j = static_cast<int64_t>(std::floor(pos));
  const double g = pos - static_cast<double>(j);
  std::nth_element(v.begin(), v.begin() + j, v.end());
  const double a = static_cast<double>(v[j]);
  if (g <= 0.0 || j + 1 >= n) return a;
  // after nth_element everything right of j is >= v[j]; the (j+1)-th
  // order statistic is the minimum of that tail
  const double b =
      static_cast<double>(*std::min_element(v.begin() + j + 1, v.end()));
  return a + (b - a) * g;
}

template <typename In>
void load_f32(const In* in, int64_t n, std::vector<float>& out) {
  out.resize(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) out[static_cast<size_t>(i)] = static_cast<float>(in[i]);
}

}  // namespace

extern "C" {

// Normalize n voxels of `in` into a strided destination:
//   out[i*out_stride] = (clamp(x, lo, hi) - lo) / (hi - lo)
// where (lo, hi) are the (p_lo, p_hi) percentiles of `in`.
//   in_kind:  0=float32  1=int16  2=uint16  3=float64
//   out_kind: 0=float32  1=bfloat16
// Returns 0 on success, -1 on an unsupported kind.
int normalize_into(const void* in, int64_t n, int in_kind, double p_lo,
                   double p_hi, void* out, int64_t out_stride, int out_kind) {
  if (n <= 0) return 0;
  std::vector<float> scratch;
  switch (in_kind) {
    case 0:
      scratch.assign(static_cast<const float*>(in),
                     static_cast<const float*>(in) + n);
      break;
    case 1:
      load_f32(static_cast<const int16_t*>(in), n, scratch);
      break;
    case 2:
      load_f32(static_cast<const uint16_t*>(in), n, scratch);
      break;
    case 3:
      load_f32(static_cast<const double*>(in), n, scratch);
      break;
    default:
      return -1;
  }
  if (out_kind != 0 && out_kind != 1) return -1;

  // lower percentile first: nth_element leaves the tail >= v[j], which
  // does not disturb the second (higher) percentile's partition
  const double lo_d = percentile_linear(scratch, p_lo);
  const double hi_d = percentile_linear(scratch, p_hi);
  const float lo = static_cast<float>(lo_d);
  const float hi = static_cast<float>(hi_d);
  const float denom = static_cast<float>(hi_d - lo_d);

  float* out_f = static_cast<float*>(out);
  uint16_t* out_b = static_cast<uint16_t*>(out);
  if (!(denom > 0.0f)) {  // constant input (or hi <= lo): zeros, like numpy
    for (int64_t i = 0; i < n; ++i) {
      if (out_kind == 0) out_f[i * out_stride] = 0.0f;
      else out_b[i * out_stride] = 0;
    }
    return 0;
  }

  // one fused pass over the ORIGINAL input (scratch is partition-mangled)
  auto emit = [&](int64_t i, float x) {
    x = x < lo ? lo : (x > hi ? hi : x);
    const float y = (x - lo) / denom;
    if (out_kind == 0) out_f[i * out_stride] = y;
    else out_b[i * out_stride] = f32_to_bf16(y);
  };
  switch (in_kind) {
    case 0: {
      const float* p = static_cast<const float*>(in);
      for (int64_t i = 0; i < n; ++i) emit(i, p[i]);
      break;
    }
    case 1: {
      const int16_t* p = static_cast<const int16_t*>(in);
      for (int64_t i = 0; i < n; ++i) emit(i, static_cast<float>(p[i]));
      break;
    }
    case 2: {
      const uint16_t* p = static_cast<const uint16_t*>(in);
      for (int64_t i = 0; i < n; ++i) emit(i, static_cast<float>(p[i]));
      break;
    }
    case 3: {
      const double* p = static_cast<const double*>(in);
      for (int64_t i = 0; i < n; ++i) emit(i, static_cast<float>(p[i]));
      break;
    }
  }
  return 0;
}

}  // extern "C"
