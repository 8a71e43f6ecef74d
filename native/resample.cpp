// Native host-side volume resampling for the data pipeline.
//
// The reference's per-epoch hot spot is SimpleITK resampling of 6 volumes
// per case (SURVEY.md §3.1); our pipeline caches results, but the first
// epoch / cache-miss path still pays it. This C++ kernel implements the
// same SITK-equivalent semantics as pcmseg_tpu/data/resample.py
// (continuous source index i = j * in/out; linear interp clamped to the
// buffer with zero outside [0, size-1]; nearest = round-half-up), several
// times faster than the vectorized-numpy fallback on the single-core
// hosts that feed TPU slices.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)
// Python binding: pcmseg_tpu/data/native.py (ctypes).

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// out[od,oh,ow] <- trilinear sample of in[id,ih,iw] at i = j*in/out.
void resample_linear_f32(const float* in, int64_t id, int64_t ih, int64_t iw,
                         float* out, int64_t od, int64_t oh, int64_t ow) {
  const double sd = static_cast<double>(id) / od;
  const double sh = static_cast<double>(ih) / oh;
  const double sw = static_cast<double>(iw) / ow;

  std::vector<int64_t> x0(ow), x1(ow);
  std::vector<float> fx(ow);
  std::vector<uint8_t> vx(ow);
  for (int64_t x = 0; x < ow; ++x) {
    const double c = x * sw;
    const int64_t l = static_cast<int64_t>(std::floor(c));
    vx[x] = (c >= 0.0 && c <= iw - 1) ? 1 : 0;
    const int64_t cl = l < 0 ? 0 : (l > iw - 1 ? iw - 1 : l);
    x0[x] = cl;
    x1[x] = cl + 1 > iw - 1 ? iw - 1 : cl + 1;
    fx[x] = static_cast<float>(c - l);
  }

  for (int64_t z = 0; z < od; ++z) {
    const double cz = z * sd;
    const int64_t lz = static_cast<int64_t>(std::floor(cz));
    const bool okz = cz >= 0.0 && cz <= id - 1;
    const int64_t z0 = lz < 0 ? 0 : (lz > id - 1 ? id - 1 : lz);
    const int64_t z1 = z0 + 1 > id - 1 ? id - 1 : z0 + 1;
    const float fz = static_cast<float>(cz - lz);

    for (int64_t y = 0; y < oh; ++y) {
      const double cy = y * sh;
      const int64_t ly = static_cast<int64_t>(std::floor(cy));
      const bool oky = okz && cy >= 0.0 && cy <= ih - 1;
      const int64_t y0 = ly < 0 ? 0 : (ly > ih - 1 ? ih - 1 : ly);
      const int64_t y1 = y0 + 1 > ih - 1 ? ih - 1 : y0 + 1;
      const float fy = static_cast<float>(cy - ly);

      const float w00 = (1 - fz) * (1 - fy), w01 = (1 - fz) * fy;
      const float w10 = fz * (1 - fy), w11 = fz * fy;
      const float* p00 = in + (z0 * ih + y0) * iw;
      const float* p01 = in + (z0 * ih + y1) * iw;
      const float* p10 = in + (z1 * ih + y0) * iw;
      const float* p11 = in + (z1 * ih + y1) * iw;
      float* dst = out + (z * oh + y) * ow;

      for (int64_t x = 0; x < ow; ++x) {
        if (!oky || !vx[x]) {
          dst[x] = 0.0f;
          continue;
        }
        const int64_t a = x0[x], b = x1[x];
        const float f = fx[x];
        const float v0 = w00 * ((1 - f) * p00[a] + f * p00[b]) +
                         w01 * ((1 - f) * p01[a] + f * p01[b]);
        const float v1 = w10 * ((1 - f) * p10[a] + f * p10[b]) +
                         w11 * ((1 - f) * p11[a] + f * p11[b]);
        dst[x] = v0 + v1;
      }
    }
  }
}

// nearest-neighbor (ITK round-half-up), zero outside the buffer.
void resample_nearest_f32(const float* in, int64_t id, int64_t ih, int64_t iw,
                          float* out, int64_t od, int64_t oh, int64_t ow) {
  const double sd = static_cast<double>(id) / od;
  const double sh = static_cast<double>(ih) / oh;
  const double sw = static_cast<double>(iw) / ow;

  std::vector<int64_t> xi(ow);
  std::vector<uint8_t> vx(ow);
  for (int64_t x = 0; x < ow; ++x) {
    const double c = x * sw;
    const int64_t r = static_cast<int64_t>(std::floor(c + 0.5));
    vx[x] = (c >= -0.5 && r <= iw - 1) ? 1 : 0;
    xi[x] = r < 0 ? 0 : (r > iw - 1 ? iw - 1 : r);
  }
  for (int64_t z = 0; z < od; ++z) {
    const double cz = z * sd;
    const int64_t rz = static_cast<int64_t>(std::floor(cz + 0.5));
    const bool okz = cz >= -0.5 && rz <= id - 1;
    const int64_t zi = rz < 0 ? 0 : (rz > id - 1 ? id - 1 : rz);
    for (int64_t y = 0; y < oh; ++y) {
      const double cy = y * sh;
      const int64_t ry = static_cast<int64_t>(std::floor(cy + 0.5));
      const bool oky = okz && cy >= -0.5 && ry <= ih - 1;
      const int64_t yi = ry < 0 ? 0 : (ry > ih - 1 ? ih - 1 : ry);
      const float* src = in + (zi * ih + yi) * iw;
      float* dst = out + (z * oh + y) * ow;
      for (int64_t x = 0; x < ow; ++x) {
        dst[x] = (oky && vx[x]) ? src[xi[x]] : 0.0f;
      }
    }
  }
}

}  // extern "C"
