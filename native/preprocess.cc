// Native point-cloud preprocessing for the host data pipeline.
//
// Replaces the per-object numpy loop in MSR3DBase.preprocess_pcd
// (reference data/datasets/msr3d.py:181-241) with one fused pass:
// rotate -> center/size stats -> resample to num_points -> unit-sphere
// normalize. The Python path takes ~20 ms per 60-object scene on one
// core (3 numpy passes per object + interpreter overhead); this runs the
// same math in two passes over the raw points + one over the samples.
//
// Exposed via ctypes (msr3d_tpu/data/native.py); built with
// `g++ -O3 -shared -fPIC` (see the auto-build in native.py).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// xorshift128+ — fast, seedable; used for resampling (stochastic
// augmentation, numpy-RNG parity not required)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed ^ 0x9e3779b97f4a7c15ull;
    s1 = (seed << 17) | (seed >> 47) | 1ull;
    for (int i = 0; i < 8; ++i) next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0, n)
  uint32_t below(uint32_t n) { return static_cast<uint32_t>(next() % n); }
};

}  // namespace

extern "C" {

// pcds:     concatenated raw object points, (total_pts, 6) float32 row-major
// offsets:  (n_objs + 1) int64 prefix offsets into pcds
// rot:      3x3 row-major rotation or nullptr
// out_fts:  (n_objs, num_points, 6) float32
// out_locs: (n_objs, 6) float32 (center ‖ size), computed pre-normalization
void msr3d_preprocess_objects(const float* pcds, const int64_t* offsets,
                              int64_t n_objs, int64_t num_points,
                              const float* rot, uint64_t seed,
                              float* out_fts, float* out_locs) {
  Rng rng(seed);
  // scratch for sampled indices (num_points is small: 1024)
  int32_t* idx = new int32_t[num_points];

  for (int64_t o = 0; o < n_objs; ++o) {
    const int64_t begin = offsets[o];
    const int64_t n = offsets[o + 1] - begin;
    const float* src = pcds + begin * 6;
    float* dst = out_fts + o * num_points * 6;

    // pass 1: rotated min/max/sum for center & size
    float mn[3] = {INFINITY, INFINITY, INFINITY};
    float mx[3] = {-INFINITY, -INFINITY, -INFINITY};
    double sum[3] = {0, 0, 0};
    for (int64_t i = 0; i < n; ++i) {
      const float* p = src + i * 6;
      float q[3];
      if (rot) {
        // reference applies p @ rot^T  =>  q[r] = dot(rot_row_r, p)
        for (int r = 0; r < 3; ++r)
          q[r] = rot[r * 3 + 0] * p[0] + rot[r * 3 + 1] * p[1] +
                 rot[r * 3 + 2] * p[2];
      } else {
        q[0] = p[0]; q[1] = p[1]; q[2] = p[2];
      }
      for (int d = 0; d < 3; ++d) {
        mn[d] = q[d] < mn[d] ? q[d] : mn[d];
        mx[d] = q[d] > mx[d] ? q[d] : mx[d];
        sum[d] += q[d];
      }
    }
    for (int d = 0; d < 3; ++d) {
      out_locs[o * 6 + d] = static_cast<float>(sum[d] / (n > 0 ? n : 1));
      out_locs[o * 6 + 3 + d] = mx[d] - mn[d];
    }

    // sample num_points indices: without replacement when n >= num_points
    // (partial Fisher–Yates over a virtual arange), else with replacement
    if (n >= num_points) {
      // floyd's algorithm-lite: partial shuffle on an index scratch
      // (n can be large; use selection-by-swap on a local window when
      // n <= 1<<20, else fall back to with-replacement)
      if (n <= (1 << 20)) {
        int32_t* pool = new int32_t[n];
        for (int64_t i = 0; i < n; ++i) pool[i] = static_cast<int32_t>(i);
        for (int64_t i = 0; i < num_points; ++i) {
          const uint32_t j = i + rng.below(static_cast<uint32_t>(n - i));
          const int32_t tmp = pool[i]; pool[i] = pool[j]; pool[j] = tmp;
          idx[i] = pool[i];
        }
        delete[] pool;
      } else {
        for (int64_t i = 0; i < num_points; ++i)
          idx[i] = static_cast<int32_t>(rng.below(static_cast<uint32_t>(n)));
      }
    } else {
      for (int64_t i = 0; i < num_points; ++i)
        idx[i] = n > 0 ? static_cast<int32_t>(rng.below(static_cast<uint32_t>(n))) : 0;
    }

    // pass 2: gather (with rotation) + sampled-mean
    double smean[3] = {0, 0, 0};
    for (int64_t i = 0; i < num_points; ++i) {
      const float* p = src + static_cast<int64_t>(idx[i]) * 6;
      float* q = dst + i * 6;
      if (rot) {
        for (int r = 0; r < 3; ++r)
          q[r] = rot[r * 3 + 0] * p[0] + rot[r * 3 + 1] * p[1] +
                 rot[r * 3 + 2] * p[2];
      } else {
        q[0] = p[0]; q[1] = p[1]; q[2] = p[2];
      }
      q[3] = p[3]; q[4] = p[4]; q[5] = p[5];
      for (int d = 0; d < 3; ++d) smean[d] += q[d];
    }
    float mean[3];
    for (int d = 0; d < 3; ++d)
      mean[d] = static_cast<float>(smean[d] / num_points);

    // pass 3: center + unit-sphere normalize
    float max_d2 = 0.f;
    for (int64_t i = 0; i < num_points; ++i) {
      float* q = dst + i * 6;
      for (int d = 0; d < 3; ++d) q[d] -= mean[d];
      const float d2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2];
      max_d2 = d2 > max_d2 ? d2 : max_d2;
    }
    float max_dist = std::sqrt(max_d2);
    if (max_dist < 1e-6f) max_dist = 1.f;  // tiny/padding clouds
    const float inv = 1.f / max_dist;
    for (int64_t i = 0; i < num_points; ++i) {
      float* q = dst + i * 6;
      q[0] *= inv; q[1] *= inv; q[2] *= inv;
    }
  }
  delete[] idx;
}

}  // extern "C"
