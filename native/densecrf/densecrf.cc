// Dense-CRF mean-field inference with permutohedral filtering.
//
// C API matching the reference's pydensecrf usage (utils/dcrf.py:6-21):
// unary from softmax probabilities, Gaussian pairwise (sxy, compat) +
// bilateral pairwise (sxy, srgb, compat), Potts compatibility, symmetric
// kernel normalisation, t mean-field iterations.
//
// Exposed via ctypes from wseg_tpu/ops/crf_native.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#include "permutohedral.h"

namespace {

void filter_normalised(const wseg::Permutohedral& lat, int N, int C,
                       const std::vector<float>& norm, const float* in,
                       float* out, std::vector<float>& tmp) {
  // out = norm * K(norm * in)   (symmetric normalisation)
  tmp.resize(static_cast<size_t>(N) * C);
  for (int n = 0; n < N; ++n)
    for (int c = 0; c < C; ++c)
      tmp[static_cast<size_t>(n) * C + c] =
          in[static_cast<size_t>(n) * C + c] * norm[n];
  lat.compute(out, tmp.data(), C);
  for (int n = 0; n < N; ++n)
    for (int c = 0; c < C; ++c)
      out[static_cast<size_t>(n) * C + c] *= norm[n];
}

std::vector<float> kernel_norm(const wseg::Permutohedral& lat, int N) {
  std::vector<float> ones(N, 1.f), n(N);
  lat.compute(n.data(), ones.data(), 1);
  for (int i = 0; i < N; ++i)
    n[i] = 1.0f / std::sqrt(std::max(n[i], 1e-20f));
  return n;
}

}  // namespace

extern "C" {

// img:  H*W*3 uint8 RGB
// probs: H*W*C float32 (HWC), overwritten is NOT done; result into out
// returns 0 on success
int wseg_densecrf_inference(const uint8_t* img, int H, int W, int C,
                            const float* probs, float* out, int t,
                            float sxy_gaussian, float compat_gaussian,
                            float sxy_bilateral, float srgb,
                            float compat_bilateral) {
  const int N = H * W;

  // --- lattice features
  std::vector<float> feat_g(static_cast<size_t>(N) * 2);
  std::vector<float> feat_b(static_cast<size_t>(N) * 5);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const int n = y * W + x;
      feat_g[n * 2 + 0] = x / sxy_gaussian;
      feat_g[n * 2 + 1] = y / sxy_gaussian;
      feat_b[n * 5 + 0] = x / sxy_bilateral;
      feat_b[n * 5 + 1] = y / sxy_bilateral;
      feat_b[n * 5 + 2] = img[n * 3 + 0] / srgb;
      feat_b[n * 5 + 3] = img[n * 3 + 1] / srgb;
      feat_b[n * 5 + 4] = img[n * 3 + 2] / srgb;
    }
  }

  wseg::Permutohedral lat_g, lat_b;
  lat_g.init(feat_g.data(), 2, N);
  lat_b.init(feat_b.data(), 5, N);
  std::vector<float> norm_g = kernel_norm(lat_g, N);
  std::vector<float> norm_b = kernel_norm(lat_b, N);

  // --- unary = -log(p)
  std::vector<float> unary(static_cast<size_t>(N) * C);
  for (size_t i = 0; i < unary.size(); ++i)
    unary[i] = -std::log(std::max(probs[i], 1e-8f));

  std::vector<float> Q(probs, probs + static_cast<size_t>(N) * C);
  std::vector<float> msg_g(static_cast<size_t>(N) * C);
  std::vector<float> msg_b(static_cast<size_t>(N) * C);
  std::vector<float> tmp;

  for (int it = 0; it < t; ++it) {
    filter_normalised(lat_g, N, C, norm_g, Q.data(), msg_g.data(), tmp);
    filter_normalised(lat_b, N, C, norm_b, Q.data(), msg_b.data(), tmp);
    // Potts update + softmax (self term included, as in the dense-CRF
    // reference implementation)
    for (int n = 0; n < N; ++n) {
      float mx = -1e30f;
      float* q = Q.data() + static_cast<size_t>(n) * C;
      const float* u = unary.data() + static_cast<size_t>(n) * C;
      const float* mg = msg_g.data() + static_cast<size_t>(n) * C;
      const float* mb = msg_b.data() + static_cast<size_t>(n) * C;
      for (int c = 0; c < C; ++c) {
        q[c] = -u[c] + compat_gaussian * mg[c] + compat_bilateral * mb[c];
        mx = std::max(mx, q[c]);
      }
      float s = 0.f;
      for (int c = 0; c < C; ++c) {
        q[c] = std::exp(q[c] - mx);
        s += q[c];
      }
      for (int c = 0; c < C; ++c) q[c] /= s;
    }
  }

  std::copy(Q.begin(), Q.end(), out);
  return 0;
}

// ---- lattice-table export for the TPU-resident exact CRF -------------
//
// The device mean-field path (wseg_tpu/ops/crf_lattice.py) runs every
// splat/blur/slice on the TPU; the host only builds the lattice tables
// (hashing is the one data-dependent, TPU-hostile step).  Two-call
// protocol: build returns a handle + M, export copies the tables into
// caller buffers sized from M, free releases the handle.

void* wseg_permutohedral_build(const float* features, int d, int N,
                               int* M_out) {
  auto* lat = new wseg::Permutohedral();
  lat->init(features, d, N);
  *M_out = lat->num_lattice_points();
  return lat;
}

// offsets: N*(d+1) int32, barycentric: N*(d+1) float,
// blur_neighbors: (d+1)*M*2 int32 (missing neighbour encoded as M).
int wseg_permutohedral_export(void* handle, int32_t* offsets,
                              float* barycentric,
                              int32_t* blur_neighbors) {
  auto* lat = static_cast<wseg::Permutohedral*>(handle);
  const auto& off = lat->offsets();
  const auto& bar = lat->barycentrics();
  const auto& nbr = lat->blur_neighbor_ids();
  std::copy(off.begin(), off.end(), offsets);
  std::copy(bar.begin(), bar.end(), barycentric);
  std::copy(nbr.begin(), nbr.end(), blur_neighbors);
  return 0;
}

void wseg_permutohedral_free(void* handle) {
  delete static_cast<wseg::Permutohedral*>(handle);
}

// Raw permutohedral filtering (for tests): features d x N, values C x N.
int wseg_permutohedral_filter(const float* features, int d, int N,
                              const float* values, int C, float* out) {
  wseg::Permutohedral lat;
  lat.init(features, d, N);
  lat.compute(out, values, C);
  return 0;
}

}  // extern "C"
