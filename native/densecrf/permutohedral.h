// Permutohedral lattice for high-dimensional Gaussian filtering.
//
// Implements the algorithm of Adams, Baek & Davis, "Fast High-Dimensional
// Filtering Using the Permutohedral Lattice" (EG 2010) as used by dense-CRF
// mean-field inference (Krähenbühl & Koltun, NIPS 2011).  This is the
// native replacement for the reference's pydensecrf dependency
// (reference utils/dcrf.py:6-21): exact bilateral filtering in O(N*d).
//
// Written from the published algorithm; no third-party code.

#pragma once

#include <cstdint>
#include <vector>

namespace wseg {

class Permutohedral {
 public:
  // features: d x N column-major-ish (feature f_i at features[i*d .. ])
  void init(const float* features, int d, int N);

  // value_size-channel filtering: out[i*C+c] = sum_j k(f_i,f_j) in[j*C+c]
  // (self term included, matching the dense-CRF reference usage).
  void compute(float* out, const float* in, int value_size) const;

  int num_lattice_points() const { return M_; }
  int dim() const { return d_; }

  // table accessors for the TPU-resident mean-field path: the lattice is
  // built once per image on the host, the splat/blur/slice tables are
  // shipped to the device and every mean-field iteration runs there
  // (wseg_tpu/ops/crf_lattice.py).
  const std::vector<int32_t>& offsets() const { return offset_; }
  const std::vector<float>& barycentrics() const { return barycentric_; }
  const std::vector<int32_t>& blur_neighbor_ids() const {
    return blur_neighbors_;
  }

 private:
  int N_ = 0;   // number of positions
  int d_ = 0;   // feature dimension
  int M_ = 0;   // number of occupied lattice points

  // per position: d+1 simplex vertex ids and barycentric weights
  std::vector<int32_t> offset_;     // N * (d+1)
  std::vector<float> barycentric_;  // N * (d+1)

  // blur neighbours: for each axis and lattice point, the ids of the
  // neighbouring lattice points along that axis (or M_ = "none")
  std::vector<int32_t> blur_neighbors_;  // d+1 axes * M_ * 2
};

}  // namespace wseg
