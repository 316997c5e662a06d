// Permutohedral lattice filtering — see permutohedral.h.

#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <unordered_map>

namespace wseg {
namespace {

// Hash for short integer keys of length d.
struct KeyHash {
  size_t operator()(const std::vector<int16_t>& k) const {
    size_t h = 14695981039346656037ull;
    for (int16_t v : k) {
      h ^= static_cast<size_t>(static_cast<uint16_t>(v));
      h *= 1099511628211ull;
    }
    return h;
  }
};

using HashTable =
    std::unordered_map<std::vector<int16_t>, int32_t, KeyHash>;

}  // namespace

void Permutohedral::init(const float* features, int d, int N) {
  N_ = N;
  d_ = d;
  offset_.assign(static_cast<size_t>(N) * (d + 1), 0);
  barycentric_.assign(static_cast<size_t>(N) * (d + 1), 0.f);

  HashTable table;
  table.reserve(static_cast<size_t>(N) * (d + 1));
  std::vector<std::vector<int16_t>> keys;  // key per lattice point
  keys.reserve(static_cast<size_t>(N));

  // Elevation scale: compensates the variance of the blur kernel so the
  // effective filter is a unit Gaussian in feature space.
  std::vector<float> scale_factor(d);
  const float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale_factor[i] = inv_std_dev / std::sqrt(
        static_cast<float>((i + 1) * (i + 2)));

  std::vector<float> elevated(d + 1);
  std::vector<float> rem0(d + 1);
  std::vector<int> rank(d + 1);
  std::vector<float> barycentric(d + 2);
  std::vector<int16_t> key(d);

  for (int n = 0; n < N; ++n) {
    const float* f = features + static_cast<size_t>(n) * d;

    // 1. embed into the hyperplane H_d: sum(elevated) == 0
    float sm = 0.f;
    for (int i = d; i > 0; --i) {
      float cf = f[i - 1] * scale_factor[i - 1];
      elevated[i] = sm - i * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // 2. nearest zero-coloured lattice point (multiples of d+1)
    int sum = 0;
    const float down = 1.0f / (d + 1);
    for (int i = 0; i <= d; ++i) {
      float v = elevated[i] * down;
      float up_r = std::ceil(v) * (d + 1);
      float down_r = std::floor(v) * (d + 1);
      rem0[i] = (up_r - elevated[i] < elevated[i] - down_r) ? up_r
                                                            : down_r;
      sum += static_cast<int>(rem0[i] * down);
    }

    // 3. rank the differential to find the enclosing simplex
    for (int i = 0; i <= d; ++i) rank[i] = 0;
    for (int i = 0; i < d; ++i) {
      float di = elevated[i] - rem0[i];
      for (int j = i + 1; j <= d; ++j) {
        float dj = elevated[j] - rem0[j];
        if (di < dj)
          ++rank[i];
        else
          ++rank[j];
      }
    }

    // 4. fix points whose coordinate sum is off the hyperplane
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += d + 1;
        rem0[i] += d + 1;
      } else if (rank[i] > d) {
        rank[i] -= d + 1;
        rem0[i] -= d + 1;
      }
    }

    // 5. barycentric coordinates of the simplex
    std::fill(barycentric.begin(), barycentric.end(), 0.f);
    for (int i = 0; i <= d; ++i) {
      float delta = (elevated[i] - rem0[i]) * down;
      barycentric[d - rank[i]] += delta;
      barycentric[d + 1 - rank[i]] -= delta;
    }
    barycentric[0] += 1.0f + barycentric[d + 1];

    // 6. register the d+1 simplex vertices in the lattice hash
    for (int remainder = 0; remainder <= d; ++remainder) {
      // vertex key (first d coordinates; the last is implied)
      for (int i = 0; i < d; ++i) {
        float v = rem0[i] + remainder;
        if (rank[i] > d - remainder) v -= (d + 1);
        key[i] = static_cast<int16_t>(v);
      }
      auto it = table.find(key);
      int32_t id;
      if (it == table.end()) {
        id = static_cast<int32_t>(keys.size());
        table.emplace(key, id);
        keys.push_back(key);
      } else {
        id = it->second;
      }
      offset_[static_cast<size_t>(n) * (d + 1) + remainder] = id;
      barycentric_[static_cast<size_t>(n) * (d + 1) + remainder] =
          barycentric[remainder];
    }
  }

  M_ = static_cast<int>(keys.size());

  // 7. blur neighbour ids per axis: neighbours of key along axis j are
  // key +/- 1 in every coordinate except -/+ d at coordinate j
  blur_neighbors_.assign(static_cast<size_t>(d + 1) * M_ * 2, M_);
  std::vector<int16_t> n1(d), n2(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < M_; ++i) {
      const std::vector<int16_t>& k = keys[i];
      for (int c = 0; c < d; ++c) {
        n1[c] = static_cast<int16_t>(k[c] - 1);
        n2[c] = static_cast<int16_t>(k[c] + 1);
      }
      if (j < d) {
        n1[j] = static_cast<int16_t>(k[j] + d);
        n2[j] = static_cast<int16_t>(k[j] - d);
      }
      auto i1 = table.find(n1);
      auto i2 = table.find(n2);
      blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 0] =
          (i1 != table.end()) ? i1->second : M_;
      blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 1] =
          (i2 != table.end()) ? i2->second : M_;
    }
  }
}

void Permutohedral::compute(float* out, const float* in,
                            int value_size) const {
  const int C = value_size;
  // values for M_ lattice points + one zero slot for missing neighbours
  std::vector<float> values(static_cast<size_t>(M_ + 1) * C, 0.f);
  std::vector<float> new_values(static_cast<size_t>(M_ + 1) * C, 0.f);

  // splat
  for (int n = 0; n < N_; ++n) {
    for (int r = 0; r <= d_; ++r) {
      int32_t o = offset_[static_cast<size_t>(n) * (d_ + 1) + r];
      float w = barycentric_[static_cast<size_t>(n) * (d_ + 1) + r];
      float* dst = values.data() + static_cast<size_t>(o) * C;
      const float* src = in + static_cast<size_t>(n) * C;
      for (int c = 0; c < C; ++c) dst[c] += w * src[c];
    }
  }

  // blur along each lattice axis with the [1, 2, 1] kernel
  for (int j = 0; j <= d_; ++j) {
    for (int i = 0; i < M_; ++i) {
      const int32_t b1 =
          blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 0];
      const int32_t b2 =
          blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 1];
      const float* v0 = values.data() + static_cast<size_t>(i) * C;
      const float* v1 = values.data() + static_cast<size_t>(b1) * C;
      const float* v2 = values.data() + static_cast<size_t>(b2) * C;
      float* dst = new_values.data() + static_cast<size_t>(i) * C;
      for (int c = 0; c < C; ++c)
        dst[c] = v0[c] + 0.5f * (v1[c] + v2[c]);
    }
    std::swap(values, new_values);
  }

  // slice (alpha corrects the blur gain: 1 / (1 + 2^-d))
  const float alpha = 1.0f / (1.0f + std::pow(2.0f, -d_));
  std::memset(out, 0, static_cast<size_t>(N_) * C * sizeof(float));
  for (int n = 0; n < N_; ++n) {
    float* dst = out + static_cast<size_t>(n) * C;
    for (int r = 0; r <= d_; ++r) {
      int32_t o = offset_[static_cast<size_t>(n) * (d_ + 1) + r];
      float w = barycentric_[static_cast<size_t>(n) * (d_ + 1) + r];
      const float* src = values.data() + static_cast<size_t>(o) * C;
      for (int c = 0; c < C; ++c) dst[c] += alpha * w * src[c];
    }
  }
}

}  // namespace wseg
