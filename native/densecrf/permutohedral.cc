// Permutohedral lattice filtering — see permutohedral.h.

#include "permutohedral.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace wseg {
namespace {

// Keys are d int16 lattice coordinates with |coord| < 2048 at the CRF
// feature scales (positions / sxy, colours / srgb, elevated by factors
// <= sqrt(2/3)*(d+1)); pack 12 bits per coordinate into one uint64 so
// the hash table is a flat open-addressing array (the std::unordered_
// map<vector<int16_t>> it replaces spent ~1.3 s/image on heap-allocated
// keys at the 384x512 production canvas; this build runs in tens of ms).
inline uint64_t pack_key(const int16_t* k, int d) {
  uint64_t p = 0;
  for (int i = 0; i < d; ++i)
    p = (p << 12) | (static_cast<uint64_t>(k[i] + 2048) & 0xfff);
  return p;
}

inline uint64_t mix64(uint64_t x) {  // splitmix64 finaliser
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

// Flat linear-probing map: packed key -> lattice id.
class FlatTable {
 public:
  explicit FlatTable(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    mask_ = cap - 1;
    keys_.assign(cap, kEmpty);
    ids_.assign(cap, -1);
  }

  // Returns the id for key, inserting next_id if absent (insert=true).
  int32_t lookup(uint64_t key, int32_t next_id, bool insert) {
    size_t slot = mix64(key) & mask_;
    for (;;) {
      if (keys_[slot] == key) return ids_[slot];
      if (keys_[slot] == kEmpty) {
        if (!insert) return -1;
        if ((count_ + 1) * 2 > mask_) {
          grow();
          return lookup(key, next_id, true);
        }
        keys_[slot] = key;
        ids_[slot] = next_id;
        ++count_;
        return next_id;
      }
      slot = (slot + 1) & mask_;
    }
  }

 private:
  void grow() {
    std::vector<uint64_t> ok(std::move(keys_));
    std::vector<int32_t> oi(std::move(ids_));
    size_t cap = (mask_ + 1) * 2;
    mask_ = cap - 1;
    keys_.assign(cap, kEmpty);
    ids_.assign(cap, -1);
    for (size_t s = 0; s <= (ok.size() - 1); ++s) {
      if (ok[s] == kEmpty) continue;
      size_t slot = mix64(ok[s]) & mask_;
      while (keys_[slot] != kEmpty) slot = (slot + 1) & mask_;
      keys_[slot] = ok[s];
      ids_[slot] = oi[s];
    }
  }

  static constexpr uint64_t kEmpty = ~0ull;
  size_t mask_;
  size_t count_ = 0;
  std::vector<uint64_t> keys_;
  std::vector<int32_t> ids_;
};

}  // namespace

void Permutohedral::init(const float* features, int d, int N) {
  N_ = N;
  d_ = d;
  offset_.assign(static_cast<size_t>(N) * (d + 1), 0);
  barycentric_.assign(static_cast<size_t>(N) * (d + 1), 0.f);

  FlatTable table(static_cast<size_t>(N));
  std::vector<int16_t> keys;  // flat d coords per lattice point
  keys.reserve(static_cast<size_t>(N) * d);

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
      const int32_t next = static_cast<int32_t>(keys.size() / d);
      const int32_t id = table.lookup(pack_key(key.data(), d), next,
                                      /*insert=*/true);
      if (id == next) keys.insert(keys.end(), key.begin(), key.end());
      offset_[static_cast<size_t>(n) * (d + 1) + remainder] = id;
      barycentric_[static_cast<size_t>(n) * (d + 1) + remainder] =
          barycentric[remainder];
    }
  }

  M_ = static_cast<int>(keys.size() / d);

  // 7. blur neighbour ids per axis: neighbours of key along axis j are
  // key +/- 1 in every coordinate except -/+ d at coordinate j
  blur_neighbors_.assign(static_cast<size_t>(d + 1) * M_ * 2, M_);
  std::vector<int16_t> n1(d), n2(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < M_; ++i) {
      const int16_t* k = keys.data() + static_cast<size_t>(i) * d;
      for (int c = 0; c < d; ++c) {
        n1[c] = static_cast<int16_t>(k[c] - 1);
        n2[c] = static_cast<int16_t>(k[c] + 1);
      }
      if (j < d) {
        n1[j] = static_cast<int16_t>(k[j] + d);
        n2[j] = static_cast<int16_t>(k[j] - d);
      }
      const int32_t i1 = table.lookup(pack_key(n1.data(), d), -1, false);
      const int32_t i2 = table.lookup(pack_key(n2.data(), d), -1, false);
      blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 0] =
          (i1 >= 0) ? i1 : M_;
      blur_neighbors_[(static_cast<size_t>(j) * M_ + i) * 2 + 1] =
          (i2 >= 0) ? i2 : M_;
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
