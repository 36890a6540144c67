// Reliability-sorted 2D phase unwrapping (Herraez et al., Appl. Opt. 41, 2002).
//
// Host-side companion to the TPU-native DCT least-squares unwrapper
// (style_transfer_based_holographic_imaging_tpu/ops/unwrap.py). The torch
// reference delegates this role to skimage.restoration.unwrap_phase on the
// CPU, one sample at a time (reference: utils/functions.py:44-59); this is
// the same algorithmic family, independently implemented, exposed through a
// minimal C ABI for ctypes.
//
// Algorithm: each pixel gets a reliability from local second differences;
// edges between 4-neighbours are sorted by the sum of their endpoint
// reliabilities (most reliable first) and merged union-find style, adding
// the integer 2*pi multiple that minimises the wrapped difference between
// the two groups at the joining edge.
//
// Build: g++ -O3 -shared -fPIC -o libunwrap.so unwrap.cc

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

constexpr double kTwoPi = 6.283185307179586476925286766559;

inline double wrap(double x) {
  // wrap into (-pi, pi]
  x = std::fmod(x + M_PI, kTwoPi);
  if (x < 0) x += kTwoPi;
  return x - M_PI;
}

struct Edge {
  float reliability;  // higher = join earlier
  int32_t a, b;       // flat pixel indices
};

// Union-find with per-group 2*pi-multiple offsets applied lazily.
struct Groups {
  std::vector<int32_t> parent;
  explicit Groups(int n) : parent(n) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
};

}  // namespace

extern "C" {

// Unwraps `h*w` wrapped phases (radians) from `phase` into `out`.
// Returns 0 on success.
int unwrap2d(const float* phase, int h, int w, float* out) {
  const int n = h * w;
  if (n <= 0) return 1;

  // Working copy as double with per-pixel integer shift accumulated in-place.
  std::vector<double> ph(n);
  for (int i = 0; i < n; ++i) ph[i] = phase[i];

  // --- per-pixel reliability: inverse of local second-difference energy ---
  std::vector<float> rel(n, 0.f);
  auto at = [&](int y, int x) { return ph[y * w + x]; };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // replicate borders for the stencil
      int ym = y > 0 ? y - 1 : y, yp = y < h - 1 ? y + 1 : y;
      int xm = x > 0 ? x - 1 : x, xp = x < w - 1 ? x + 1 : x;
      double c = at(y, x);
      double d2h = wrap(at(y, xm) - c) - wrap(c - at(y, xp));
      double d2v = wrap(at(ym, x) - c) - wrap(c - at(yp, x));
      double d2d1 = wrap(at(ym, xm) - c) - wrap(c - at(yp, xp));
      double d2d2 = wrap(at(ym, xp) - c) - wrap(c - at(yp, xm));
      double e = d2h * d2h + d2v * d2v + d2d1 * d2d1 + d2d2 * d2d2;
      rel[y * w + x] = static_cast<float>(1.0 / (e + 1e-12));
    }
  }

  // --- edges sorted by endpoint reliability, most reliable first ---
  std::vector<Edge> edges;
  edges.reserve(2 * n);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      if (x + 1 < w) edges.push_back({rel[i] + rel[i + 1], i, i + 1});
      if (y + 1 < h) edges.push_back({rel[i] + rel[i + w], i, i + w});
    }
  std::sort(edges.begin(), edges.end(),
            [](const Edge& l, const Edge& r) { return l.reliability > r.reliability; });

  // --- merge groups; the smaller group is shifted by k*2pi ---
  Groups g(n);
  std::vector<std::vector<int32_t>> members(n);
  std::vector<int32_t> sz(n, 1);
  for (int i = 0; i < n; ++i) members[i] = {i};

  for (const Edge& e : edges) {
    int32_t ra = g.find(e.a), rb = g.find(e.b);
    if (ra == rb) continue;
    // offset that aligns b's group to a's at this edge
    double diff = ph[e.a] - ph[e.b];
    double k = std::nearbyint(diff / kTwoPi);
    // shift the smaller group
    if (sz[ra] < sz[rb]) {
      std::swap(ra, rb);
      k = -k;  // now shifting the group containing... careful below
      // After swap, we shift group rb (the smaller); alignment target is ra.
      // The edge endpoints' roles flip implicitly through k's sign only when
      // the shift direction flips, which it does: originally we add k*2pi to
      // group(b); after swap we add -k*2pi to group(a-old)=rb-new.
    }
    double shift = k * kTwoPi;
    if (shift != 0.0) {
      for (int32_t idx : members[rb]) ph[idx] += shift;
    }
    // union rb into ra (the earlier sz-based swap already guarantees
    // sz[ra] >= sz[rb], i.e. ra is the larger group)
    g.parent[rb] = ra;
    members[ra].insert(members[ra].end(), members[rb].begin(), members[rb].end());
    members[rb].clear();
    members[rb].shrink_to_fit();
    sz[ra] += sz[rb];
  }

  for (int i = 0; i < n; ++i) out[i] = static_cast<float>(ph[i]);
  return 0;
}

// Batched variant: `batch` images of h*w, contiguous.
int unwrap2d_batch(const float* phase, int batch, int h, int w, float* out) {
  const int n = h * w;
  for (int b = 0; b < batch; ++b) {
    int rc = unwrap2d(phase + static_cast<int64_t>(b) * n, h, w,
                      out + static_cast<int64_t>(b) * n);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
