// Native event-chunk packer: the host-side data path feeding the fused
// Pallas rasterizers (ops/pallas_objective_banded.py).
//
// The Python packers scan the event array once per group
// (np.nonzero(group_of == g) for every band / tile / (bin, band) group):
// O(n_groups * n), plus several full numpy passes just to compute group
// ids.  This is the per-frame host cost of the eval loop and grows with
// event rate (DSEC windows are ~10-50x MVSEC's 30k events).  Here: group
// ids are computed inline and the chunks are built with one stable
// two-pass counting sort, O(n + n_groups), emitting the exact same chunk
// layout (same event order within each group) as the Python packers —
// byte-identical outputs, verified by tests/test_native_packer.py.
//
// Built lazily by native/__init__.py (g++ -O3 -shared -fPIC) and loaded
// via ctypes; every consumer falls back to the Python packers when the
// toolchain or the .so is unavailable.
//
// Reference counterpart: none (the reference is pure Python + ATen; its
// packing analog is the per-patch event cropping in
// patch_contrast_base.py:253-271).  This is first-party native runtime
// code of the TPU framework's host data path.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int32_t clamp32(int64_t v, int32_t lo, int32_t hi) {
  if (v < lo) return lo;
  if (v > hi) return hi;
  return static_cast<int32_t>(v);
}

}  // namespace

extern "C" {

// Pack events into fixed-size chunks grouped by
//   group = (bin * n_rows + row) * n_cols + col
// where row  = clip(int(x) / band_px, 0, n_rows-1)
//       col  = clip(int(y) / colband_px, 0, n_cols-1)   (0 if n_cols == 1)
//       bin  = clip(floor(dtf * n_bins), 0, n_bins-1)   (0 if n_bins == 1)
// matching the numpy group formulas of the Python packers exactly (the
// trunc-vs-floor division difference for negative coordinates vanishes
// under the clip: any negative lands at 0 either way).
//
// events: row-major [n, stride] doubles with x at column 0, y at column 1.
// An event is valid iff weights[i] > 0.  Chunks are emitted in ascending
// group order; each group's events keep their input order and pad the
// group's last chunk with the sentinel (x = y = sentinel, d = w = 0).
// Outputs must be pre-sized to g_max * chunk and are fully overwritten.
// chunk_group[g] receives the group id of chunk g (0 for unused trailing
// chunks).  Returns the number of chunks used, or -1 on bad args / bound
// overflow.
int64_t evf_pack_events(
    const double* events, int64_t n, int64_t stride,
    const double* weights, const double* dtf,
    int32_t band_px, int32_t n_rows,
    int32_t colband_px, int32_t n_cols,
    int32_t n_bins,
    int32_t chunk, int64_t g_max, double sentinel,
    double* x_out, double* y_out, double* d_out, double* w_out,
    int32_t* chunk_group) {
  if (n_rows <= 0 || n_cols <= 0 || n_bins <= 0 || chunk <= 0 || g_max <= 0 ||
      band_px <= 0 || (n_cols > 1 && colband_px <= 0) || stride < 2) {
    return -1;
  }
  const int64_t n_groups =
      static_cast<int64_t>(n_bins) * n_rows * n_cols;

  // Pass 1: group ids + per-group counts.
  std::vector<int32_t> group(static_cast<size_t>(n > 0 ? n : 1));
  std::vector<int64_t> count(static_cast<size_t>(n_groups), 0);
  for (int64_t i = 0; i < n; ++i) {
    if (!(weights[i] > 0.0)) {
      group[static_cast<size_t>(i)] = -1;
      continue;
    }
    const double* e = events + i * stride;
    const int32_t row = clamp32(static_cast<int64_t>(e[0]) / band_px, 0, n_rows - 1);
    int32_t g = row;
    if (n_cols > 1) {
      const int32_t col =
          clamp32(static_cast<int64_t>(e[1]) / colband_px, 0, n_cols - 1);
      g = row * n_cols + col;
    }
    if (n_bins > 1) {
      const int32_t bin = clamp32(
          static_cast<int64_t>(std::floor(dtf[i] * n_bins)), 0, n_bins - 1);
      g += bin * n_rows * n_cols;
    }
    group[static_cast<size_t>(i)] = g;
    ++count[static_cast<size_t>(g)];
  }

  // Chunk offsets per group (each group starts a fresh chunk).
  std::vector<int64_t> chunk0(static_cast<size_t>(n_groups) + 1, 0);
  int64_t g_used = 0;
  for (int64_t g = 0; g < n_groups; ++g) {
    chunk0[static_cast<size_t>(g)] = g_used;
    g_used += (count[static_cast<size_t>(g)] + chunk - 1) / chunk;
  }
  chunk0[static_cast<size_t>(n_groups)] = g_used;
  if (g_used > g_max) return -1;

  std::memset(chunk_group, 0, sizeof(int32_t) * static_cast<size_t>(g_max));
  for (int64_t g = 0; g < n_groups; ++g) {
    for (int64_t c = chunk0[static_cast<size_t>(g)];
         c < chunk0[static_cast<size_t>(g) + 1]; ++c) {
      chunk_group[c] = static_cast<int32_t>(g);
    }
  }

  // Initialize only the slots the fill pass won't write: per-group chunk
  // padding tails plus every unused trailing chunk (one contiguous span).
  auto init_span = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      x_out[i] = sentinel;
      y_out[i] = sentinel;
    }
    std::memset(d_out + lo, 0, sizeof(double) * static_cast<size_t>(hi - lo));
    std::memset(w_out + lo, 0, sizeof(double) * static_cast<size_t>(hi - lo));
  };
  for (int64_t g = 0; g < n_groups; ++g) {
    const int64_t c = count[static_cast<size_t>(g)];
    if (c == 0) continue;  // group has no chunks
    const int64_t last_end = chunk0[static_cast<size_t>(g) + 1] * chunk;
    init_span(chunk0[static_cast<size_t>(g)] * chunk + c, last_end);
  }
  init_span(g_used * chunk, g_max * chunk);

  // Pass 2: stable fill.
  std::vector<int64_t> cursor(static_cast<size_t>(n_groups), 0);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t g = group[static_cast<size_t>(i)];
    if (g < 0) continue;
    const int64_t k = cursor[static_cast<size_t>(g)]++;
    const int64_t slot =
        (chunk0[static_cast<size_t>(g)] + k / chunk) * chunk + (k % chunk);
    const double* e = events + i * stride;
    x_out[slot] = e[0];
    y_out[slot] = e[1];
    d_out[slot] = dtf[i];
    w_out[slot] = weights[i];
  }
  return g_used;
}

}  // extern "C"
