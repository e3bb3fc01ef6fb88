// Native host-side kernels for deep3d_aerial_tpu.
//
// TPU-native replacement for the runtime roles the reference delegates to
// external native code (numpy-groupies style grid reductions for the DSM
// stage, point-cloud decimation for meshing). Compiled to
// libaerial3d_native.so and bound via ctypes (see
// deep3d_aerial_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Per-cell max-z reduction. grid is rows*cols, prefilled with nodata.
// Returns number of points binned.
int64_t dsm_reduce_max(const float* xyz, int64_t n_points,
                       double x_min, double y_max, double dx, double dy,
                       int64_t rows, int64_t cols, float nodata, float* grid) {
  int64_t used = 0;
  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = xyz + 3 * i;
    int64_t ix = (int64_t)std::floor((p[0] - x_min) / dx);
    int64_t iy = (int64_t)std::floor((y_max - p[1]) / dy);
    if (ix < 0 || ix >= cols || iy < 0 || iy >= rows) continue;
    float& cell = grid[iy * cols + ix];
    if (cell == nodata || p[2] > cell) cell = p[2];
    ++used;
  }
  return used;
}

// Robust per-cell max: MAD-based outlier rejection, then max of inliers.
// Sort-based cell grouping; O(N log N).
int64_t dsm_reduce_robust_max(const float* xyz, int64_t n_points,
                              double x_min, double y_max, double dx, double dy,
                              int64_t rows, int64_t cols, float nodata,
                              float* grid) {
  struct Rec { int64_t cell; float z; };
  std::vector<Rec> recs;
  recs.reserve(n_points);
  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = xyz + 3 * i;
    int64_t ix = (int64_t)std::floor((p[0] - x_min) / dx);
    int64_t iy = (int64_t)std::floor((y_max - p[1]) / dy);
    if (ix < 0 || ix >= cols || iy < 0 || iy >= rows) continue;
    recs.push_back({iy * cols + ix, p[2]});
  }
  std::sort(recs.begin(), recs.end(), [](const Rec& a, const Rec& b) {
    return a.cell < b.cell || (a.cell == b.cell && a.z < b.z);
  });

  std::vector<float> seg;
  size_t i = 0;
  while (i < recs.size()) {
    size_t j = i;
    while (j < recs.size() && recs[j].cell == recs[i].cell) ++j;
    size_t k = j - i;  // segment [i, j), z already sorted ascending
    float value;
    if (k < 4) {
      value = recs[j - 1].z;
    } else {
      // median + MAD on the sorted segment
      float med = (k & 1) ? recs[i + k / 2].z
                          : 0.5f * (recs[i + k / 2 - 1].z + recs[i + k / 2].z);
      seg.resize(k);
      for (size_t t = 0; t < k; ++t) seg[t] = std::fabs(recs[i + t].z - med);
      std::nth_element(seg.begin(), seg.begin() + k / 2, seg.end());
      float mad = seg[k / 2] + 1e-9f;
      float cutoff = 5.0f * 1.4826f * mad;
      // max inlier: scan down from the top
      value = recs[j - 1].z;
      for (size_t t = j; t-- > i;) {
        if (std::fabs(recs[t].z - med) < cutoff) { value = recs[t].z; break; }
      }
    }
    grid[recs[i].cell] = value;
    i = j;
  }
  return (int64_t)recs.size();
}

// Grid decimation for meshing: keep, per xy cell, the point whose z is
// closest to the cell median. Writes selected indices; returns count.
int64_t grid_decimate(const float* xyz, int64_t n_points, double spacing,
                      int64_t* out_indices) {
  if (n_points == 0) return 0;
  struct Rec { int64_t cell_x, cell_y; float z; int64_t idx; };
  std::vector<Rec> recs(n_points);
  for (int64_t i = 0; i < n_points; ++i) {
    const float* p = xyz + 3 * i;
    recs[i] = {(int64_t)std::floor(p[0] / spacing),
               (int64_t)std::floor(p[1] / spacing), p[2], i};
  }
  std::sort(recs.begin(), recs.end(), [](const Rec& a, const Rec& b) {
    if (a.cell_x != b.cell_x) return a.cell_x < b.cell_x;
    if (a.cell_y != b.cell_y) return a.cell_y < b.cell_y;
    return a.z < b.z;
  });
  int64_t count = 0;
  size_t i = 0;
  while (i < recs.size()) {
    size_t j = i;
    while (j < recs.size() && recs[j].cell_x == recs[i].cell_x &&
           recs[j].cell_y == recs[i].cell_y)
      ++j;
    size_t k = j - i;
    float med = (k & 1) ? recs[i + k / 2].z
                        : 0.5f * (recs[i + k / 2 - 1].z + recs[i + k / 2].z);
    size_t best = i;
    float best_d = std::fabs(recs[i].z - med);
    for (size_t t = i + 1; t < j; ++t) {
      float d = std::fabs(recs[t].z - med);
      if (d < best_d) { best_d = d; best = t; }
    }
    out_indices[count++] = recs[best].idx;
    i = j;
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Triangle-mesh max-z rasterization (the hot loop of DSM-from-mesh;
// replaces the per-triangle Python loop in dsm/rasterize.py).
// tris: [nf*9] (x0,y0,z0, x1,y1,z1, x2,y2,z2); grid row 0 = bbx ymax edge.
extern "C" int64_t rasterize_mesh_max(
    const double *tris, int64_t nf,
    double xmin, double ymax, double dx, double dy,
    int64_t rows, int64_t cols, float nodata, float *grid /* rows*cols */) {
  for (int64_t i = 0; i < rows * cols; i++) grid[i] = nodata;
  int64_t hits = 0;
  for (int64_t f = 0; f < nf; f++) {
    const double *t = tris + 9 * f;
    double x1 = t[0], y1 = t[1], z1 = t[2];
    double x2 = t[3], y2 = t[4], z2 = t[5];
    double x3 = t[6], y3 = t[7], z3 = t[8];
    double txmin = std::min({x1, x2, x3}), txmax = std::max({x1, x2, x3});
    double tymin = std::min({y1, y2, y3}), tymax = std::max({y1, y2, y3});
    int64_t ix0 = std::max<int64_t>(0, (int64_t)std::floor((txmin - xmin) / dx));
    int64_t ix1 = std::min<int64_t>(cols - 1,
                                    (int64_t)std::floor((txmax - xmin) / dx));
    int64_t iy0 = std::max<int64_t>(0, (int64_t)std::floor((ymax - tymax) / dy));
    int64_t iy1 = std::min<int64_t>(rows - 1,
                                    (int64_t)std::floor((ymax - tymin) / dy));
    if (ix1 < ix0 || iy1 < iy0) continue;
    double den = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3);
    if (std::abs(den) < 1e-12) continue;
    for (int64_t iy = iy0; iy <= iy1; iy++) {
      double cy = ymax - (iy + 0.5) * dy;
      for (int64_t ix = ix0; ix <= ix1; ix++) {
        double cx = xmin + (ix + 0.5) * dx;
        double l1 = ((y2 - y3) * (cx - x3) + (x3 - x2) * (cy - y3)) / den;
        double l2 = ((y3 - y1) * (cx - x3) + (x1 - x3) * (cy - y3)) / den;
        double l3 = 1.0 - l1 - l2;
        if (l1 < -1e-9 || l2 < -1e-9 || l3 < -1e-9) continue;
        float z = (float)(l1 * z1 + l2 * z2 + l3 * z3);
        float &g = grid[iy * cols + ix];
        if (g == nodata || z > g) g = z;
        hits++;
      }
    }
  }
  return hits;
}
