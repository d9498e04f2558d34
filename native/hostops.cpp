// Host-side native ops for omniparser_tpu.
//
// The TPU owns all tensor math; this library covers the host hot spots the
// reference delegates to OpenCV's C++ (SURVEY.md §2.6): connected-component
// extraction over OCR probability maps (models/ocr.py extract_text_boxes).
// Exposed through ctypes (no pybind11 in this image); built by native/Makefile.
//
// Build:  make -C native        ->  native/libhostops.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b < a ? a : b] = (b < a ? b : a);  // smaller id wins
  }
};

}  // namespace

extern "C" {

// Label a thresholded float map with 4-connectivity and emit per-component
// stats: bounding box (x1, y1, x2, y2 exclusive), pixel area, mean prob.
//
// Returns the number of components written (capped at max_out); components
// are emitted in first-pixel (row-major) order, matching OpenCV's
// connectedComponentsWithStats label order.
int32_t extract_components(const float* prob, int32_t h, int32_t w, float thr,
                           int32_t min_area, float min_score, int32_t max_out,
                           int32_t* out_boxes /* [max_out, 4] */,
                           float* out_scores /* [max_out] */,
                           int32_t* out_areas /* [max_out] */) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> labels(n, -1);

  // pass 1: provisional labels + unions against left/up neighbors
  UnionFind uf(0);
  uf.parent.reserve(1024);
  int32_t next = 0;
  for (int32_t y = 0; y < h; ++y) {
    const float* row = prob + static_cast<int64_t>(y) * w;
    int32_t* lrow = labels.data() + static_cast<int64_t>(y) * w;
    const int32_t* up = y > 0 ? lrow - w : nullptr;
    for (int32_t x = 0; x < w; ++x) {
      if (row[x] <= thr) continue;
      int32_t left = x > 0 ? lrow[x - 1] : -1;
      int32_t above = up ? up[x] : -1;
      if (left < 0 && above < 0) {
        lrow[x] = next;
        uf.parent.push_back(next);
        ++next;
      } else if (left >= 0 && above >= 0) {
        lrow[x] = left < above ? left : above;
        uf.unite(left, above);
      } else {
        lrow[x] = left >= 0 ? left : above;
      }
    }
  }
  if (next == 0) return 0;

  // pass 2: resolve roots, accumulate stats in first-seen order
  std::vector<int32_t> order(next, -1);
  std::vector<int32_t> x1, y1, x2, y2, area;
  std::vector<double> psum;
  int32_t count = 0;
  for (int32_t y = 0; y < h; ++y) {
    const float* row = prob + static_cast<int64_t>(y) * w;
    int32_t* lrow = labels.data() + static_cast<int64_t>(y) * w;
    for (int32_t x = 0; x < w; ++x) {
      if (lrow[x] < 0) continue;
      int32_t root = uf.find(lrow[x]);
      int32_t idx = order[root];
      if (idx < 0) {
        idx = order[root] = count++;
        x1.push_back(x); y1.push_back(y); x2.push_back(x); y2.push_back(y);
        area.push_back(0); psum.push_back(0.0);
      }
      if (x < x1[idx]) x1[idx] = x;
      if (x > x2[idx]) x2[idx] = x;
      if (y < y1[idx]) y1[idx] = y;
      if (y > y2[idx]) y2[idx] = y;
      area[idx] += 1;
      psum[idx] += row[x];
    }
  }

  int32_t written = 0;
  for (int32_t i = 0; i < count && written < max_out; ++i) {
    if (area[i] < min_area) continue;
    float score = static_cast<float>(psum[i] / area[i]);
    if (score < min_score) continue;
    out_boxes[written * 4 + 0] = x1[i];
    out_boxes[written * 4 + 1] = y1[i];
    out_boxes[written * 4 + 2] = x2[i] + 1;
    out_boxes[written * 4 + 3] = y2[i] + 1;
    out_scores[written] = score;
    out_areas[written] = area[i];
    ++written;
  }
  return written;
}

}  // extern "C"
