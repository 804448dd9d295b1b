// Native host-side batch packer.
//
// The ragged->static collation (zero-pad points, -1-pad labels, build
// masks — the reference's collate_fn, point_cloud_segmentation.py:44-63)
// is the per-batch host hot path: it touches every byte of every batch.
// The reference hides this cost in 32 DataLoader worker processes; here a
// single C++ pass memsets + memcpys the padded buffers directly into
// numpy-owned memory with no Python per-event overhead.
//
// Build: g++ -O3 -march=native -shared -fPIC collate.cpp -o libcollate.so
// (pcseg_tpu/native/build.py does this on demand).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Pack up to n_events ragged events into a (batch_size, max_points, ...)
// dense batch. Rows beyond n_events stay fully padded (mask 0, labels -1).
//
// points_flat : concatenation of all events' (n_i * feat_dim) floats
// labels_flat : concatenation of all events' n_i int64 labels
// n_points    : per-event point counts (n_events entries)
// out_points  : (batch_size * max_points * feat_dim) float32, overwritten
// out_labels  : (batch_size * max_points) int64, overwritten
// out_masks   : (batch_size * max_points) uint8 (bool), overwritten
//
// Returns 0 on success, -1 if any event exceeds max_points or
// n_events > batch_size.
int32_t pack_batch(const float* points_flat,
                   const int64_t* labels_flat,
                   const int32_t* n_points,
                   int32_t n_events,
                   int32_t batch_size,
                   int32_t max_points,
                   int32_t feat_dim,
                   float* out_points,
                   int64_t* out_labels,
                   uint8_t* out_masks) {
  if (n_events > batch_size) return -1;
  for (int32_t i = 0; i < n_events; ++i) {
    if (n_points[i] > max_points) return -1;
  }

  const int64_t row_pts = static_cast<int64_t>(max_points) * feat_dim;
  std::memset(out_points, 0,
              sizeof(float) * static_cast<int64_t>(batch_size) * row_pts);
  std::memset(out_masks, 0,
              static_cast<int64_t>(batch_size) * max_points);
  std::fill(out_labels,
            out_labels + static_cast<int64_t>(batch_size) * max_points,
            static_cast<int64_t>(-1));

  const float* p_src = points_flat;
  const int64_t* l_src = labels_flat;
  for (int32_t i = 0; i < n_events; ++i) {
    const int32_t n = n_points[i];
    std::memcpy(out_points + i * row_pts, p_src,
                sizeof(float) * static_cast<int64_t>(n) * feat_dim);
    std::memcpy(out_labels + static_cast<int64_t>(i) * max_points, l_src,
                sizeof(int64_t) * n);
    std::memset(out_masks + static_cast<int64_t>(i) * max_points, 1, n);
    p_src += static_cast<int64_t>(n) * feat_dim;
    l_src += n;
  }
  return 0;
}

// Length-bucketed epoch plan: given per-event point counts and a shuffled
// order, sort each window of `window` indices by length (stable) in place.
// This is BucketBatcher._epoch_order's inner loop without Python.
void bucket_sort_windows(int64_t* order,
                         const int32_t* lengths,
                         int64_t n,
                         int64_t window) {
  for (int64_t s = 0; s < n; s += window) {
    int64_t e = std::min(s + window, n);
    std::stable_sort(order + s, order + e,
                     [lengths](int64_t a, int64_t b) {
                       return lengths[a] < lengths[b];
                     });
  }
}

}  // extern "C"
