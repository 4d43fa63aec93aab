// Native host-side event batch packing for the input pipelines.
//
// The reference framework's host hot path runs per-sample inside Python
// DataLoader workers (SURVEY §3.3); here the variable-length -> fixed-
// capacity packing (window select + pad + batch assembly, the step between
// file decode and device transfer) is one multithreaded C++ call:
//
//   pack_event_batch: gather B variable-length (N_i, 4) float32 streams into
//   one (B, capacity, 4) padded batch + (B,) counts, taking the LAST
//   `capacity` events when longer (backward window) or a caller-provided
//   window start.
//
// Built by eventpretrain_tpu/native/__init__.py via g++ at first use;
// loaded with ctypes. A numpy fallback keeps the package dependency-free.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// event_ptrs: B pointers to (len_i, 4) float32 rows (xytp)
// starts:     B window start indices (row offset into each stream)
// lengths:    B row counts available from starts (already clamped by caller)
// out:        (B, capacity, 4) float32, zero-filled here
// counts:     (B,) int32 valid-row counts
void pack_event_batch(const float** event_ptrs, const int64_t* starts,
                      const int64_t* lengths, int64_t batch,
                      int64_t capacity, float* out, int32_t* counts) {
  const int64_t row_floats = 4;
  const int64_t sample_floats = capacity * row_floats;

  int num_threads = std::min<int64_t>(
      batch, std::max(1u, std::thread::hardware_concurrency()));
  std::atomic<int64_t> next(0);

  auto worker = [&]() {
    int64_t i;
    while ((i = next.fetch_add(1)) < batch) {
      float* dst = out + i * sample_floats;
      int64_t n = std::min(lengths[i], capacity);
      const float* src = event_ptrs[i] + starts[i] * row_floats;
      if (n > 0) {
        std::memcpy(dst, src, static_cast<size_t>(n) * row_floats *
                                   sizeof(float));
      }
      if (n < capacity) {
        std::memset(dst + n * row_floats, 0,
                    static_cast<size_t>(capacity - n) * row_floats *
                        sizeof(float));
      }
      counts[i] = static_cast<int32_t>(n);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
