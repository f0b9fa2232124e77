// Threaded trajectory slicer: host-side data preparation for training.
//
// Builds the stacked (history, future) slice arrays consumed by the
// training pipeline (see dair_pll_tpu/data/management.py) from a set of
// variable-length trajectories. At the reference's default population
// (n_pop = 16384 trajectories, dataset_generation.py:36) this produces
// millions of overlapping windows; doing the window gather in native
// threads keeps host prep off the training critical path.
//
// C ABI (called from Python via ctypes — see dair_pll_tpu/data/native.py):
//
//   int64_t slice_count(const int64_t* lengths, int64_t n_traj,
//                       int64_t t_skip, int64_t t_history,
//                       int64_t t_prediction);
//
//   void slice_trajectories(const float* data, const int64_t* offsets,
//                           const int64_t* lengths, int64_t n_traj,
//                           int64_t n_x, int64_t t_skip,
//                           int64_t t_history, int64_t t_prediction,
//                           float* past_out, float* future_out,
//                           int64_t n_threads);
//
// ``data`` is the row-major concatenation of all trajectories;
// ``offsets[i]`` is the starting row of trajectory i.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC, pthreads).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

int64_t slice_count(const int64_t* lengths, int64_t n_traj, int64_t t_skip,
                    int64_t t_history, int64_t t_prediction) {
  int64_t total = 0;
  for (int64_t i = 0; i < n_traj; ++i) {
    const int64_t usable = lengths[i] - t_prediction - t_skip;
    if (usable > 0) total += usable;
  }
  return total;
}

void slice_trajectories(const float* data, const int64_t* offsets,
                        const int64_t* lengths, int64_t n_traj, int64_t n_x,
                        int64_t t_skip, int64_t t_history,
                        int64_t t_prediction, float* past_out,
                        float* future_out, int64_t n_threads) {
  // Per-trajectory output offsets (prefix sum of slice counts).
  std::vector<int64_t> out_offsets(n_traj + 1, 0);
  for (int64_t i = 0; i < n_traj; ++i) {
    const int64_t usable = lengths[i] - t_prediction - t_skip;
    out_offsets[i + 1] = out_offsets[i] + (usable > 0 ? usable : 0);
  }

  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next_traj{0};
  const int64_t past_row = t_history * n_x;
  const int64_t future_row = t_prediction * n_x;

  auto worker = [&]() {
    for (;;) {
      const int64_t i = next_traj.fetch_add(1);
      if (i >= n_traj) return;
      const int64_t usable = lengths[i] - t_prediction - t_skip;
      if (usable <= 0) continue;
      const float* traj = data + offsets[i] * n_x;
      float* past = past_out + out_offsets[i] * past_row;
      float* future = future_out + out_offsets[i] * future_row;
      for (int64_t s = 0; s < usable; ++s) {
        const int64_t t = t_skip + s;  // predict-from index
        std::memcpy(past + s * past_row,
                    traj + (t - t_history + 1) * n_x,
                    sizeof(float) * past_row);
        std::memcpy(future + s * future_row, traj + (t + 1) * n_x,
                    sizeof(float) * future_row);
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_threads));
  for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
