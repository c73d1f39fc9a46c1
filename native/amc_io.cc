// amc_io — native host-side IO/layout kernels for the TPU AMC pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the
// host-side hot paths around it (the reference had no native code at all —
// SURVEY.md section 2 — so these replace its pure-Python IO):
//
//   * amc_planarize: interleaved complex64 frames -> planar I/Q float32
//     (the canonical device layout), multi-threaded. This is the per-batch
//     host cost on the ingestion path, where NumPy's strided stack copy is
//     the bottleneck.
//   * amc_deplanarize: planar -> interleaved (for .mat export).
//   * amc_read_stream_frames: GNU Radio complex64 capture -> framed planar
//     I/Q in one pass (read + deinterleave fused), replacing
//     old/read_binary_stream.py:46-75 of the reference.
//   * amc_standardize: fused (x - mean) / std over a feature matrix.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread amc_io.cc -o libamc_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(begin, end) over [0, n) split across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? static_cast<int64_t>(hw) : 1;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk < n ? begin + chunk : n;
    if (begin >= end) break;
    threads.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// interleaved (b, n) complex64 = (b, n, 2) f32  ->  planar (b, 2, n) f32
void amc_planarize(const float* interleaved, float* planar, int64_t b,
                   int64_t n) {
  parallel_for(b, [=](int64_t begin, int64_t end) {
    for (int64_t row = begin; row < end; ++row) {
      const float* src = interleaved + row * n * 2;
      float* dst_i = planar + row * 2 * n;
      float* dst_q = dst_i + n;
      for (int64_t k = 0; k < n; ++k) {
        dst_i[k] = src[2 * k];
        dst_q[k] = src[2 * k + 1];
      }
    }
  });
}

// planar (b, 2, n) f32 -> interleaved (b, n) complex64
void amc_deplanarize(const float* planar, float* interleaved, int64_t b,
                     int64_t n) {
  parallel_for(b, [=](int64_t begin, int64_t end) {
    for (int64_t row = begin; row < end; ++row) {
      const float* src_i = planar + row * 2 * n;
      const float* src_q = src_i + n;
      float* dst = interleaved + row * n * 2;
      for (int64_t k = 0; k < n; ++k) {
        dst[2 * k] = src_i[k];
        dst[2 * k + 1] = src_q[k];
      }
    }
  });
}

// Read a complex64 binary capture, skip `skip` complex samples, cut into
// frames of `frame_size`, write planar (frames, 2, frame_size) f32.
// Returns number of frames written, or -1 on IO error.
int64_t amc_read_stream_frames(const char* path, int64_t skip,
                               int64_t frame_size, int64_t max_frames,
                               float* planar_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, skip * 2 * static_cast<int64_t>(sizeof(float)),
                 SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  std::vector<float> buf(static_cast<size_t>(frame_size) * 2);
  int64_t frames = 0;
  while (frames < max_frames) {
    size_t got = std::fread(buf.data(), sizeof(float), buf.size(), f);
    if (got < buf.size()) break;  // drop ragged tail
    float* dst_i = planar_out + frames * 2 * frame_size;
    float* dst_q = dst_i + frame_size;
    for (int64_t k = 0; k < frame_size; ++k) {
      dst_i[k] = buf[2 * k];
      dst_q[k] = buf[2 * k + 1];
    }
    ++frames;
  }
  std::fclose(f);
  return frames;
}

// out = (x - mean) / std, row-major (rows, cols), mean/std per column.
void amc_standardize(const float* x, const float* mean, const float* std,
                     float* out, int64_t rows, int64_t cols) {
  parallel_for(rows, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const float* src = x + r * cols;
      float* dst = out + r * cols;
      for (int64_t c = 0; c < cols; ++c) {
        dst[c] = (src[c] - mean[c]) / std[c];
      }
    }
  });
}

}  // extern "C"
