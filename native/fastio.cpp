// fastio.cpp — native host-side kernels for the photometry_tpu runtime.
//
// The TPU owns all image *compute*; what remains host-bound is ingestion:
// hundreds of gzipped FITS frames per sector-CCD must be inflated,
// byteswapped from FITS big-endian, cropped to the science area and stacked
// into the cube store. The reference pipeline leans on C libraries for the
// same work (zlib via gzip, numpy byteswap, bottleneck moving medians);
// here they are fused, GIL-free and threaded so a loader thread pool can
// saturate storage while the device computes.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <limits>

#include <zlib.h>

#if defined(__has_include)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define PT_HAVE_LIBDEFLATE 1
#endif
#endif

namespace {

inline uint32_t bswap32(uint32_t v) {
#if defined(__GNUC__)
  return __builtin_bswap32(v);
#else
  return ((v & 0xFF000000u) >> 24) | ((v & 0x00FF0000u) >> 8) |
         ((v & 0x0000FF00u) << 8) | ((v & 0x000000FFu) << 24);
#endif
}

// Run fn(i) for i in [0, n) over a small thread pool.
template <typename F>
void parallel_for(int64_t n, F fn, int max_threads = 0) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nthreads = max_threads > 0 ? std::min(max_threads, hw) : hw;
  nthreads = std::max<int>(1, static_cast<int>(std::min<int64_t>(nthreads, n)));
  if (nthreads == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Byteswap n big-endian float32 values into native order.
void pt_bswap_f32(const uint32_t* in, float* out, int64_t n) {
  constexpr int64_t kChunk = 1 << 20;
  int64_t nchunks = (n + kChunk - 1) / kChunk;
  parallel_for(nchunks, [&](int64_t c) {
    int64_t lo = c * kChunk;
    int64_t hi = std::min(lo + kChunk, n);
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t v = bswap32(in[i]);
      std::memcpy(&out[i], &v, 4);
    }
  });
}

// Fused byteswap + 2-D crop: in is a big-endian (H, W) float32 image;
// out receives rows [r0, r1) x cols [c0, c1) in native order.
void pt_bswap_crop_f32(const uint32_t* in, int64_t H, int64_t W, int64_t r0,
                       int64_t r1, int64_t c0, int64_t c1, float* out) {
  (void)H;
  int64_t ow = c1 - c0;
  parallel_for(r1 - r0, [&](int64_t r) {
    const uint32_t* src = in + (r0 + r) * W + c0;
    float* dst = out + r * ow;
    for (int64_t c = 0; c < ow; ++c) {
      uint32_t v = bswap32(src[c]);
      std::memcpy(&dst[c], &v, 4);
    }
  });
}

// Centred moving median over axis 0 of a (T, P) array, with shrinking edge
// windows (same semantics as utils.mathutils.moving_median_central). NaNs
// are ignored. Parallel over pixels.
void pt_moving_median_f32(const float* in, int64_t T, int64_t P, int window,
                          float* out) {
  int half = window / 2;
  parallel_for(P, [&](int64_t p) {
    std::vector<float> buf(window);
    for (int64_t t = 0; t < T; ++t) {
      int64_t lo = std::max<int64_t>(0, t - half);
      int64_t hi = std::min<int64_t>(T, t + half + 1);
      int m = 0;
      for (int64_t k = lo; k < hi; ++k) {
        float v = in[k * P + p];
        if (v == v) buf[m++] = v;  // skip NaN
      }
      if (m == 0) {
        out[t * P + p] = std::numeric_limits<float>::quiet_NaN();
        continue;
      }
      int mid = m / 2;
      std::nth_element(buf.begin(), buf.begin() + mid, buf.begin() + m);
      float med = buf[mid];
      if (m % 2 == 0) {
        float lo_v = *std::max_element(buf.begin(), buf.begin() + mid);
        med = 0.5f * (med + lo_v);
      }
      out[t * P + p] = med;
    }
  });
}

// Inflate a gzip stream, decoding ALL members of a multi-member file
// (pigz/bgzip and appended streams produce these; gzip.open decodes them
// fully, so we must too). Returns the total decompressed size, or -1 on
// error / insufficient capacity / trailing garbage.
// Returns: >= 0 decompressed size; -2 output buffer too small (retryable);
// -1 corrupt/invalid input (NOT retryable — a bigger buffer cannot help).
// out_cap is clamped to what zlib's 32-bit uInt window can express; the
// caller retries with a larger buffer and receives -2 again until its own
// capacity stops growing (previously a >=4 GiB cap silently truncated).
int64_t pt_gunzip(const uint8_t* in, int64_t in_n, uint8_t* out,
                  int64_t out_cap) {
  const int64_t kMaxWindow = 0x7FFFF000LL;  // < UINT32_MAX, zlib-safe
  if (out_cap > kMaxWindow) out_cap = kMaxWindow;
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return -1;
  zs.next_in = const_cast<Bytef*>(in);
  zs.avail_in = static_cast<uInt>(in_n);
  zs.next_out = out;
  zs.avail_out = static_cast<uInt>(out_cap);
  int64_t produced = -1;
  int64_t total = 0;
  for (;;) {
    int ret = inflate(&zs, Z_FINISH);
    total += static_cast<int64_t>(zs.total_out);
    if (ret == Z_BUF_ERROR || (ret == Z_OK && zs.avail_out == 0)) {
      produced = -2;                 // out of capacity: retryable
      break;
    }
    if (ret != Z_STREAM_END) break;  // corrupt input: produced stays -1
    if (zs.avail_in == 0) {          // consumed the whole input: success
      produced = total;
      break;
    }
    // Another gzip member follows; reset (which zeroes total_out) and keep
    // inflating into the remaining output window.
    if (inflateReset(&zs) != Z_OK) break;
  }
  inflateEnd(&zs);
  return produced;
}

// Gzip-compress a whole buffer (the light-curve product writer's hot host
// loop: one ~230 KB FITS payload per target, >10k targets per sector-CCD
// drain).  libdeflate's compressor is ~3-4x faster than zlib at comparable
// ratios and writes a fixed MTIME=0 header, so products are byte-
// reproducible.  level is the libdeflate effort (1..12).
// Returns: >= 0 compressed size; -2 out_cap too small (retryable);
// -1 unavailable (built without libdeflate) or error.
int64_t pt_gzip(const uint8_t* in, int64_t in_n, uint8_t* out,
                int64_t out_cap, int level) {
#ifdef PT_HAVE_LIBDEFLATE
  if (level < 1) level = 1;
  if (level > 12) level = 12;
  struct libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  if (!c) return -1;
  size_t n = libdeflate_gzip_compress(c, in, static_cast<size_t>(in_n), out,
                                      static_cast<size_t>(out_cap));
  libdeflate_free_compressor(c);
  if (n == 0) return -2;
  return static_cast<int64_t>(n);
#else
  (void)in; (void)in_n; (void)out; (void)out_cap; (void)level;
  return -1;
#endif
}

int pt_version() { return 2; }

}  // extern "C"
