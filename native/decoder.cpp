// Native batch image decoder for the input pipeline.
//
// The host half of the data loader: a persistent thread pool that
// decodes JPEG files (libjpeg) straight into a caller-provided
// (N, S, S, 3) uint8 tensor with fused bilinear resize — replacing the
// reference's synchronous per-image PIL decode inside its training hot
// loop (reference: deep_insight_face/datagen/generator.py:163-180,
// common/utils.py:47-70). Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC decoder.cpp -ljpeg -lpthread
//        -o libdif_decoder.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ---------------------------------------------------------------------------
// JPEG decode (with error-jump instead of exit)
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB. Returns true on success; the pixel buffer
// and dims are returned through the out params.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* pixels, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = *w * 3;
  pixels->resize(static_cast<size_t>(*h) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// bilinear resize (HWC uint8, half-pixel centers — cv2/PIL convention)
// ---------------------------------------------------------------------------

void ResizeBilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                    int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > sw - 2) x0 = sw - 2;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = p00 + 3;
      const uint8_t* p10 = p00 + static_cast<size_t>(sw) * 3;
      const uint8_t* p11 = p10 + 3;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] * (1 - wx) + p01[c] * wx;
        float bot = p10[c] * (1 - wx) + p11[c] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

ThreadPool* g_pool = nullptr;
std::mutex g_pool_mu;

ThreadPool* GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool) g_pool = new ThreadPool(n_threads > 0 ? n_threads : 8);
  return g_pool;
}

}  // namespace

extern "C" {

// Decode n JPEG files into out (n, size, size, 3) uint8. statuses[i] is 1
// on success, 0 on failure (the slot is zero-filled). Returns the number
// of successfully decoded images.
int dif_decode_batch(const char** paths, int n, int size, uint8_t* out,
                     int* statuses, int n_threads) {
  ThreadPool* pool = GetPool(n_threads);
  std::atomic<int> ok{0};
  std::atomic<int> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t img_bytes = static_cast<size_t>(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      std::vector<uint8_t> pixels;
      int w = 0, h = 0;
      uint8_t* dst = out + static_cast<size_t>(i) * img_bytes;
      bool success = DecodeJpeg(paths[i], &pixels, &w, &h) && w >= 2 && h >= 2;
      if (success) {
        ResizeBilinear(pixels.data(), w, h, dst, size, size);
        statuses[i] = 1;
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, img_bytes);
        statuses[i] = 0;
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return ok.load();
}

// Decode one file, returning its native dimensions without resize.
// Caller provides a buffer of max_bytes; returns needed byte count or -1.
int dif_decode_single(const char* path, uint8_t* out, int max_bytes, int* w,
                      int* h) {
  std::vector<uint8_t> pixels;
  if (!DecodeJpeg(path, &pixels, w, h)) return -1;
  int needed = static_cast<int>(pixels.size());
  if (needed <= max_bytes) std::memcpy(out, pixels.data(), needed);
  return needed;
}

int dif_version() { return 1; }
}
