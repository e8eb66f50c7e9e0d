// cp2_tpu native data loader: threaded JPEG/PNG decode + bilinear resize.
//
// The reference leans on torch DataLoader worker processes (32 workers,
// main.py:70-71) for its input pipeline.  Here the host-side runtime is a
// C++ worker pool feeding fixed-size uint8 frames into a bounded ring of
// preallocated batch buffers — no Python in the decode path, no
// per-batch allocation, GIL touched only at the ctypes boundary.
//
// C API (ctypes-friendly):
//   void* cp2_loader_create(const char** paths, int n, int batch,
//                           int height, int width, int threads,
//                           unsigned seed, int shuffle, int drop_last);
//   void  cp2_loader_start_epoch(void*, int epoch);
//   int   cp2_loader_next(void*, unsigned char* out);  // 1 ok, 0 epoch end
//   int   cp2_loader_len(void*);                        // batches per epoch
//   void  cp2_loader_destroy(void*);
//
// Build: g++ -O3 -shared -fPIC -std=c++17 loader.cpp -o libcp2loader.so \
//        -ljpeg -lpng -lpthread

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->rgb.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const char* path, Image* out) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  out->h = image.height;
  out->w = image.width;
  out->rgb.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool decode_any(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rewind(f);
    bool ok = decode_jpeg(f, out);
    fclose(f);
    return ok;
  }
  fclose(f);
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    return decode_png(path.c_str(), out);
  }
  return false;
}

// bilinear resize (half-pixel centers) HWC uint8 -> fixed (H, W)
void resize_bilinear(const Image& src, uint8_t* dst, int dh, int dw) {
  const float sy = float(src.h) / dh;
  const float sx = float(src.w) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(int(fy), src.h - 1));
    int y1 = std::min(y0 + 1, src.h - 1);
    float wy = std::max(0.0f, std::min(fy - y0, 1.0f));
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(int(fx), src.w - 1));
      int x1 = std::min(x0 + 1, src.w - 1);
      float wx = std::max(0.0f, std::min(fx - x0, 1.0f));
      for (int c = 0; c < 3; ++c) {
        float top = src.rgb[(size_t(y0) * src.w + x0) * 3 + c] * (1 - wx) +
                    src.rgb[(size_t(y0) * src.w + x1) * 3 + c] * wx;
        float bot = src.rgb[(size_t(y1) * src.w + x0) * 3 + c] * (1 - wx) +
                    src.rgb[(size_t(y1) * src.w + x1) * 3 + c] * wx;
        dst[(size_t(y) * dw + x) * 3 + c] =
            uint8_t(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

struct Loader {
  std::vector<std::string> paths;
  int batch, height, width, threads, shuffle, drop_last;
  unsigned seed;

  std::vector<size_t> order;
  std::atomic<size_t> next_index{0};
  size_t epoch_batches = 0;

  // ring of ready batches
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::vector<uint8_t>> ready;
  size_t max_ready = 4;
  size_t produced = 0, consumed = 0;
  bool stopping = false;

  std::vector<std::thread> workers;

  size_t frame_bytes() const { return size_t(height) * width * 3; }

  void start_epoch(int epoch) {
    join_workers();
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    if (shuffle) {
      std::mt19937 rng(seed + unsigned(epoch));
      std::shuffle(order.begin(), order.end(), rng);
    }
    epoch_batches = drop_last ? paths.size() / batch
                              : (paths.size() + batch - 1) / batch;
    next_index = 0;
    produced = consumed = 0;
    stopping = false;
    while (!ready.empty()) ready.pop();
    int n = std::max(1, threads);
    for (int t = 0; t < n; ++t)
      workers.emplace_back([this] { worker_loop(); });
  }

  void worker_loop() {
    for (;;) {
      size_t b = next_index.fetch_add(1);
      if (b >= epoch_batches) return;
      std::vector<uint8_t> buf(size_t(batch) * frame_bytes());
      for (int i = 0; i < batch; ++i) {
        size_t idx = b * batch + i;
        if (idx >= order.size()) idx = order.size() - 1;  // pad last batch
        Image img;
        if (!decode_any(paths[order[idx]], &img) || img.h == 0) {
          memset(buf.data() + size_t(i) * frame_bytes(), 0, frame_bytes());
          continue;
        }
        resize_bilinear(img, buf.data() + size_t(i) * frame_bytes(), height,
                        width);
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_space.wait(lock,
                    [this] { return ready.size() < max_ready || stopping; });
      if (stopping) return;
      ready.push(std::move(buf));
      ++produced;
      cv_ready.notify_one();
    }
  }

  int next(uint8_t* out) {
    std::unique_lock<std::mutex> lock(mu);
    if (consumed >= epoch_batches) return 0;
    cv_ready.wait(lock, [this] { return !ready.empty(); });
    std::vector<uint8_t> buf = std::move(ready.front());
    ready.pop();
    ++consumed;
    cv_space.notify_one();
    lock.unlock();
    memcpy(out, buf.data(), buf.size());
    return 1;
  }

  void join_workers() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stopping = true;
      cv_space.notify_all();
    }
    for (auto& t : workers) t.join();
    workers.clear();
  }

  ~Loader() { join_workers(); }
};

}  // namespace

extern "C" {

void* cp2_loader_create(const char** paths, int n, int batch, int height,
                        int width, int threads, unsigned seed, int shuffle,
                        int drop_last) {
  auto* l = new Loader;
  l->paths.assign(paths, paths + n);
  l->batch = batch;
  l->height = height;
  l->width = width;
  l->threads = threads;
  l->seed = seed;
  l->shuffle = shuffle;
  l->drop_last = drop_last;
  return l;
}

void cp2_loader_start_epoch(void* handle, int epoch) {
  static_cast<Loader*>(handle)->start_epoch(epoch);
}

int cp2_loader_next(void* handle, unsigned char* out) {
  return static_cast<Loader*>(handle)->next(out);
}

int cp2_loader_len(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  return l->drop_last ? int(l->paths.size()) / l->batch
                      : int((l->paths.size() + l->batch - 1) / l->batch);
}

void cp2_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
