// Native threaded stereo-frame loader: PNG decode + ordered prefetch.
//
// Capability parity: the reference's data path is native (Rust `image` crate
// PNG decode inside the frame loop — its I/O hot spot, SURVEY.md §3.1). This
// C++ loader decodes with libpng on a worker pool and delivers frames in
// sequence order through a bounded queue, so host I/O overlaps device
// compute without touching the Python GIL.
//
// C API (consumed from Python via ctypes, see rsvio_tpu/native/__init__.py):
//   handle = rsvio_loader_create(paths_l, paths_r, n, height, width,
//                                n_threads, depth)
//   idx    = rsvio_loader_next(handle, left_out, right_out)  // -1 = end
//   rsvio_loader_destroy(handle)
//
// Frames are delivered as float32 grayscale (H, W) buffers; RGB(A) inputs
// are converted with integer luma weights. Dimension mismatches against the
// declared (height, width) are reported as errors (-2).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> left;
  std::vector<float> right;
  bool ok = false;
};

// Decode one grayscale PNG into out (h*w floats). Returns false on error or
// dimension mismatch.
bool decode_png_gray(const std::string& path, int want_h, int want_w,
                     float* out) {
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  const int color = png_get_color_type(png, info);
  const int depth = png_get_bit_depth(png, info);
  if (h != want_h || w != want_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_byte> row(rowbytes);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + static_cast<size_t>(y) * w;
    if (channels == 1) {
      for (int x = 0; x < w; ++x) dst[x] = static_cast<float>(row[x]);
    } else {
      for (int x = 0; x < w; ++x) {
        const png_byte* p = &row[static_cast<size_t>(x) * channels];
        // ITU-R BT.601 integer luma
        dst[x] = static_cast<float>((299 * p[0] + 587 * p[1] + 114 * p[2]) /
                                    1000);
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

struct Loader {
  std::vector<std::string> left_paths;
  std::vector<std::string> right_paths;
  int height = 0, width = 0, depth = 4;
  std::atomic<int> next_job{0};
  int next_deliver = 0;
  std::map<int, Frame> ready;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for next_deliver
  std::condition_variable cv_space;   // workers wait for queue space
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    const size_t npx = static_cast<size_t>(height) * width;
    while (!stop.load()) {
      const int i = next_job.fetch_add(1);
      if (i >= static_cast<int>(left_paths.size())) break;
      Frame f;
      f.left.resize(npx);
      f.right.resize(npx);
      f.ok = decode_png_gray(left_paths[i], height, width, f.left.data()) &&
             decode_png_gray(right_paths[i], height, width, f.right.data());
      std::unique_lock<std::mutex> lk(mu);
      // Bounded lookahead: frame i may enter the queue only once the
      // consumer is within `depth` frames of it.
      cv_space.wait(lk, [&] { return stop.load() || i < next_deliver + depth; });
      if (stop.load()) break;
      ready.emplace(i, std::move(f));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* rsvio_loader_create(const char** left, const char** right, int n,
                          int height, int width, int n_threads, int depth) {
  auto* L = new Loader();
  L->left_paths.assign(left, left + n);
  L->right_paths.assign(right, right + n);
  L->height = height;
  L->width = width;
  L->depth = depth > 0 ? depth : 4;
  const int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocks until the next in-order frame is decoded; copies it into the
// caller-provided buffers. Returns the frame index, -1 at end of sequence,
// -2 on decode error for that frame.
int rsvio_loader_next(void* handle, float* left_out, float* right_out) {
  auto* L = static_cast<Loader*>(handle);
  if (L->next_deliver >= static_cast<int>(L->left_paths.size())) return -1;
  std::unique_lock<std::mutex> lk(L->mu);
  const int want = L->next_deliver;
  L->cv_ready.wait(lk, [&] { return L->ready.count(want) > 0; });
  Frame f = std::move(L->ready[want]);
  L->ready.erase(want);
  L->next_deliver++;
  L->cv_space.notify_all();
  lk.unlock();
  if (!f.ok) return -2;
  const size_t npx = static_cast<size_t>(L->height) * L->width;
  std::memcpy(left_out, f.left.data(), npx * sizeof(float));
  std::memcpy(right_out, f.right.data(), npx * sizeof(float));
  return want;
}

void rsvio_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  delete L;
}

}  // extern "C"
