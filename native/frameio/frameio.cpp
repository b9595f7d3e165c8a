// frameio: native RGB-D frame loading runtime for gradslam-tpu.
//
// Replaces the role torch's DataLoader machinery plays for the reference
// (SURVEY §2.3: host-side IO is the only "runtime" the reference has): a
// C++ thread-pool prefetcher that decodes PNG (libpng) / JPEG (libjpeg)
// images, resizes them (bilinear for color, nearest for depth), scales depth
// to meters, and hands float32 buffers to Python through a plain C ABI
// (consumed via ctypes — no pybind11 dependency).
//
// Build: native/build.sh  ->  libframeio.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;        // 1 or 3
  int bit_depth = 0;       // 8 or 16
  std::vector<uint8_t> data;  // row-major, native endianness for 16-bit
};

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // little-endian 16-bit
  png_read_update_info(png, info);

  bit_depth = png_get_bit_depth(png, info);
  color_type = png_get_color_type(png, info);
  int channels = png_get_channels(png, info);

  out->width = (int)w;
  out->height = (int)h;
  out->channels = channels;
  out->bit_depth = bit_depth;
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->channels = 3;
  out->bit_depth = 8;
  size_t rowbytes = (size_t)out->width * 3;
  out->data.resize(rowbytes * out->height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * rowbytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_image(const char* path, Image* out) {
  std::string p(path);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) return decode_jpeg(path, out);
  return decode_png(path, out);
}

// Bilinear resize of an 8-bit RGB image into float32 [0, 255] (optionally /255).
void resize_color_bilinear(const Image& img, int H, int W, bool normalize,
                           float* out) {
  const float sy = (float)img.height / H;
  const float sx = (float)img.width / W;
  const float scale = normalize ? (1.0f / 255.0f) : 1.0f;
  const int c = img.channels >= 3 ? 3 : 1;
  for (int y = 0; y < H; y++) {
    // cv2.INTER_LINEAR-compatible sample positions.
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) y0 = 0, fy = 0;
    int y1 = y0 + 1 < img.height ? y0 + 1 : img.height - 1;
    float wy = fy - y0;
    for (int x = 0; x < W; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) x0 = 0, fx = 0;
      int x1 = x0 + 1 < img.width ? x0 + 1 : img.width - 1;
      float wx = fx - x0;
      for (int k = 0; k < 3; k++) {
        int kk = c == 1 ? 0 : k;
        float v00 = img.data[(y0 * img.width + x0) * img.channels + kk];
        float v01 = img.data[(y0 * img.width + x1) * img.channels + kk];
        float v10 = img.data[(y1 * img.width + x0) * img.channels + kk];
        float v11 = img.data[(y1 * img.width + x1) * img.channels + kk];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        out[(y * W + x) * 3 + k] = v * scale;
      }
    }
  }
}

// Nearest resize of a 16-bit (or 8-bit) depth image into float32 meters.
void resize_depth_nearest(const Image& img, int H, int W, float depth_scale,
                          float* out) {
  const float sy = (float)img.height / H;
  const float sx = (float)img.width / W;
  const float inv = 1.0f / depth_scale;
  const bool is16 = img.bit_depth == 16;
  const uint16_t* d16 = reinterpret_cast<const uint16_t*>(img.data.data());
  for (int y = 0; y < H; y++) {
    int sy_i = (int)(y * sy);
    if (sy_i >= img.height) sy_i = img.height - 1;
    for (int x = 0; x < W; x++) {
      int sx_i = (int)(x * sx);
      if (sx_i >= img.width) sx_i = img.width - 1;
      float v = is16 ? (float)d16[sy_i * img.width + sx_i]
                     : (float)img.data[sy_i * img.width + sx_i];
      out[y * W + x] = v * inv;
    }
  }
}

struct Task {
  int index;
  std::string color_path;
  std::string depth_path;
};

struct Result {
  int index = -1;
  bool ok = false;
  std::vector<float> rgb;    // (H, W, 3)
  std::vector<float> depth;  // (H, W, 1)
};

class Loader {
 public:
  Loader(int height, int width, float depth_scale, bool normalize_color,
         int num_threads)
      : height_(height),
        width_(width),
        depth_scale_(depth_scale),
        normalize_color_(normalize_color),
        stop_(false) {
    for (int i = 0; i < num_threads; i++)
      workers_.emplace_back([this] { worker(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_task_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(int index, const char* color_path, const char* depth_path) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push({index, color_path, depth_path});
    }
    cv_task_.notify_one();
  }

  // Blocks until the result for `index` is available; copies into out buffers.
  bool fetch(int index, float* rgb_out, float* depth_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [&] { return done_.count(index) > 0; });
    Result r = std::move(done_[index]);
    done_.erase(index);
    lk.unlock();
    if (!r.ok) return false;
    memcpy(rgb_out, r.rgb.data(), r.rgb.size() * sizeof(float));
    memcpy(depth_out, r.depth.data(), r.depth.size() * sizeof(float));
    return true;
  }

 private:
  void worker() {
    for (;;) {
      Task task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_task_.wait(lk, [&] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      Result r;
      r.index = task.index;
      r.rgb.resize((size_t)height_ * width_ * 3);
      r.depth.resize((size_t)height_ * width_);
      Image color, depth;
      r.ok = decode_image(task.color_path.c_str(), &color) &&
             decode_image(task.depth_path.c_str(), &depth);
      if (r.ok) {
        resize_color_bilinear(color, height_, width_, normalize_color_,
                              r.rgb.data());
        resize_depth_nearest(depth, height_, width_, depth_scale_,
                             r.depth.data());
      }
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_[task.index] = std::move(r);
      }
      cv_done_.notify_all();
    }
  }

  int height_, width_;
  float depth_scale_;
  bool normalize_color_;
  bool stop_;
  std::vector<std::thread> workers_;
  std::queue<Task> tasks_;
  std::map<int, Result> done_;
  std::mutex mu_;
  std::condition_variable cv_task_;
  std::condition_variable cv_done_;
};

}  // namespace

extern "C" {

void* frameio_loader_create(int height, int width, float depth_scale,
                            int normalize_color, int num_threads) {
  return new Loader(height, width, depth_scale, normalize_color != 0,
                    num_threads > 0 ? num_threads : 4);
}

void frameio_loader_destroy(void* loader) { delete (Loader*)loader; }

void frameio_loader_submit(void* loader, int index, const char* color_path,
                           const char* depth_path) {
  ((Loader*)loader)->submit(index, color_path, depth_path);
}

int frameio_loader_fetch(void* loader, int index, float* rgb_out,
                         float* depth_out) {
  return ((Loader*)loader)->fetch(index, rgb_out, depth_out) ? 1 : 0;
}

// One-shot synchronous decode helpers (no thread pool).
int frameio_decode_color(const char* path, int height, int width,
                         int normalize, float* out) {
  Image img;
  if (!decode_image(path, &img)) return 0;
  resize_color_bilinear(img, height, width, normalize != 0, out);
  return 1;
}

int frameio_decode_depth(const char* path, int height, int width,
                         float depth_scale, float* out) {
  Image img;
  if (!decode_image(path, &img)) return 0;
  resize_depth_nearest(img, height, width, depth_scale, out);
  return 1;
}

}  // extern "C"
