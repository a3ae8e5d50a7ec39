// Native batch image loader: decode (JPEG/PNG) -> PIL-compatible nearest
// resize -> per-encoder preprocessing (Keras 'caffe' BGR mean-subtract for
// vgg/resnet, or inception's RGB [-1,1] scaling), threaded.
//
// TPU-native equivalent of the reference's PIL-per-image Python loop
// (models/preprocessors.py:27-42 ImagePreprocessor.preprocess_images): the
// input pipeline is the only host-side hot loop in the framework, so it runs
// as a C++ thread pool writing straight into the caller's float32 batch
// buffer (see lrp_imagecaptioning_tpu/data/loader_native.py for the ctypes
// binding).
//
// ABI:
//   int load_batch(const char** paths, int n, float* out, int size,
//                  int mode, int n_threads)
//     out must hold n*size*size*3 floats. mode 0 = caffe (BGR, ImageNet
//     mean-subtracted — vgg16/19, resnet50/101); mode 1 = inception
//     (RGB, x/127.5 - 1). Returns 0 on success or (i+1) where i is the
//     first failed image; -1 on invalid size/mode.
//   int load_batch_vgg(const char** paths, int n, float* out, int n_threads)
//     back-compat wrapper for load_batch(..., 224, 0, ...).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

constexpr float kMeanB = 103.939f, kMeanG = 116.779f, kMeanR = 123.68f;
enum Mode { kCaffe = 0, kInception = 1 };

struct Image {
  std::vector<uint8_t> rgb;  // h*w*3
  int w = 0, h = 0;
};

// ---- JPEG ----------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/CMYK -> RGB like PIL convert
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->rgb.resize(size_t(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() + size_t(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---- PNG -----------------------------------------------------------------

bool decode_png(FILE* f, Image* img) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // normalize every variant to 8-bit RGB (palette/gray/16-bit/alpha)
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->rgb.resize(size_t(img->w) * img->h * 3);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y)
    rows[y] = img->rgb.data() + size_t(y) * img->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---- pipeline ------------------------------------------------------------

bool load_one(const char* path, float* out, int size, int mode) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  Image img;
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, &img);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, &img);
  }
  fclose(f);
  if (!ok || img.w <= 0 || img.h <= 0) return false;

  // nearest resize with PIL-compatible center sampling:
  // src = floor((dst + 0.5) * scale)   (PIL Image.NEAREST)
  const float sx = float(img.w) / size, sy = float(img.h) / size;
  for (int y = 0; y < size; ++y) {
    int src_y = int((y + 0.5f) * sy);
    if (src_y >= img.h) src_y = img.h - 1;
    const uint8_t* src_row = img.rgb.data() + size_t(src_y) * img.w * 3;
    float* dst_row = out + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      int src_x = int((x + 0.5f) * sx);
      if (src_x >= img.w) src_x = img.w - 1;
      const uint8_t* p = src_row + size_t(src_x) * 3;
      if (mode == kCaffe) {
        // RGB -> BGR + mean subtract (keras 'caffe' preprocess_input)
        dst_row[x * 3 + 0] = float(p[2]) - kMeanB;
        dst_row[x * 3 + 1] = float(p[1]) - kMeanG;
        dst_row[x * 3 + 2] = float(p[0]) - kMeanR;
      } else {
        // keras inception preprocess_input: RGB 0..255 -> [-1, 1]
        dst_row[x * 3 + 0] = float(p[0]) / 127.5f - 1.0f;
        dst_row[x * 3 + 1] = float(p[1]) / 127.5f - 1.0f;
        dst_row[x * 3 + 2] = float(p[2]) / 127.5f - 1.0f;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" int load_batch(const char** paths, int n, float* out, int size,
                          int mode, int num_threads) {
  if (size <= 0 || (mode != kCaffe && mode != kInception)) return -1;
  if (n <= 0) return 0;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;
  std::atomic<int> next(0);
  std::atomic<int> failed(-1);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() >= 0) return;
      if (!load_one(paths[i], out + size_t(i) * size * size * 3, size, mode)) {
        int expect = -1;
        failed.compare_exchange_strong(expect, i);
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  int bad = failed.load();
  return bad >= 0 ? bad + 1 : 0;
}

extern "C" int load_batch_vgg(const char** paths, int n, float* out, int num_threads) {
  return load_batch(paths, n, out, 224, kCaffe, num_threads);
}
