// Native host data loader: threaded JPEG decode + resize + center-crop +
// CLIP normalization, producing NHWC float32 batches.
//
// TPU-native equivalent of the reference's host input pipeline (PIL +
// torchvision transforms in torch DataLoader workers,
// data/component/combine_image_dataset.py:97-117).  At the target
// throughput (>=8k images/sec/chip) Python/PIL decode is the host
// bottleneck; this library decodes with libjpeg directly and fans out over
// a std::thread pool, exposed to Python via ctypes (no pybind11 in this
// environment).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC, links -ljpeg).

#include <cstddef>
#include <cstdio>
// jpeglib.h requires stdio/stddef declared first
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to RGB8. Returns true on success.
bool DecodeJpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(size_t(*width) * (*height) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * (*width) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear sample at (fy, fx) from RGB8 image.
inline void SampleBilinear(const uint8_t* img, int w, int h, float fy, float fx,
                           float* rgb) {
  fx = std::min(std::max(fx, 0.0f), float(w - 1));
  fy = std::min(std::max(fy, 0.0f), float(h - 1));
  int x0 = int(fx), y0 = int(fy);
  int x1 = std::min(x0 + 1, w - 1), y1 = std::min(y0 + 1, h - 1);
  float ax = fx - x0, ay = fy - y0;
  for (int c = 0; c < 3; ++c) {
    float v00 = img[(size_t(y0) * w + x0) * 3 + c];
    float v01 = img[(size_t(y0) * w + x1) * 3 + c];
    float v10 = img[(size_t(y1) * w + x0) * 3 + c];
    float v11 = img[(size_t(y1) * w + x1) * 3 + c];
    rgb[c] = (1 - ay) * ((1 - ax) * v00 + ax * v01) + ay * ((1 - ax) * v10 + ax * v11);
  }
}

// Area-average sample of the source box [y0,y1)x[x0,x1) (anti-aliased
// downscale, matching PIL's reduce+resample quality much closer than point
// sampling).
inline void SampleArea(const uint8_t* img, int w, int h, float y0, float y1,
                       float x0, float x1, float* rgb) {
  x0 = std::max(x0, 0.0f); y0 = std::max(y0, 0.0f);
  x1 = std::min(x1, float(w)); y1 = std::min(y1, float(h));
  int iy0 = int(std::floor(y0)), iy1 = std::max(int(std::ceil(y1)), iy0 + 1);
  int ix0 = int(std::floor(x0)), ix1 = std::max(int(std::ceil(x1)), ix0 + 1);
  float acc[3] = {0, 0, 0};
  float wsum = 0.0f;
  for (int y = iy0; y < iy1 && y < h; ++y) {
    float wy = std::min(float(y + 1), y1) - std::max(float(y), y0);
    if (wy <= 0) continue;
    for (int x = ix0; x < ix1 && x < w; ++x) {
      float wx = std::min(float(x + 1), x1) - std::max(float(x), x0);
      if (wx <= 0) continue;
      float wt = wx * wy;
      const uint8_t* px = img + (size_t(y) * w + x) * 3;
      acc[0] += wt * px[0];
      acc[1] += wt * px[1];
      acc[2] += wt * px[2];
      wsum += wt;
    }
  }
  if (wsum <= 0) wsum = 1.0f;
  rgb[0] = acc[0] / wsum;
  rgb[1] = acc[1] / wsum;
  rgb[2] = acc[2] / wsum;
}

// resize shorter side to `size`, center crop `size`, normalize.
void ResizeCropNormalize(const uint8_t* img, int w, int h, int size,
                         const float* mean, const float* stdv, float* out) {
  float scale = (w <= h) ? float(size) / w : float(size) / h;
  float rw = w * scale, rh = h * scale;
  // center-crop window in resized coordinates
  float offx = (rw - size) / 2.0f, offy = (rh - size) / 2.0f;
  const bool downscale = scale < 1.0f;
  const float inv = 1.0f / scale;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      float rgb[3];
      if (downscale) {
        float sy0 = (y + offy) * inv, sx0 = (x + offx) * inv;
        SampleArea(img, w, h, sy0, sy0 + inv, sx0, sx0 + inv, rgb);
      } else {
        float src_y = (y + offy + 0.5f) * inv - 0.5f;
        float src_x = (x + offx + 0.5f) * inv - 0.5f;
        SampleBilinear(img, w, h, src_y, src_x, rgb);
      }
      float* px = out + (size_t(y) * size + x) * 3;
      for (int c = 0; c < 3; ++c) {
        px[c] = (rgb[c] / 255.0f - mean[c]) / stdv[c];
      }
    }
  }
}

// resize shorter side to `size`, center crop `size`, keep uint8 RGB.
// Used by the train path: RandAugment (host Python) needs pre-augment
// uint8 pixels, so normalization happens after augmentation there.
void ResizeCropU8(const uint8_t* img, int w, int h, int size, uint8_t* out) {
  float scale = (w <= h) ? float(size) / w : float(size) / h;
  float rw = w * scale, rh = h * scale;
  float offx = (rw - size) / 2.0f, offy = (rh - size) / 2.0f;
  const bool downscale = scale < 1.0f;
  const float inv = 1.0f / scale;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      float rgb[3];
      if (downscale) {
        float sy0 = (y + offy) * inv, sx0 = (x + offx) * inv;
        SampleArea(img, w, h, sy0, sy0 + inv, sx0, sx0 + inv, rgb);
      } else {
        float src_y = (y + offy + 0.5f) * inv - 0.5f;
        float src_x = (x + offx + 0.5f) * inv - 0.5f;
        SampleBilinear(img, w, h, src_y, src_x, rgb);
      }
      uint8_t* px = out + (size_t(y) * size + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = rgb[c] + 0.5f;
        px[c] = uint8_t(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one JPEG buffer -> uint8 RGB [size, size, 3] (resize shorter side
// + center crop, NO normalization). Returns 0 ok.
int dc_decode_raw_one(const uint8_t* jpeg_bytes, size_t len, int size,
                      uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!DecodeJpeg(jpeg_bytes, len, &rgb, &w, &h)) return 1;
  ResizeCropU8(rgb.data(), w, h, size, out);
  return 0;
}

// Decode one JPEG FILE -> uint8 RGB [size, size, 3]. Returns 0 ok.
int dc_decode_raw_file(const char* path, int size, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  // ftell failure (-1) would convert to a huge size_t below and throw; a
  // C++ exception must never cross the extern "C"/ctypes boundary (it
  // would terminate the loader process instead of hitting the PIL
  // fallback), so both the length check and the body are guarded.
  if (len <= 0) {
    fclose(f);
    return 1;
  }
  try {
    std::vector<uint8_t> buf(len);
    bool read_ok = fread(buf.data(), 1, len, f) == size_t(len);
    fclose(f);
    f = nullptr;
    if (!read_ok) return 1;
    return dc_decode_raw_one(buf.data(), len, size, out);
  } catch (...) {
    if (f) fclose(f);
    return 1;
  }
}

// Decode one JPEG buffer -> normalized [size, size, 3] float32. Returns 0 ok.
int dc_decode_one(const uint8_t* jpeg_bytes, size_t len, int size,
                  const float* mean, const float* stdv, float* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!DecodeJpeg(jpeg_bytes, len, &rgb, &w, &h)) return 1;
  ResizeCropNormalize(rgb.data(), w, h, size, mean, stdv, out);
  return 0;
}

// Decode a batch of JPEG FILES in parallel.
// paths: array of n C strings; out: [n, size, size, 3] float32.
// Returns number of failures (failed slots are zero-filled).
int dc_decode_batch_files(const char** paths, int n, int size,
                          const float* mean, const float* stdv, float* out,
                          int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t stride = size_t(size) * size * 3;
  auto work = [&]() {
    std::vector<uint8_t> filebuf;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      FILE* f = fopen(paths[i], "rb");
      bool ok = false;
      if (f) {
        fseek(f, 0, SEEK_END);
        long len = ftell(f);
        fseek(f, 0, SEEK_SET);
        // ftell failure (-1) -> huge size_t resize would throw in a worker
        // thread and terminate the process (see dc_decode_raw_file)
        if (len > 0) {
          filebuf.resize(len);
          if (fread(filebuf.data(), 1, len, f) == size_t(len)) {
            ok = dc_decode_one(filebuf.data(), len, size, mean, stdv,
                               out + stride * i) == 0;
          }
        }
        fclose(f);
      }
      if (!ok) {
        memset(out + stride * i, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  return failures.load();
}

// Decode a batch of in-memory JPEG buffers in parallel (webdataset path).
int dc_decode_batch_buffers(const uint8_t** bufs, const size_t* lens, int n,
                            int size, const float* mean, const float* stdv,
                            float* out, int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t stride = size_t(size) * size * 3;
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (dc_decode_one(bufs[i], lens[i], size, mean, stdv, out + stride * i) != 0) {
        memset(out + stride * i, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  return failures.load();
}

int dc_version() { return 1; }

}  // extern "C"
