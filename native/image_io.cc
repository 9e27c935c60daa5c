// Native image decode for the TPU extraction pipeline.
//
// Decodes JPEG (libjpeg) / PNG (libpng) straight to I420 (YUV 4:2:0) planes
// at the patch-aligned target size — the exact byte layout the YUV420
// host->device transfer path ships (vit_colmap_tpu/ops/transfer.py).  The
// JPEG path never converts to RGB at all: libjpeg hands us full-range
// JFIF YCbCr, luma is resampled to the target grid and chroma is resampled
// directly to the half-res I420 grid (the 2x chroma downsample and the
// resize fuse into one pass).  Replaces the cv2 imread -> cvtColor ->
// resize -> I420 pack chain (reference loads via PIL/torchvision,
// /root/reference/vit_colmap/features/vit_extractor.py:700-727).
//
// Build: native/build.sh -> libvc_image_io.so; Python binding:
// vit_colmap_tpu/utils/native_io.py (ctypes).
//
// C ABI:
//   vc_probe(path, &w, &h)                    header-only size probe
//   vc_decode_i420(path, tw, th, out)         one image -> packed I420
//   vc_decode_batch_i420(paths, n, tw, th, out, n_threads)
// All return 0 on success.  out is (th * 3 / 2) * tw bytes per image,
// planes Y[th*tw], U[(th/2)*(tw/2)], V[...] — even th/tw required.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

// ------------------------------------------------------------------ resize
// Separable bilinear resample of a single plane (src W x H -> dst tw x th),
// pixel-center aligned (matches the cv2/jax.image half-pixel convention).
void resample_plane(const uint8_t* src, int sw, int sh, int sstride,
                    uint8_t* dst, int tw, int th, int dstride) {
  if (sw == tw && sh == th) {
    for (int y = 0; y < th; ++y)
      std::memcpy(dst + y * dstride, src + y * sstride, tw);
    return;
  }
  const float sx = static_cast<float>(sw) / tw;
  const float sy = static_cast<float>(sh) / th;
  std::vector<int> x0(tw), x1(tw);
  std::vector<float> fx(tw);
  for (int x = 0; x < tw; ++x) {
    float cx = (x + 0.5f) * sx - 0.5f;
    if (cx < 0) cx = 0;
    int ix = static_cast<int>(cx);
    if (ix > sw - 2) ix = sw - 2;
    if (ix < 0) ix = 0;
    x0[x] = ix;
    x1[x] = (sw > 1) ? ix + 1 : ix;
    fx[x] = cx - ix;
  }
  std::vector<float> row(tw);
  for (int y = 0; y < th; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    if (cy < 0) cy = 0;
    int iy = static_cast<int>(cy);
    if (iy > sh - 2) iy = sh - 2;
    if (iy < 0) iy = 0;
    float fy = cy - iy;
    const uint8_t* r0 = src + iy * sstride;
    const uint8_t* r1 = src + ((sh > 1) ? iy + 1 : iy) * sstride;
    uint8_t* out = dst + y * dstride;
    for (int x = 0; x < tw; ++x) {
      float a = r0[x0[x]] + (r0[x1[x]] - r0[x0[x]]) * fx[x];
      float b = r1[x0[x]] + (r1[x1[x]] - r1[x0[x]]) * fx[x];
      float v = a + (b - a) * fy;
      out[x] = static_cast<uint8_t>(v + 0.5f);
    }
  }
}

struct Planes {
  std::vector<uint8_t> y, cb, cr;  // full-res YCbCr (4:4:4), full range
  int w = 0, h = 0;
};

// --------------------------------------------------------------- jpeg path
struct JerrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JerrMgr* e = reinterpret_cast<JerrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Planes* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // Full-range JFIF YCbCr straight from the entropy decoder (no RGB pass);
  // grayscale stays grayscale and gets neutral chroma below.
  bool gray = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_YCbCr;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  int nc = cinfo.output_components;
  out->w = w;
  out->h = h;
  out->y.resize(static_cast<size_t>(w) * h);
  out->cb.assign(static_cast<size_t>(w) * h, 128);
  out->cr.assign(static_cast<size_t>(w) * h, 128);
  std::vector<uint8_t> row(static_cast<size_t>(w) * nc);
  uint8_t* rp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* yp = out->y.data() + static_cast<size_t>(y) * w;
    if (gray) {
      std::memcpy(yp, rp, w);
    } else {
      uint8_t* cbp = out->cb.data() + static_cast<size_t>(y) * w;
      uint8_t* crp = out->cr.data() + static_cast<size_t>(y) * w;
      for (int x = 0; x < w; ++x) {
        yp[x] = rp[x * 3];
        cbp[x] = rp[x * 3 + 1];
        crp[x] = rp[x * 3 + 2];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool probe_jpeg(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JerrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------- png path
bool decode_png(const char* path, Planes* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t sig[8];
  if (std::fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    std::fclose(f);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int nc = png_get_channels(png, info);
  if (nc != 1 && nc != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  std::vector<uint8_t> row(static_cast<size_t>(w) * nc);
  out->w = w;
  out->h = h;
  out->y.resize(static_cast<size_t>(w) * h);
  out->cb.assign(static_cast<size_t>(w) * h, 128);
  out->cr.assign(static_cast<size_t>(w) * h, 128);
  for (int y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    uint8_t* yp = out->y.data() + static_cast<size_t>(y) * w;
    if (nc == 1) {
      std::memcpy(yp, row.data(), w);
    } else {
      uint8_t* cbp = out->cb.data() + static_cast<size_t>(y) * w;
      uint8_t* crp = out->cr.data() + static_cast<size_t>(y) * w;
      for (int x = 0; x < w; ++x) {
        // JFIF full-range BT.601 (matches the JPEG path and the device
        // inverse in ops/transfer.py unpack_yuv420(full_range=True)).
        float r = row[x * 3], g = row[x * 3 + 1], b = row[x * 3 + 2];
        float Y = 0.299f * r + 0.587f * g + 0.114f * b;
        float Cb = -0.168736f * r - 0.331264f * g + 0.5f * b + 128.0f;
        float Cr = 0.5f * r - 0.418688f * g - 0.081312f * b + 128.0f;
        yp[x] = static_cast<uint8_t>(Y < 0 ? 0 : (Y > 255 ? 255 : Y + 0.5f));
        cbp[x] =
            static_cast<uint8_t>(Cb < 0 ? 0 : (Cb > 255 ? 255 : Cb + 0.5f));
        crp[x] =
            static_cast<uint8_t>(Cr < 0 ? 0 : (Cr > 255 ? 255 : Cr + 0.5f));
      }
    }
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

bool probe_png(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t sig[8];
  if (std::fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    std::fclose(f);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return true;
}

bool is_png(const char* path) {
  const char* dot = std::strrchr(path, '.');
  if (!dot) return false;
  std::string ext(dot + 1);
  for (auto& c : ext) c = static_cast<char>(std::tolower(c));
  return ext == "png";
}

int decode_one(const char* path, int tw, int th, uint8_t* out) {
  if (tw <= 0 || th <= 0 || (tw & 1) || (th & 1)) return 2;
  Planes p;
  bool ok = is_png(path) ? decode_png(path, &p) : decode_jpeg(path, &p);
  if (!ok) return 1;
  const int cw = tw / 2, ch = th / 2;
  uint8_t* yp = out;
  uint8_t* up = out + static_cast<size_t>(tw) * th;
  uint8_t* vp = up + static_cast<size_t>(cw) * ch;
  resample_plane(p.y.data(), p.w, p.h, p.w, yp, tw, th, tw);
  // Chroma: full-res -> half-res target in ONE resample (fuses the 4:2:0
  // subsample with the resize).
  resample_plane(p.cb.data(), p.w, p.h, p.w, up, cw, ch, cw);
  resample_plane(p.cr.data(), p.w, p.h, p.w, vp, cw, ch, cw);
  return 0;
}

}  // namespace

extern "C" {

int vc_probe(const char* path, int* w, int* h) {
  if (is_png(path) ? probe_png(path, w, h) : probe_jpeg(path, w, h)) return 0;
  // Wrong-extension fallback: try the other decoder.
  if (is_png(path) ? probe_jpeg(path, w, h) : probe_png(path, w, h)) return 0;
  return 1;
}

int vc_decode_i420(const char* path, int tw, int th, uint8_t* out) {
  return decode_one(path, tw, th, out);
}

// out: n contiguous images, each (th*3/2)*tw bytes.  status: n ints.
int vc_decode_batch_i420(const char** paths, int n, int tw, int th,
                         uint8_t* out, int* status, int n_threads) {
  if (n <= 0) return 0;
  const size_t per = static_cast<size_t>(tw) * th * 3 / 2;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next{0};
  std::atomic<int> bad{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = decode_one(paths[i], tw, th, out + per * i);
      if (status[i]) bad.fetch_add(1);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    ts.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  return bad.load();
}

}  // extern "C"
