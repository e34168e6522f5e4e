// Native dataset-loading runtime: image decode + threaded prefetch.
//
// The reference's data path is C++ end to end — ROS image transport decodes
// frames and cv_bridge/cvtColor produce the 8-bit grayscale the tracker
// consumes (`ros/src/MonoNode.cc:38-53`, `Tracking.cc:173-276`); depth
// arrives as 16-bit images scaled by `depth_map_factor`
// (`Tracking.cc:151-157`). This module is the TPU engine's equivalent: it
// decodes PNG (libpng) and PGM/PPM files straight into the WIRE FORMAT the
// device program ingests (u8 grayscale; u16 millimetre depth or u8 right
// image), and a worker-thread pool prefetches upcoming frames into a ring of
// reusable slots so decode overlaps device compute. Grayscale conversion
// uses OpenCV's fixed-point BT.601 weights so outputs are bit-exact with the
// reference's cvtColor path.
//
// Exposed via ctypes (no pybind11 in this image); see native/__init__.py.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

namespace {

// OpenCV's RGB->gray fixed-point coefficients (BT.601, 15-bit):
// gray = (9798*R + 19235*G + 3735*B + 16384) >> 15 — bit-exact with
// cv::cvtColor(CV_RGB2GRAY) / cv::imread(IMREAD_GRAYSCALE), the conversion
// the reference applies per frame (Tracking.cc:173-276).
inline uint8_t rgb2gray(unsigned r, unsigned g, unsigned b) {
  return static_cast<uint8_t>((9798u * r + 19235u * g + 3735u * b + 16384u)
                              >> 15);
}

struct Image {
  int w = 0, h = 0;
  int channels = 0;   // 1 or 3
  int bit_depth = 0;  // 8 or 16
  std::vector<uint16_t> px;  // row-major, channel-interleaved, native-endian
};

bool decode_png(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  png_byte sig[8];
  if (std::fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8) != 0) {
    std::fclose(f);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 w, h;
  int depth, color;
  png_get_IHDR(png, info, &w, &h, &depth, &color, nullptr, nullptr, nullptr);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (depth == 16) png_set_swap(png);  // PNG is big-endian; we want native LE
  png_read_update_info(png, info);
  depth = png_get_bit_depth(png, info);
  int ch = png_get_channels(png, info);
  if ((ch != 1 && ch != 3) || (depth != 8 && depth != 16)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return false;
  }
  out->w = static_cast<int>(w);
  out->h = static_cast<int>(h);
  out->channels = ch;
  out->bit_depth = depth;
  const size_t n = static_cast<size_t>(w) * h * ch;
  std::vector<png_bytep> rows(h);
  if (depth == 16) {
    out->px.resize(n);
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out->px.data() + (size_t)y * w * ch);
  } else {
    out->px.resize((n + 1) / 2);  // reuse as byte storage
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out->px.data()) + (size_t)y * w * ch;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  if (depth == 8) {  // widen bytes into the uint16 buffer, back to front
    const uint8_t* src = reinterpret_cast<uint8_t*>(out->px.data());
    std::vector<uint16_t> wide(n);
    for (size_t i = 0; i < n; ++i) wide[i] = src[i];
    out->px = std::move(wide);
  }
  return true;
}

// Minimal binary PGM (P5) / PPM (P6) reader, 8- or 16-bit (big-endian 16).
bool decode_pnm(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto token = [&]() -> long {
    int c;
    do {
      c = std::fgetc(f);
      if (c == '#') {  // comment to end of line
        while (c != '\n' && c != EOF) c = std::fgetc(f);
      }
    } while (c == ' ' || c == '\t' || c == '\n' || c == '\r');
    long v = 0;
    bool any = false;
    while (c >= '0' && c <= '9') {
      v = v * 10 + (c - '0');
      any = true;
      c = std::fgetc(f);
    }
    return any ? v : -1;
  };
  int m0 = std::fgetc(f), m1 = std::fgetc(f);
  if (m0 != 'P' || (m1 != '5' && m1 != '6')) {
    std::fclose(f);
    return false;
  }
  const int ch = (m1 == '6') ? 3 : 1;
  long w = token(), h = token(), maxval = token();
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) {
    std::fclose(f);
    return false;
  }
  const int depth = maxval > 255 ? 16 : 8;
  const size_t n = static_cast<size_t>(w) * h * ch;
  out->w = (int)w;
  out->h = (int)h;
  out->channels = ch;
  out->bit_depth = depth;
  out->px.resize(n);
  if (depth == 8) {
    std::vector<uint8_t> buf(n);
    if (std::fread(buf.data(), 1, n, f) != n) {
      std::fclose(f);
      return false;
    }
    for (size_t i = 0; i < n; ++i) out->px[i] = buf[i];
  } else {
    std::vector<uint8_t> buf(n * 2);
    if (std::fread(buf.data(), 1, n * 2, f) != n * 2) {
      std::fclose(f);
      return false;
    }
    for (size_t i = 0; i < n; ++i)
      out->px[i] = static_cast<uint16_t>((buf[2 * i] << 8) | buf[2 * i + 1]);
  }
  std::fclose(f);
  return true;
}

bool decode_any(const char* path, Image* out) {
  const char* dot = std::strrchr(path, '.');
  if (dot && (!std::strcmp(dot, ".pgm") || !std::strcmp(dot, ".ppm") ||
              !std::strcmp(dot, ".pnm")))
    return decode_pnm(path, out);
  return decode_png(path, out);
}

// Convert a decoded image to u8 grayscale wire format. 16-bit sources are
// divided by 257 (the exact 16->8 mapping for full-range data).
void to_gray8(const Image& im, uint8_t* out) {
  const size_t n = static_cast<size_t>(im.w) * im.h;
  if (im.channels == 1) {
    if (im.bit_depth == 8)
      for (size_t i = 0; i < n; ++i) out[i] = (uint8_t)im.px[i];
    else
      for (size_t i = 0; i < n; ++i) out[i] = (uint8_t)(im.px[i] / 257);
  } else {
    const int shift = im.bit_depth == 16 ? 8 : 0;
    for (size_t i = 0; i < n; ++i)
      out[i] = rgb2gray(im.px[3 * i] >> shift, im.px[3 * i + 1] >> shift,
                        im.px[3 * i + 2] >> shift);
  }
}

// Convert a decoded 16-bit depth image to u16 millimetres:
// mm = raw * 1000 / depth_factor, rounded (TUM factor 5000 -> mm = raw/5).
void to_depth_mm(const Image& im, double depth_factor, uint16_t* out) {
  const size_t n = static_cast<size_t>(im.w) * im.h;
  const double s = 1000.0 / depth_factor;
  for (size_t i = 0; i < n; ++i) {
    double mm = im.px[i] * s + 0.5;
    out[i] = mm >= 65535.0 ? 65535 : static_cast<uint16_t>(mm);
  }
}

// ---------------------------------------------------------------- prefetcher

constexpr int kModeMono = 0;    // aux unused
constexpr int kModeRGBD = 1;    // aux = 16-bit depth -> u16 mm
constexpr int kModeStereo = 2;  // aux = right image -> u8 gray

struct Slot {
  std::vector<uint8_t> gray;
  std::vector<uint8_t> aux;  // u8 gray or u16 mm (byte storage)
  int status = 0;            // 0 decoding/free, 1 ready, (-1) decode failed
  int index = -1;            // frame index occupying this slot; -1 = free
};

struct Loader {
  std::vector<std::string> paths_a, paths_b;
  int mode = kModeMono;
  int w = 0, h = 0;
  double depth_factor = 5000.0;
  std::vector<Slot> ring;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<int> next_fetch{0};    // next frame index a worker will claim
  std::atomic<int> next_deliver{0};  // next frame index the consumer takes
  bool stop = false;

  size_t gray_bytes() const { return (size_t)w * h; }
  size_t aux_bytes() const {
    return mode == kModeRGBD ? (size_t)w * h * 2
                             : (mode == kModeStereo ? (size_t)w * h : 0);
  }

  void work() {
    for (;;) {
      const int idx = next_fetch.fetch_add(1);
      if (idx >= static_cast<int>(paths_a.size())) return;
      Slot* slot = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        Slot& s = ring[idx % ring.size()];
        // Ordered claim: take the ring position only once it is free AND
        // every earlier frame mapping here has been consumed (idx within
        // one ring turn of the delivery cursor) — otherwise a worker
        // holding frame idx+cap could steal the slot frame idx needs.
        const int cap = static_cast<int>(ring.size());
        cv_free.wait(lk, [&] {
          return stop || (s.index == -1 && idx < next_deliver.load() + cap);
        });
        if (stop) return;
        s.index = idx;
        s.status = 0;
        slot = &s;
      }
      int ok = decode_into(idx, slot) ? 1 : -1;
      {
        std::lock_guard<std::mutex> lk(mu);
        slot->status = ok;
      }
      cv_ready.notify_all();
    }
  }

  bool decode_into(int idx, Slot* s) {
    Image im;
    if (!decode_any(paths_a[idx].c_str(), &im) || im.w != w || im.h != h)
      return false;
    s->gray.resize(gray_bytes());
    to_gray8(im, s->gray.data());
    if (mode == kModeMono) return true;
    Image aux;
    if (!decode_any(paths_b[idx].c_str(), &aux) || aux.w != w || aux.h != h)
      return false;
    s->aux.resize(aux_bytes());
    if (mode == kModeRGBD) {
      if (aux.channels != 1) return false;
      to_depth_mm(aux, depth_factor,
                  reinterpret_cast<uint16_t*>(s->aux.data()));
    } else {
      to_gray8(aux, s->aux.data());
    }
    return true;
  }
};

}  // namespace

extern "C" {

// One-shot decode to u8 grayscale. Returns 0 and fills w/h on success (the
// caller passes capacity in *w * *h); -1 on failure.
int decode_gray8(const char* path, uint8_t* out, int* w, int* h) {
  Image im;
  if (!decode_any(path, &im)) return -1;
  if ((long)im.w * im.h > (long)(*w) * (*h)) return -1;
  to_gray8(im, out);
  *w = im.w;
  *h = im.h;
  return 0;
}

// One-shot decode of a 16-bit depth image to u16 millimetres.
int decode_depth_mm(const char* path, double depth_factor, uint16_t* out,
                    int* w, int* h) {
  Image im;
  if (!decode_any(path, &im) || im.channels != 1) return -1;
  if ((long)im.w * im.h > (long)(*w) * (*h)) return -1;
  to_depth_mm(im, depth_factor, out);
  *w = im.w;
  *h = im.h;
  return 0;
}

// Create a threaded prefetcher. paths_a/paths_b: '\n'-joined file lists
// (paths_b ignored for mode 0). Returns an opaque handle or null.
void* loader_create(const char* paths_a, const char* paths_b, int mode,
                    int w, int h, double depth_factor, int n_threads,
                    int ring_cap) {
  auto split = [](const char* s) {
    std::vector<std::string> out;
    if (!s) return out;
    const char* p = s;
    while (*p) {
      const char* e = std::strchr(p, '\n');
      if (!e) e = p + std::strlen(p);
      if (e > p) out.emplace_back(p, e - p);
      p = *e ? e + 1 : e;
    }
    return out;
  };
  auto* ld = new Loader;
  ld->paths_a = split(paths_a);
  ld->paths_b = split(paths_b);
  ld->mode = mode;
  ld->w = w;
  ld->h = h;
  ld->depth_factor = depth_factor;
  if (ld->paths_a.empty() ||
      (mode != kModeMono && ld->paths_b.size() != ld->paths_a.size())) {
    delete ld;
    return nullptr;
  }
  if (ring_cap < 2) ring_cap = 2;
  if (n_threads < 1) n_threads = 1;
  ld->ring.resize(ring_cap);
  for (int i = 0; i < n_threads; ++i)
    ld->workers.emplace_back([ld] { ld->work(); });
  return ld;
}

// Blocking ordered fetch of the next frame into caller buffers (gray: w*h
// bytes; aux: w*h u16 for RGB-D, w*h u8 for stereo, ignored for mono).
// Returns the frame index, -1 at end of stream, -2 on decode failure.
int loader_next(void* handle, uint8_t* gray, uint8_t* aux) {
  auto* ld = static_cast<Loader*>(handle);
  if (ld->next_deliver >= static_cast<int>(ld->paths_a.size())) return -1;
  const int idx = ld->next_deliver++;
  Slot& s = ld->ring[idx % ld->ring.size()];
  int st;
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->cv_ready.wait(lk, [&] { return s.index == idx && s.status != 0; });
    st = s.status;
    if (st == 1) {
      std::memcpy(gray, s.gray.data(), ld->gray_bytes());
      if (ld->aux_bytes() && aux) std::memcpy(aux, s.aux.data(),
                                              ld->aux_bytes());
    }
    s.status = 0;  // free the ring position for index idx + ring_cap
    s.index = -1;
  }
  ld->cv_free.notify_all();
  return st == 1 ? idx : -2;
}

void loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stop = true;
    ld->next_fetch.store(static_cast<int>(ld->paths_a.size()));
  }
  ld->cv_free.notify_all();
  ld->cv_ready.notify_all();
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
