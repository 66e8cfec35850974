// Native frame loader: PNG decode (8/16-bit gray + RGB/RGBA -> gray) and a
// pthread batch decoder, exposed through a C ABI for ctypes.
//
// TPU-native replacement for the reference's per-frame cv2.imread
// (src/main.py:216-226 — OpenCV's C++ PNG decode behind the GIL). Decoding here
// runs fully outside the GIL (ctypes releases it for the call) and the batch
// API decodes a whole prefetch window with a thread pool, writing float32
// grayscale directly into caller-provided buffers ready for H2D transfer.
//
// Scope: 8/16-bit, greyscale/truecolor/indexed-free PNGs (color types 0, 2, 6),
// non-interlaced — covers KITTI and parking frames. Anything else returns an
// error and the Python side falls back to PIL (lcvo_tpu/data/native_loader.py).
//
// Build: see native/Makefile (g++ -O3 -shared, links zlib only).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  uint32_t len;
  char type[5];
  const uint8_t* data;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Luminance row writers: float32 keeps fractional RGB luminance; uint8 rounds
// to nearest (identical to f32-then-cast for the gray PNGs the datasets use,
// where the value is copied verbatim either way).
inline void store_px(float* row, int x, float v) { row[x] = v; }
inline void store_px(uint8_t* row, int x, float v) {
  row[x] = uint8_t(v + 0.5f);
}

// Decode a PNG byte stream into grayscale [0, 255] (float32 or uint8 output —
// uint8 quarters the H2D transfer for 8-bit sources).
// Returns 0 on success; negative error codes otherwise.
template <typename T>
int decode_png_gray(const uint8_t* buf, size_t n, T* out, int out_h,
                    int out_w) {
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (n < 8 || memcmp(buf, magic, 8) != 0) return -1;  // not a PNG

  size_t pos = 8;
  int W = 0, H = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= n) {
    Chunk c;
    c.len = be32(buf + pos);
    memcpy(c.type, buf + pos + 4, 4);
    c.type[4] = 0;
    c.data = buf + pos + 8;
    if (pos + 12 + c.len > n) return -2;  // truncated
    if (strcmp(c.type, "IHDR") == 0) {
      W = int(be32(c.data));
      H = int(be32(c.data + 4));
      bit_depth = c.data[8];
      color_type = c.data[9];
      interlace = c.data[12];
    } else if (strcmp(c.type, "IDAT") == 0) {
      idat.insert(idat.end(), c.data, c.data + c.len);
    } else if (strcmp(c.type, "IEND") == 0) {
      break;
    }
    pos += 12 + c.len;
  }
  if (W <= 0 || H <= 0) return -3;
  if (W != out_w || H != out_h) return -4;  // caller's buffer mismatch
  if (interlace != 0) return -5;            // Adam7 unsupported -> fallback
  if (bit_depth != 8 && bit_depth != 16) return -6;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // RGB
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // RGBA
    default: return -7;           // palette -> fallback
  }
  const int bypp = channels * (bit_depth / 8);
  const size_t stride = size_t(W) * bypp;
  std::vector<uint8_t> raw((stride + 1) * H);

  uLongf raw_len = uLongf(raw.size());
  int zrc = uncompress(raw.data(), &raw_len, idat.data(), uLong(idat.size()));
  if (zrc != Z_OK || raw_len != raw.size()) return -8;

  // de-filter in place scanline by scanline
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < H; ++y) {
    uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    const int filter = line[0];
    uint8_t* cur = line + 1;
    switch (filter) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t i = bypp; i < stride; ++i) cur[i] += cur[i - bypp];
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < size_t(bypp); ++i) cur[i] += prev[i] / 2;
        for (size_t i = bypp; i < stride; ++i)
          cur[i] += uint8_t((int(cur[i - bypp]) + int(prev[i])) / 2);
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < size_t(bypp); ++i)
          cur[i] += uint8_t(paeth(0, prev[i], 0));
        for (size_t i = bypp; i < stride; ++i)
          cur[i] += uint8_t(paeth(cur[i - bypp], prev[i], prev[i - bypp]));
        break;
      default:
        return -9;
    }
    memcpy(prev.data(), cur, stride);

    // luminance conversion straight into the caller's output buffer
    T* orow = out + size_t(y) * W;
    if (bit_depth == 8) {
      if (channels == 1) {
        for (int x = 0; x < W; ++x) orow[x] = T(cur[x]);
      } else if (channels == 2) {
        for (int x = 0; x < W; ++x) orow[x] = T(cur[x * 2]);
      } else {
        for (int x = 0; x < W; ++x) {
          const uint8_t* px = cur + x * channels;
          store_px(orow, x, 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2]);
        }
      }
    } else {  // 16-bit big-endian; keep 8 MSBs (matches PIL convert("L") scale)
      if (channels == 1) {
        for (int x = 0; x < W; ++x) orow[x] = T(cur[x * 2]);
      } else if (channels == 2) {
        for (int x = 0; x < W; ++x) orow[x] = T(cur[x * 4]);
      } else {
        for (int x = 0; x < W; ++x) {
          const uint8_t* px = cur + x * channels * 2;
          store_px(orow, x, 0.299f * px[0] + 0.587f * px[2] + 0.114f * px[4]);
        }
      }
    }
  }
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -20;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(f);
    return -21;
  }
  buf.resize(size_t(sz));
  size_t got = fread(buf.data(), 1, size_t(sz), f);
  fclose(f);
  return got == size_t(sz) ? 0 : -22;
}

template <typename T>
int decode_batch_t(const char** paths, int n, T* out, int h, int w,
                   int n_threads, int* rcs) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> bad(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      std::vector<uint8_t> buf;
      int rc = read_file(paths[i], buf);
      if (rc == 0)
        rc = decode_png_gray(buf.data(), buf.size(),
                             out + size_t(i) * h * w, h, w);
      rcs[i] = rc;
      if (rc != 0) bad.fetch_add(1);
    }
  };
  std::vector<std::thread> ts;
  int nt = n_threads < n ? n_threads : n;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return bad.load() == 0 ? 0 : -30;
}

}  // namespace

extern "C" {

// Probe a PNG's dimensions. Returns 0 and fills (h, w) on success.
int lcvo_png_shape(const char* path, int* h, int* w) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, buf);
  if (rc != 0) return rc;
  if (buf.size() < 24) return -1;
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (memcmp(buf.data(), magic, 8) != 0) return -1;
  *w = int(be32(buf.data() + 16));
  *h = int(be32(buf.data() + 20));
  return 0;
}

// Decode one PNG to float32 grayscale into out (h*w floats).
int lcvo_decode_png(const char* path, float* out, int h, int w) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, buf);
  if (rc != 0) return rc;
  return decode_png_gray(buf.data(), buf.size(), out, h, w);
}

// Decode one PNG to uint8 grayscale into out (h*w bytes) — the H2D-lean path
// (tunnel transfers cost ~25 ms/MB; u8 quarters the bytes of an 8-bit source).
int lcvo_decode_png_u8(const char* path, uint8_t* out, int h, int w) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, buf);
  if (rc != 0) return rc;
  return decode_png_gray(buf.data(), buf.size(), out, h, w);
}

// Decode a batch of PNGs with a thread pool into out (n*h*w floats, C order).
// rcs (n ints) receives the per-file return code. Returns 0 if all succeeded.
int lcvo_decode_batch(const char** paths, int n, float* out, int h, int w,
                      int n_threads, int* rcs) {
  return decode_batch_t(paths, n, out, h, w, n_threads, rcs);
}

// uint8 batch variant (see lcvo_decode_png_u8).
int lcvo_decode_batch_u8(const char** paths, int n, uint8_t* out, int h, int w,
                         int n_threads, int* rcs) {
  return decode_batch_t(paths, n, out, h, w, n_threads, rcs);
}

}  // extern "C"
