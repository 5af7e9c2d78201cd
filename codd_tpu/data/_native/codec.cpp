// Native data-plane codecs for codd_tpu.
//
// The reference's data path runs in torch's C++ dataloader workers; this
// library is the TPU build's native equivalent: GIL-free decoding of the
// dataset formats (PFM, Middlebury .flo, PNG up to 16-bit RGBA) plus a
// thread-pool batch decoder, exposed through a plain C ABI consumed via
// ctypes (no pybind11 dependency).
//
// All decoders return freshly malloc'd float32 buffers in HWC layout with
// raw sample values (16-bit PNG samples keep their 0..65535 range — the
// python layer applies dataset-specific scaling such as KITTI's /256).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(n);
  bool ok = n == 0 || std::fread(out->data(), 1, n, f) == (size_t)n;
  std::fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// PFM
// ---------------------------------------------------------------------------

float* decode_pfm(const std::vector<uint8_t>& buf, int* h, int* w, int* c) {
  size_t pos = 0;
  auto read_line = [&](std::string* line) {
    line->clear();
    while (pos < buf.size() && buf[pos] != '\n') line->push_back(buf[pos++]);
    if (pos < buf.size()) pos++;  // consume newline
  };
  std::string header, dims, scale_s;
  read_line(&header);
  if (header != "PF" && header != "Pf") return nullptr;
  int channels = header == "PF" ? 3 : 1;
  read_line(&dims);
  int width, height;
  if (std::sscanf(dims.c_str(), "%d %d", &width, &height) != 2) return nullptr;
  read_line(&scale_s);
  double scale = std::atof(scale_s.c_str());
  bool little = scale < 0;
  size_t count = (size_t)width * height * channels;
  if (buf.size() - pos < count * 4) return nullptr;

  float* out = (float*)std::malloc(count * sizeof(float));
  const uint8_t* src = buf.data() + pos;
  // PFM rows are stored bottom-up; flip while copying
  for (int row = 0; row < height; row++) {
    const uint8_t* srow = src + (size_t)(height - 1 - row) * width * channels * 4;
    float* drow = out + (size_t)row * width * channels;
    if (little) {
      std::memcpy(drow, srow, (size_t)width * channels * 4);
    } else {
      for (int i = 0; i < width * channels; i++) {
        uint8_t b[4] = {srow[i * 4 + 3], srow[i * 4 + 2], srow[i * 4 + 1],
                        srow[i * 4]};
        std::memcpy(&drow[i], b, 4);
      }
    }
  }
  *h = height;
  *w = width;
  *c = channels;
  return out;
}

// ---------------------------------------------------------------------------
// Middlebury .flo
// ---------------------------------------------------------------------------

float* decode_flo(const std::vector<uint8_t>& buf, int* h, int* w, int* c) {
  if (buf.size() < 12) return nullptr;
  float magic;
  int32_t width, height;
  std::memcpy(&magic, buf.data(), 4);
  std::memcpy(&width, buf.data() + 4, 4);
  std::memcpy(&height, buf.data() + 8, 4);
  if (magic < 202021.24f || magic > 202021.26f) return nullptr;
  size_t count = (size_t)width * height * 2;
  if (buf.size() - 12 < count * 4) return nullptr;
  float* out = (float*)std::malloc(count * sizeof(float));
  std::memcpy(out, buf.data() + 12, count * 4);
  *h = height;
  *w = width;
  *c = 2;
  return out;
}

// ---------------------------------------------------------------------------
// PNG (non-interlaced, 8/16-bit, gray / gray+alpha / RGB / RGBA / palette-free)
// ---------------------------------------------------------------------------

inline uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}

int paeth(int a, int b, int cc) {
  int p = a + b - cc;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - cc);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return cc;
}

float* decode_png(const std::vector<uint8_t>& buf, int* out_h, int* out_w,
                  int* out_c) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (buf.size() < 8 || std::memcmp(buf.data(), sig, 8) != 0) return nullptr;

  uint32_t width = 0, height = 0;
  int bitdepth = 0, colortype = 0, interlace = 0;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    const uint8_t* type = &buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) break;
    if (!std::memcmp(type, "IHDR", 4)) {
      width = be32(data);
      height = be32(data + 4);
      bitdepth = data[8];
      colortype = data[9];
      interlace = data[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (!width || !height || interlace != 0) return nullptr;
  if (bitdepth != 8 && bitdepth != 16) return nullptr;
  int channels;
  switch (colortype) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return nullptr;      // palette unsupported
  }

  size_t bpp = (size_t)channels * bitdepth / 8;          // bytes per pixel
  size_t stride = (size_t)width * bpp;                   // bytes per row
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return nullptr;

  // unfilter in place into a contiguous pixel buffer
  std::vector<uint8_t> px(stride * height);
  for (uint32_t y = 0; y < height; y++) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &px[y * stride];
    const uint8_t* up = y ? &px[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int cc = (up && x >= bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, cc); break;
        default: return nullptr;
      }
      dst[x] = (uint8_t)v;
    }
  }

  float* out =
      (float*)std::malloc((size_t)width * height * channels * sizeof(float));
  size_t n = (size_t)width * height * channels;
  if (bitdepth == 8) {
    for (size_t i = 0; i < n; i++) out[i] = (float)px[i];
  } else {  // 16-bit samples are big-endian
    for (size_t i = 0; i < n; i++)
      out[i] = (float)(((uint16_t)px[2 * i] << 8) | px[2 * i + 1]);
  }
  *out_h = (int)height;
  *out_w = (int)width;
  *out_c = channels;
  return out;
}

float* decode_any(const char* path, int* h, int* w, int* c) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf) || buf.size() < 8) return nullptr;
  if (buf[0] == 'P' && (buf[1] == 'F' || buf[1] == 'f'))
    return decode_pfm(buf, h, w, c);
  if (buf[0] == 137 && buf[1] == 'P') return decode_png(buf, h, w, c);
  float magic;
  std::memcpy(&magic, buf.data(), 4);
  if (magic > 202021.24f && magic < 202021.26f) return decode_flo(buf, h, w, c);
  return nullptr;
}

}  // namespace

extern "C" {

float* codd_decode(const char* path, int* h, int* w, int* c) {
  return decode_any(path, h, w, c);
}

void codd_free(float* p) { std::free(p); }

// Threaded batch decode: fills outs/hs/ws/cs (arrays of length n); failed
// entries get nullptr.  Returns number of successes.
int codd_decode_batch(const char** paths, int n, float** outs, int* hs,
                      int* ws, int* cs, int num_threads) {
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      outs[i] = decode_any(paths[i], &hs[i], &ws[i], &cs[i]);
      if (outs[i]) ok.fetch_add(1);
    }
  };
  int t = num_threads > 0 ? num_threads : 4;
  if (t > n) t = n;
  std::vector<std::thread> threads;
  for (int i = 0; i < t; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

}  // extern "C"
