// Native data plane: PFM decode, MVSNet cam.txt parse, image
// standardization, nearest resize — with a thread pool for batch loads.
//
// Role: the reference ships native code on its hot paths (CUDA gather op,
// SURVEY.md §2.9) and leans on torch's native DataLoader workers for IO.
// On a TPU host the loader is the only CPU-bound stage; this library gives
// the batch loader true parallelism (no GIL) and fused decode+normalize.
//
// C ABI (ctypes): all functions return 0 on success, negative on error.

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PFM
// ---------------------------------------------------------------------------

// Parse header; returns 0 and fills (width, height, channels, scale,
// data_offset) or <0 on malformed input.
static int pfm_header(FILE* f, int* w, int* h, int* ch, float* scale) {
  char tag[3] = {0, 0, 0};
  if (fscanf(f, "%2s", tag) != 1) return -1;
  if (tag[0] != 'P' || (tag[1] != 'f' && tag[1] != 'F')) return -2;
  *ch = (tag[1] == 'F') ? 3 : 1;
  // skip whitespace/comments
  int c;
  auto skip = [&]() {
    while ((c = fgetc(f)) != EOF) {
      if (c == '#') { while ((c = fgetc(f)) != EOF && c != '\n') {} }
      else if (!isspace(c)) { ungetc(c, f); break; }
    }
  };
  skip();
  if (fscanf(f, "%d", w) != 1) return -3;
  skip();
  if (fscanf(f, "%d", h) != 1) return -4;
  skip();
  if (fscanf(f, "%f", scale) != 1) return -5;
  c = fgetc(f);  // single whitespace after scale
  if (c == EOF) return -6;
  return 0;
}

int pfm_shape(const char* path, int* height, int* width, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  float scale;
  int rc = pfm_header(f, width, height, channels, &scale);
  fclose(f);
  return rc;
}

// out must hold height*width*channels floats; rows returned top-down.
int pfm_load(const char* path, float* out, int64_t out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  int w, h, ch;
  float scale;
  int rc = pfm_header(f, &w, &h, &ch, &scale);
  if (rc != 0) { fclose(f); return rc; }
  const int64_t n = (int64_t)w * h * ch;
  if (out_len < n) { fclose(f); return -11; }
  std::vector<float> buf(n);
  if (fread(buf.data(), 4, n, f) != (size_t)n) { fclose(f); return -12; }
  fclose(f);

  const bool little = scale < 0.0f;
  const uint16_t probe = 1;
  const bool host_little = *reinterpret_cast<const uint8_t*>(&probe) == 1;
  if (little != host_little) {
    for (int64_t i = 0; i < n; ++i) {
      uint32_t v;
      memcpy(&v, &buf[i], 4);
      v = __builtin_bswap32(v);
      memcpy(&buf[i], &v, 4);
    }
  }
  const float mag = std::fabs(scale);
  const bool rescale = mag != 0.0f && mag != 1.0f;
  // PFM rows are bottom-up; flip while copying out.
  const int64_t row = (int64_t)w * ch;
  for (int y = 0; y < h; ++y) {
    const float* src = buf.data() + (int64_t)(h - 1 - y) * row;
    float* dst = out + (int64_t)y * row;
    if (rescale) {
      for (int64_t i = 0; i < row; ++i) dst[i] = src[i] * mag;
    } else {
      memcpy(dst, src, row * 4);
    }
  }
  return 0;
}

// Batched parallel PFM load: all maps must share (height, width, channels).
// paths: concatenated NUL-terminated strings; out: n * plane floats.
int pfm_load_batch(const char* paths, int n, int64_t plane, float* out,
                   int n_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      int rc = pfm_load(ptrs[i], out + (int64_t)i * plane, plane);
      if (rc != 0) err.store(rc);
    }
  };
  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt > n) nt = n;
  if (nt < 1) nt = 1;
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// cam.txt (MVSNet format, arXiv:1804.02505 §3)
// ---------------------------------------------------------------------------

// out: 32 floats = (2, 4, 4) reference layout. interval_scale multiplies
// the depth interval; if the depth line has <4 numbers and num_depth>0,
// fills count and derives depth_max.
int cam_load(const char* path, float* out, double interval_scale,
             int num_depth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  std::string text;
  {
    char buf[4096];
    size_t got;
    while ((got = fread(buf, 1, sizeof(buf), f)) > 0) text.append(buf, got);
  }
  fclose(f);
  memset(out, 0, 32 * sizeof(float));

  auto find_word = [&](const char* word) -> size_t {
    size_t pos = text.find(word);
    return pos == std::string::npos ? pos : pos + strlen(word);
  };
  size_t epos = find_word("extrinsic");
  size_t kpos = find_word("intrinsic");
  if (epos == std::string::npos || kpos == std::string::npos) return -2;

  const char* s = text.c_str() + epos;
  char* end;
  for (int i = 0; i < 16; ++i) {
    float v = strtof(s, &end);
    if (end == s) return -3;
    out[i] = v;
    s = end;
  }
  s = text.c_str() + kpos;
  // K into rows 0..2 of the second 4x4 (cols 0..2)
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      float v = strtof(s, &end);
      if (end == s) return -4;
      out[16 + r * 4 + c] = v;
      s = end;
    }
  // depth line: up to 4 numbers (double precision to mirror python floats)
  double depth[4] = {0, 0, 0, 0};
  int nd = 0;
  for (; nd < 4; ++nd) {
    double v = strtod(s, &end);
    if (end == s) break;
    depth[nd] = v;
    s = end;
  }
  // double intermediates to match numpy's float64 promotion bit-for-bit
  if (nd >= 1) out[16 + 12 + 0] = (float)depth[0];
  if (nd >= 2)
    out[16 + 12 + 1] = (float)(depth[1] * interval_scale);
  if (nd >= 4) {
    out[16 + 12 + 2] = (float)depth[2];
    out[16 + 12 + 3] = (float)depth[3];
  } else if (num_depth > 0) {
    out[16 + 12 + 2] = (float)num_depth;
    out[16 + 12 + 3] = (float)((double)out[16 + 12] +
                               (double)(num_depth - 1) * (double)out[16 + 12 + 1]);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// image ops
// ---------------------------------------------------------------------------

// Per-channel standardization over H*W (reference norm_image): x = (x-mean)/(std+1e-7)
int image_standardize(float* img, int64_t hw, int channels) {
  for (int c = 0; c < channels; ++c) {
    double sum = 0.0, sq = 0.0;
    for (int64_t i = 0; i < hw; ++i) {
      const double v = img[i * channels + c];
      sum += v;
      sq += v * v;
    }
    const double mean = sum / hw;
    const double var = sq / hw - mean * mean;
    const float stdv = (float)std::sqrt(var > 0 ? var : 0) + 1e-7f;
    const float m = (float)mean;
    for (int64_t i = 0; i < hw; ++i)
      img[i * channels + c] = (img[i * channels + c] - m) / stdv;
  }
  return 0;
}

// Nearest resize (matches dataset.preprocess fallback indexing).
int resize_nearest(const float* src, int sh, int sw, float* dst, int dh,
                   int dw, int channels) {
  for (int y = 0; y < dh; ++y) {
    int sy = (int)((int64_t)y * sh / dh);
    if (sy > sh - 1) sy = sh - 1;
    for (int x = 0; x < dw; ++x) {
      int sx = (int)((int64_t)x * sw / dw);
      if (sx > sw - 1) sx = sw - 1;
      memcpy(dst + ((int64_t)y * dw + x) * channels,
             src + ((int64_t)sy * sw + sx) * channels,
             channels * sizeof(float));
    }
  }
  return 0;
}

}  // extern "C"
