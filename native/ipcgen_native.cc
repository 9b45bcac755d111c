// Native host-side runtime components for ipcgen_tpu.
//
// The reference delegates its host hot paths to third-party C++ (Open3D I/O,
// numpy text parsing via np.loadtxt, sklearn trees — SURVEY.md §2.3).  This
// library provides the equivalents the TPU framework needs on the host side:
//
//   - a fast S3DIS txt point-cloud parser (np.loadtxt is ~20x slower on the
//     multi-million-line room files),
//   - Morton encoding + ordering for the SceneAsset builder (the argsort over
//     triangle centroids dominates asset build time in numpy),
//   - a vectorized labeled-PLY payload encoder (x,y,z,f32 | r,g,b,u8 |
//     sem,ins,u16 interleave without intermediate copies).
//
// Exposed as a plain C ABI consumed through ctypes
// (ipcgen_tpu/utils/native.py); every entry point has a numpy fallback so the
// framework runs without the compiled library.

#include <algorithm>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fast whitespace-separated float table parser (S3DIS room / annotation txt).
// Two-call protocol: first call with out=nullptr fills *rows/*cols; on the
// second (fill) call the caller passes the allocated *rows/*cols back in as
// the buffer capacity, and they are re-reported on return so the caller can
// validate.  Both passes run IDENTICAL tokenization (std::from_chars on every
// token; unparsable tokens are skipped in both), so the row/col accounting of
// the two passes cannot diverge.  A capacity clamp backstops the fill pass
// regardless.  Returns 0 on success.
// ---------------------------------------------------------------------------
int parse_float_table(const char* path, double* out, int64_t* rows,
                      int64_t* cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  buf[size] = '\0';

  const int64_t capacity = out ? (*rows) * (*cols) : 0;
  const char* p = buf.data();
  const char* end = buf.data() + size;
  int64_t n_rows = 0;
  int64_t n_cols = 0;
  int64_t out_idx = 0;

  while (p < end) {
    // Skip leading whitespace (but track newlines via the value loop below)
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p >= end) break;
    if (*p == '\n') {
      ++p;
      continue;
    }
    if (*p == '#') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    // Parse one row.  Tokenization is byte-identical in both passes: only
    // from_chars-parsable tokens count toward row_cols.
    int64_t row_cols = 0;
    const int64_t row_start_idx = out_idx;
    while (p < end && *p != '\n') {
      double v;
      auto [next, ec] = std::from_chars(p, end, v);
      if (ec != std::errc() || next == p) {  // unparsable token: skip it
        while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          ++p;
      } else {
        p = next;
        if (out && out_idx < capacity) out[out_idx] = v;
        ++out_idx;
        ++row_cols;
      }
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    }
    if (row_cols > 0) {
      if (n_cols == 0) n_cols = row_cols;
      if (row_cols == n_cols && (!out || out_idx <= capacity)) {
        ++n_rows;
      } else {
        // Ragged row (or capacity overrun backstop): rewind its values.
        out_idx = row_start_idx;
      }
    }
    if (p < end && *p == '\n') ++p;
  }
  *rows = n_rows;
  *cols = n_cols;
  return 0;
}

// ---------------------------------------------------------------------------
// Morton (Z-order) codes for quantized 3D points + the stable sort order.
// points: (n, 3) float32; lo/inv_extent: per-axis quantization; bits <= 21.
// ---------------------------------------------------------------------------
static inline uint64_t spread_bits(uint64_t v) {
  v &= 0x1fffff;  // 21 bits
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

void morton_order(const float* points, int64_t n, const float* lo,
                  const float* inv_extent, int bits, int32_t* order_out) {
  const uint64_t scale = (1ULL << bits) - 1;
  std::vector<uint64_t> codes(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint64_t q[3];
    for (int k = 0; k < 3; ++k) {
      float t = (points[i * 3 + k] - lo[k]) * inv_extent[k];
      if (t < 0.f) t = 0.f;
      if (t > 1.f) t = 1.f;
      q[k] = static_cast<uint64_t>(t * static_cast<float>(scale));
      if (q[k] > scale) q[k] = scale;
    }
    codes[i] =
        spread_bits(q[0]) | (spread_bits(q[1]) << 1) | (spread_bits(q[2]) << 2);
  }
  std::vector<int32_t> idx(static_cast<size_t>(n));
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
    return codes[a] < codes[b];
  });
  std::memcpy(order_out, idx.data(), sizeof(int32_t) * n);
}

// ---------------------------------------------------------------------------
// Labeled-PLY payload encoder: interleave columns into the 19-byte records
// (<fff BBB HH) of the 8-attribute format in one pass.
// ---------------------------------------------------------------------------
void encode_labeled_payload(const float* xyz, const uint8_t* rgb,
                            const uint16_t* sem, const uint16_t* ins,
                            int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t* rec = out + i * 19;
    std::memcpy(rec, xyz + i * 3, 12);
    std::memcpy(rec + 12, rgb + i * 3, 3);
    std::memcpy(rec + 15, sem + i, 2);
    std::memcpy(rec + 17, ins + i, 2);
  }
}

}  // extern "C"
