// Native host half of the RCT + fine-width segment readback pack
// (parallel/packio.py fetch_rgba1010102_batch). The device packs the
// decoded RGBA1010102 batch as zigzagged vertical deltas of the
// decorrelated (G, R-G, B-G) planes, bucketed per 64-sample segment
// by bit width; this single pass reverses all of it — word unpack,
// un-zigzag, 32-row grouped prefix sum, channel recorrelation and the
// final u32 pack — at memcpy-class speed. The pure-numpy fallback in
// packio.py needs ~6 s per 4K frame on this single 2.1 GHz core
// (five+ full-size temporaries); this does the same work in one
// cache-friendly sweep.
//
// Layout contract (must match packio.py):
//   FINE_WIDTHS = {1,2,3,4,5,6,8,10}; LF = 64 samples/segment; G = 32
//   rows per delta group (row 0 of each group is a raw delta vs 0).
//   bmap: (3*n*h * ceil(w/64)) u8 width codes in original segment
//   order (0 = all-zero segment). blob: per-width buckets of u32
//   words, each bucket's rows ordered by original segment index
//   (the device's stable (rank, index) sort); sample j of a segment
//   lives in word j % nw at shift (j / nw) * width.
#include <cstdint>
#include <cstring>

namespace {

constexpr int kWidths[8] = {1, 2, 3, 4, 5, 6, 8, 10};
constexpr int LF = 64;
constexpr int GROUP = 32;

inline int words_per_seg(int bw) {
  int k = 32 / bw;
  return (LF + k - 1) / k;
}

}  // namespace

extern "C" {

// Returns 0 on success, negative on malformed inputs. `scratch` is a
// caller-allocated u16 buffer of n*h*w (holds the decoded G plane
// until the difference planes re-correlate against it); `out` is the
// (n, h, w) RGBA1010102 result.
long uhdr_rctseg_unpack(const uint8_t* bmap, const uint32_t* blob,
                        const int64_t* bucket_word_offs,  // 8 entries
                        int64_t n, int64_t h, int64_t w,
                        uint16_t* scratch, uint32_t* out) {
  if (n <= 0 || h <= 0 || w <= 0 || (3 * n * h) % GROUP != 0)
    return -1;
  const int64_t nsegw = (w + LF - 1) / LF;
  const int64_t plane_rows = n * h;

  // Per-bucket fill counters: segments are visited in original order,
  // matching the device sort's within-bucket ordering.
  int64_t fill[8] = {0};
  int rank_of[11] = {0};
  for (int j = 0; j < 8; ++j) rank_of[kWidths[j]] = j;

  int32_t acc[8192 + LF];  // running column sums for one row stripe
  const uint8_t* bm = bmap;
  if (w > 8192) return -2;

  for (int plane = 0; plane < 3; ++plane) {
    for (int64_t r = 0; r < plane_rows; ++r) {
      const int64_t grow = plane * plane_rows + r;
      if (grow % GROUP == 0) std::memset(acc, 0, sizeof(int32_t) * ((nsegw * LF)));
      for (int64_t s = 0; s < nsegw; ++s, ++bm) {
        const int bw = *bm;
        if (bw == 0) continue;  // all-zero deltas: acc unchanged
        const int j = rank_of[bw];
        const int nw = words_per_seg(bw);
        const uint32_t* words = blob + bucket_word_offs[j] + fill[j]++ * nw;
        const uint32_t mask = (1u << bw) - 1;
        int32_t* a = acc + s * LF;
        const int k = 32 / bw;
        int idx = 0;
        for (int slot = 0; slot < k && idx < LF; ++slot) {
          const int shift = slot * bw;
          for (int wi = 0; wi < nw && idx < LF; ++wi, ++idx) {
            const uint32_t v = (words[wi] >> shift) & mask;
            const int32_t d = (int32_t)(v >> 1) ^ -(int32_t)(v & 1);
            a[idx] += d;
          }
        }
      }
      // Emit the row: recorrelate against the G plane and pack.
      const int64_t rowbase = r * w;  // index inside the (n*h, w) plane
      if (plane == 0) {
        uint32_t* o = out + rowbase;
        uint16_t* gb = scratch + rowbase;
        for (int64_t x = 0; x < w; ++x) {
          const uint16_t g = (uint16_t)(acc[x] & 1023);
          gb[x] = g;
          o[x] = ((uint32_t)g << 10) | 0xC0000000u;
        }
      } else if (plane == 1) {
        uint32_t* o = out + rowbase;
        const uint16_t* gb = scratch + rowbase;
        for (int64_t x = 0; x < w; ++x)
          o[x] |= (uint32_t)((acc[x] + gb[x]) & 1023);
      } else {
        uint32_t* o = out + rowbase;
        const uint16_t* gb = scratch + rowbase;
        for (int64_t x = 0; x < w; ++x)
          o[x] |= (uint32_t)((acc[x] + gb[x]) & 1023) << 20;
      }
    }
  }
  return 0;
}

}  // extern "C"
