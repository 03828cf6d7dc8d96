// Host-side gain-map application over the decode intermediates
// (ops/gainmap.py _apply_kernel, use_luts=False semantics): the
// planes-readback decode path ships the integer (Y, U, V, gain map)
// planes across the link (~2-4x fewer bytes than packed output
// pixels) and reconstructs the final RGBA frame here. Float math
// mirrors the device kernel op-for-op in f32; transcendentals use
// ~1e-7-accurate polynomial log2/exp2 (device: XLA's f32 pow/exp2),
// so outputs agree with the device kernel to <=1 F16 ULP / <=1
// 10-bit code — asserted by tests/test_hostapply.py.
//
// Reference roles: applyGainMap + applyRecMap worker loop
// (/root/reference/lib/src/ultrahdr.cpp:360-515), gainmapmath.cpp
// applyGain/sampleMap/ShepardsIDW (:543-720).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__F16C__)
#include <immintrin.h>
#endif

namespace {

// ---------------------------------------------------------------
// Fast transcendentals (Cephes-derived minimax polynomials).
// ---------------------------------------------------------------

inline float fast_log2f(float x) {
  // Assumes x > 0 and finite (callers clamp).
  int32_t xi;
  std::memcpy(&xi, &x, 4);
  int e = ((xi >> 23) & 0xFF) - 127;
  xi = (xi & 0x007FFFFF) | 0x3F800000;  // mantissa in [1,2)
  float m;
  std::memcpy(&m, &xi, 4);
  if (m > 1.41421356f) {
    m *= 0.5f;
    e += 1;
  }
  const float z = m - 1.0f;  // in [sqrt(2)/2-1, sqrt(2)-1]
  const float z2 = z * z;
  float p = 7.0376836292e-2f;
  p = p * z - 1.1514610310e-1f;
  p = p * z + 1.1676998740e-1f;
  p = p * z - 1.2420140846e-1f;
  p = p * z + 1.4249322787e-1f;
  p = p * z - 1.6668057665e-1f;
  p = p * z + 2.0000714765e-1f;
  p = p * z - 2.4999993993e-1f;
  p = p * z + 3.3333331174e-1f;
  const float ln1z = z - 0.5f * z2 + z2 * z * p;
  return (float)e + ln1z * 1.44269504088896341f;
}

inline float fast_exp2f(float x) {
  if (x < -126.0f) x = -126.0f;
  if (x > 127.0f) x = 127.0f;
  const float fi = std::floor(x);
  const float f = x - fi;  // [0,1)
  float p = 1.535336188319500e-4f;
  p = p * f + 1.339887440266574e-3f;
  p = p * f + 9.618437357674640e-3f;
  p = p * f + 5.550332471162809e-2f;
  p = p * f + 2.402264791363012e-1f;
  p = p * f + 6.931472028550421e-1f;
  p = p * f + 1.0f;
  const int32_t bits = ((int32_t)fi + 127) << 23;
  float s;
  std::memcpy(&s, &bits, 4);
  return p * s;
}

inline float fast_powf(float x, float y) {  // x > 0
  return fast_exp2f(y * fast_log2f(x));
}

inline float clamp01(float x) {
  return x < 0.0f ? 0.0f : (x > 1.0f ? 1.0f : x);
}

// sRGB gamma -> linear (ops/color.py srgb_inv_oetf, IEC 61966-2-1).
inline float srgb_inv(float e) {
  if (e <= 0.04045f) return e * (1.0f / 12.92f);
  return fast_powf((e + 0.055f) * (1.0f / 1.055f), 2.4f);
}

// HLG OETF (ops/color.py hlg_oetf, BT.2100-2 Table 5).
inline float hlg_oetf(float e) {
  if (e <= 1.0f / 12.0f) return std::sqrt(std::max(3.0f * e, 0.0f));
  constexpr float A = 0.17883277f, B = 0.28466892f, C = 0.55991073f;
  const float t = std::max(12.0f * e - B, 1e-12f);
  return A * (fast_log2f(t) * 0.6931471805599453f) + C;
}

// PQ OETF (ops/color.py pq_oetf, BT.2100-2 Table 4).
inline float pq_oetf(float e) {
  if (e <= 0.0f) return 0.0f;
  constexpr float M1 = 2610.0f / 16384.0f;
  constexpr float M2 = 2523.0f / 4096.0f * 128.0f;
  constexpr float C1 = 3424.0f / 4096.0f;
  constexpr float C2 = 2413.0f / 4096.0f * 32.0f;
  constexpr float C3 = 2392.0f / 4096.0f * 32.0f;
  const float ep = fast_powf(e, M1);
  return fast_powf((C1 + C2 * ep) / (1.0f + C3 * ep), M2);
}

inline uint16_t f32_to_f16(float x) {
#if defined(__F16C__)
  return (uint16_t)_cvtss_sh(x, _MM_FROUND_TO_NEAREST_INT);
#else
  // Software RTNE fallback.
  uint32_t b;
  std::memcpy(&b, &x, 4);
  const uint32_t sign = (b >> 16) & 0x8000u;
  int32_t e = (int32_t)((b >> 23) & 0xFF) - 127 + 15;
  uint32_t m = b & 0x007FFFFFu;
  if (e >= 31) return (uint16_t)(sign | 0x7C00u);  // inf/overflow
  if (e <= 0) {
    if (e < -10) return (uint16_t)sign;
    m |= 0x00800000u;
    const int shift = 14 - e;
    const uint32_t q = m >> shift;
    const uint32_t rem = m & ((1u << shift) - 1);
    const uint32_t half = 1u << (shift - 1);
    uint32_t r = q;
    if (rem > half || (rem == half && (q & 1))) r += 1;
    return (uint16_t)(sign | r);
  }
  uint32_t q = m >> 13;
  const uint32_t rem = m & 0x1FFFu;
  uint32_t r = ((uint32_t)e << 10) | q;
  if (rem > 0x1000u || (rem == 0x1000u && (r & 1))) r += 1;
  return (uint16_t)(sign | r);
#endif
}

// Shepard IDW weights for one (py, px, incR, incB) config, computed
// with the exact f32 expressions of ops/gainmap.py _idw_upsample.
struct IdwW {
  float w1, w2, w3, w4, total;
};

void fill_wtab(std::vector<IdwW>& tab, int scale) {
  tab.resize(4 * scale * scale);
  for (int cfg = 0; cfg < 4; ++cfg) {
    const float incR = (cfg & 1) ? 1.0f : 0.0f;
    const float incB = (cfg & 2) ? 1.0f : 0.0f;
    for (int pyi = 0; pyi < scale; ++pyi) {
      for (int pxi = 0; pxi < scale; ++pxi) {
        const float px = (float)pxi / (float)scale;
        const float py = (float)pyi / (float)scale;
        const float d1 = std::sqrt(px * px + py * py);
        const float d2 =
            std::sqrt(px * px + (py - incB) * (py - incB));
        const float d3 =
            std::sqrt((px - incR) * (px - incR) + py * py);
        const float d4 = std::sqrt((px - incR) * (px - incR) +
                                   (py - incB) * (py - incB));
        constexpr float eps = 1e-12f;
        IdwW w;
        w.w1 = 1.0f / std::max(d1, eps);
        w.w2 = 1.0f / std::max(d2, eps);
        w.w3 = 1.0f / std::max(d3, eps);
        w.w4 = 1.0f / std::max(d4, eps);
        w.total = w.w1 + w.w2 + w.w3 + w.w4;
        tab[(cfg * scale + pyi) * scale + pxi] = w;
      }
    }
  }
}

// BT.601 full-range YUV -> RGB constants (ops/color.py _YUV_PARAMS
// "bt601": kr=.299 kg=.587 kb=.114, cb=1.772, cr=1.402 — the decoded
// JPEG base is always BT.601/sRGB, ultrahdr.cpp:437-445).
constexpr float kCr = 1.402f;
constexpr float kCb = 1.772f;
constexpr float kGcb = (float)(0.114 * 1.772 / 0.587);
constexpr float kGcr = (float)(0.299 * 1.402 / 0.587);

struct ApplyArgs {
  const uint8_t* comp;  // composite base (frame)
  int64_t stride;       // composite row stride (bytes)
  int64_t h, w, ch, cw, gh, gw, scale;
  float log2_min, log2_max, boost_factor, display_boost;
  int mode;  // 0 = F16 linear, 1 = HLG 1010102, 2 = PQ 1010102
  void* out;
  const IdwW* wtab;
};

void apply_rows(const ApplyArgs& a, int64_t y0, int64_t y1) {
  const int64_t w = a.w;
  const int s = (int)a.scale;
  std::vector<float> rbuf(w), gbuf(w), bbuf(w), gain(w);
  const float inv255 = 1.0f / 255.0f;
  for (int64_t y = y0; y < y1; ++y) {
    const uint8_t* yrow = a.comp + y * a.stride;
    const uint8_t* urow = a.comp + (a.h + (y >> 1)) * a.stride;
    const uint8_t* vrow = urow + a.cw;
    // --- SDR pixel -> linear RGB ---
    for (int64_t x = 0; x < w; ++x) {
      const float yf = (float)yrow[x] * inv255;
      const float uf = ((float)urow[x >> 1] - 128.0f) * inv255;
      const float vf = ((float)vrow[x >> 1] - 128.0f) * inv255;
      rbuf[x] = srgb_inv(clamp01(yf + kCr * vf));
      gbuf[x] = srgb_inv(clamp01(yf - kGcb * uf - kGcr * vf));
      bbuf[x] = srgb_inv(clamp01(yf + kCb * uf));
    }
    // --- IDW-upsampled gain map -> per-pixel gain factor ---
    const int64_t gy = std::min(y / s, a.gh - 1);
    const int64_t gyn =
        std::min(std::min(gy + 1, (a.h - 1) / s), a.gh - 1);
    const uint8_t* gm0 = a.comp + (a.h + a.ch + gy) * a.stride;
    const uint8_t* gm1 = a.comp + (a.h + a.ch + gyn) * a.stride;
    const int pyi = (int)(y % s);
    // inc_b is 1 in the interior, 0 on the bottom map row
    // (ops/gainmap.py _idw_upsample inc_r/inc_b).
    const int cfgB = (y / s >= a.gh - 1) ? 0 : 2;
    for (int64_t x = 0; x < w; ++x) {
      const int64_t gx = std::min(x / s, a.gw - 1);
      const int64_t gxn =
          std::min(std::min(gx + 1, (a.w - 1) / s), a.gw - 1);
      const int pxi = (int)(x % s);
      float g01;
      const float e1 = (float)gm0[gx] * inv255;
      if (pxi == 0 && pyi == 0) {
        g01 = e1;  // d1 == 0: exact sample
      } else {
        const int cfg = cfgB | ((x / s >= a.gw - 1) ? 0 : 1);
        const IdwW& wt = a.wtab[(cfg * s + pyi) * s + pxi];
        const float e2 = (float)gm1[gx] * inv255;
        const float e3 = (float)gm0[gxn] * inv255;
        const float e4 = (float)gm1[gxn] * inv255;
        g01 = (e1 * wt.w1 + e2 * wt.w2 + e3 * wt.w3 + e4 * wt.w4) /
              wt.total;
      }
      const float lb =
          a.log2_min * (1.0f - g01) + a.log2_max * g01;
      gain[x] =
          fast_exp2f(lb * a.boost_factor) / a.display_boost;
    }
    // --- apply + pack ---
    if (a.mode == 0) {
      uint16_t* o = (uint16_t*)a.out + y * w * 4;
      for (int64_t x = 0; x < w; ++x) {
        o[x * 4 + 0] = f32_to_f16(rbuf[x] * gain[x]);
        o[x * 4 + 1] = f32_to_f16(gbuf[x] * gain[x]);
        o[x * 4 + 2] = f32_to_f16(bbuf[x] * gain[x]);
        o[x * 4 + 3] = 0x3C00;
      }
    } else {
      uint32_t* o = (uint32_t*)a.out + y * w;
      for (int64_t x = 0; x < w; ++x) {
        float r = rbuf[x] * gain[x];
        float g = gbuf[x] * gain[x];
        float b = bbuf[x] * gain[x];
        if (a.mode == 1) {
          r = hlg_oetf(r);
          g = hlg_oetf(g);
          b = hlg_oetf(b);
        } else {
          r = pq_oetf(r);
          g = pq_oetf(g);
          b = pq_oetf(b);
        }
        const uint32_t ri = (uint32_t)(clamp01(r) * 1023.0f) & 0x3FF;
        const uint32_t gi = (uint32_t)(clamp01(g) * 1023.0f) & 0x3FF;
        const uint32_t bi = (uint32_t)(clamp01(b) * 1023.0f) & 0x3FF;
        o[x] = ri | (gi << 10) | (bi << 20) | 0xC0000000u;
      }
    }
  }
}

}  // namespace

extern "C" {

// Apply the gain map to one frame of decode intermediates laid out
// as the planes-readback composite: rows [0,h) Y (w wide), rows
// [h, h+ch) U|V (cw each), rows [h+ch, h+ch+gh) gain map (gw wide);
// stride is the composite row pitch. mode 0 writes (h, w, 4) u16
// RGBA halves, modes 1 (HLG) / 2 (PQ) write (h, w) u32 RGBA1010102.
// Returns 0, or negative on bad arguments.
long uhdr_apply_gainmap(const uint8_t* comp, int64_t stride,
                        int64_t h, int64_t w, int64_t ch, int64_t cw,
                        int64_t gh, int64_t gw, int64_t scale,
                        float log2_min, float log2_max,
                        float boost_factor, float display_boost,
                        int mode, void* out, long nthreads) {
  if (h <= 0 || w <= 0 || ch <= 0 || cw <= 0 || gh <= 0 || gw <= 0)
    return -1;
  if (scale <= 0 || scale > 256 || mode < 0 || mode > 2) return -2;
  if (stride < w || stride < 2 * cw || stride < gw) return -3;
  if (display_boost <= 0.0f) return -4;

  std::vector<IdwW> wtab;
  fill_wtab(wtab, (int)scale);
  ApplyArgs a{comp,     stride,   h,  w,  ch,  cw, gh, gw, scale,
              log2_min, log2_max, boost_factor, display_boost,
              mode,     out,      wtab.data()};

  long T = nthreads;
  if (T > 8) T = 8;
  if (T <= 1 || h < 4 * T) {
    apply_rows(a, 0, h);
    return 0;
  }
  // Even-row band starts keep each band's chroma rows private.
  std::vector<std::thread> ts;
  const int64_t band = ((h + T - 1) / T + 1) & ~1LL;
  for (long t = 0; t < T; ++t) {
    const int64_t y0 = t * band;
    const int64_t y1 = std::min(y0 + band, h);
    if (y0 >= y1) break;
    ts.emplace_back(apply_rows, std::cref(a), y0, y1);
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"
