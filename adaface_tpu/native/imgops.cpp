// Host-side image pipeline kernels (C ABI, loaded via ctypes).
//
// The native runtime component of the framework: the reference's only
// native code is the InPlace-ABN CUDA extension used by its data-prep
// training path (face_parsing/modules/src); on TPU the device-side
// equivalent is the fused Pallas norm kernel (ops/fused_norm.py), and the
// host-side equivalent is this library — the per-item CPU work of the
// training data loader (ldm/data/personalized.py:426-511: NEAREST resize,
// horizontal flip, scale-into-canvas, roll shift, normalize) implemented
// as tight C++ loops so Python-side PIL/numpy overhead is off the input
// path at production batch rates.
//
// Build: see build.sh (g++ -O3 -march=native -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// NEAREST resize, HWC uint8. Matches PIL Image.NEAREST / torch 'nearest'
// convention: src = floor(dst * scale).
void resize_nearest_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    const int sy = (int)((int64_t)y * sh / dh);
    const uint8_t* srow = src + (size_t)sy * sw * c;
    uint8_t* drow = dst + (size_t)y * dw * c;
    for (int x = 0; x < dw; ++x) {
      const int sx = (int)((int64_t)x * sw / dw);
      std::memcpy(drow + (size_t)x * c, srow + (size_t)sx * c, c);
    }
  }
}

// In-place horizontal flip, HWC uint8.
void hflip_u8(uint8_t* img, int h, int w, int c) {
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + (size_t)y * w * c;
    for (int x = 0; x < w / 2; ++x) {
      uint8_t* a = row + (size_t)x * c;
      uint8_t* b = row + (size_t)(w - 1 - x) * c;
      for (int k = 0; k < c; ++k) std::swap(a[k], b[k]);
    }
  }
}

// Circular roll by (dy, dx), HWC uint8, out-of-place.
void roll_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c,
             int dy, int dx) {
  dy = ((dy % h) + h) % h;
  dx = ((dx % w) + w) % w;
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + (size_t)y * w * c;
    uint8_t* drow = dst + (size_t)((y + dy) % h) * w * c;
    const size_t tail = (size_t)(w - dx) * c;
    std::memcpy(drow + (size_t)dx * c, srow, tail);
    std::memcpy(drow, srow + tail, (size_t)dx * c);
  }
}

// Paste `src` (sh x sw) centered into a zeroed (dh x dw) canvas and write
// a {0,1} coverage mask (the scale-into-canvas augmentation).
void paste_center_u8(const uint8_t* src, int sh, int sw, int c,
                     uint8_t* dst, float* cover, int dh, int dw) {
  std::memset(dst, 0, (size_t)dh * dw * c);
  std::memset(cover, 0, (size_t)dh * dw * sizeof(float));
  const int oy = (dh - sh) / 2, ox = (dw - sw) / 2;
  for (int y = 0; y < sh; ++y) {
    std::memcpy(dst + ((size_t)(y + oy) * dw + ox) * c,
                src + (size_t)y * sw * c, (size_t)sw * c);
    float* crow = cover + (size_t)(y + oy) * dw + ox;
    for (int x = 0; x < sw; ++x) crow[x] = 1.0f;
  }
}

// uint8 HWC -> float32 HWC in [-1, 1].
void normalize_to_pm1(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i] * kInv - 1.0f;
}

// Fused whole-item pipeline: resize -> optional flip -> optional
// scale-into-canvas -> roll -> normalize, emitting the image (f32 [-1,1]),
// the coverage (aug) mask and a nearest-resized fg mask in one pass chain.
// scale_num/scale_den encode the shrink ratio (e.g. 3/4); pass equal
// values for no scaling. Returns 0 on success.
int prepare_item(const uint8_t* src, int sh, int sw,
                 const uint8_t* fg_mask_src /* nullable, sh x sw */,
                 int out_size, int do_flip, int scale_num, int scale_den,
                 int dy, int dx,
                 float* out_img, float* out_fg, float* out_aug,
                 uint8_t* scratch /* >= 3 * out_size*out_size*3 bytes */) {
  const int S = out_size;
  uint8_t* buf0 = scratch;                       // resized image
  uint8_t* buf1 = scratch + (size_t)S * S * 3;   // canvas
  uint8_t* mbuf = scratch + (size_t)2 * S * S * 3;  // mask lane

  resize_nearest_u8(src, sh, sw, 3, buf0, S, S);
  if (do_flip) hflip_u8(buf0, S, S, 3);

  // fg mask lane follows the same geometry
  if (fg_mask_src) {
    resize_nearest_u8(fg_mask_src, sh, sw, 1, mbuf, S, S);
    if (do_flip) hflip_u8(mbuf, S, S, 1);
  } else {
    std::memset(mbuf, 255, (size_t)S * S);
  }

  float* cover = out_aug;  // reuse output buffer as staging
  if (scale_num < scale_den) {
    const int ns = std::max(8, S * scale_num / scale_den);
    uint8_t* small_img = buf1;                      // ns*ns*3
    uint8_t* small_m = buf1 + (size_t)ns * ns * 3;  // ns*ns
    resize_nearest_u8(buf0, S, S, 3, small_img, ns, ns);
    resize_nearest_u8(mbuf, S, S, 1, small_m, ns, ns);
    paste_center_u8(small_img, ns, ns, 3, buf0, cover, S, S);
    // mask canvas
    uint8_t* mcanvas = buf1 + (size_t)ns * ns * 3 + (size_t)ns * ns;
    (void)mcanvas;
    std::memset(mbuf, 0, (size_t)S * S);
    const int oy = (S - ns) / 2, ox = (S - ns) / 2;
    for (int y = 0; y < ns; ++y)
      std::memcpy(mbuf + (size_t)(y + oy) * S + ox,
                  small_m + (size_t)y * ns, ns);
  } else {
    for (int64_t i = 0; i < (int64_t)S * S; ++i) cover[i] = 1.0f;
  }

  if (dy != 0 || dx != 0) {
    roll_u8(buf0, buf1, S, S, 3, dy, dx);
    std::swap(buf0, buf1);
    // roll the mask + coverage lanes
    uint8_t* m2 = buf1;  // reuse
    roll_u8(mbuf, m2, S, S, 1, dy, dx);
    std::memcpy(mbuf, m2, (size_t)S * S);
    // coverage as bytes via mask lane trick
    for (int64_t i = 0; i < (int64_t)S * S; ++i)
      m2[i] = (uint8_t)(cover[i] > 0.5f ? 1 : 0);
    uint8_t* m3 = m2 + (size_t)S * S;
    roll_u8(m2, m3, S, S, 1, dy, dx);
    for (int64_t i = 0; i < (int64_t)S * S; ++i) cover[i] = (float)m3[i];
  }

  normalize_to_pm1(buf0, out_img, (int64_t)S * S * 3);
  for (int64_t i = 0; i < (int64_t)S * S; ++i)
    out_fg[i] = mbuf[i] > 127 ? 1.0f : 0.0f;
  return 0;
}

}  // extern "C"
