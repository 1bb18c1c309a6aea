// Native host-side runtime for monodepth_tpu.
//
// The reference has no native code of its own (SURVEY.md §2.2) — its speed
// lives inside torch/cv2 binaries.  This library provides the TPU-framework
// equivalents for the *host* hot paths that feed the device:
//
//   - bilinear resize of uint8 HWC images (data-loader preprocessing)
//   - fused uint8 -> float32 [0,1] conversion with per-channel mean/std
//     normalization (ImageNet normalize of reference mars_dataset.py:75-79)
//   - Mars-style photometric augmentation (contrast/color jitter, red boost,
//     Gaussian dust noise — reference mars_finetune.py:117-138) with a
//     xorshift RNG for reproducibility
//   - binary PLY point-cloud serialization (the save_point_cloud API the
//     reference implies, test_mars_depth.py:196)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------- resize
// PyTorch-convention bilinear (align_corners=false, negative source clamped),
// uint8 HWC -> uint8 HWC.
void md_resize_bilinear_u8(const uint8_t* src, int in_h, int in_w, int channels,
                           uint8_t* dst, int out_h, int out_w) {
    // Precompute per-axis taps.
    int* x_lo = new int[out_w];
    int* x_hi = new int[out_w];
    float* x_w = new float[out_w];
    const float sx = (float)in_w / (float)out_w;
    for (int x = 0; x < out_w; ++x) {
        float s = sx * ((float)x + 0.5f) - 0.5f;
        if (s < 0.f) s = 0.f;
        int lo = (int)s;
        if (lo > in_w - 1) lo = in_w - 1;
        int hi = std::min(lo + 1, in_w - 1);
        x_lo[x] = lo; x_hi[x] = hi; x_w[x] = s - (float)lo;
    }
    const float sy = (float)in_h / (float)out_h;
    for (int y = 0; y < out_h; ++y) {
        float s = sy * ((float)y + 0.5f) - 0.5f;
        if (s < 0.f) s = 0.f;
        int ylo = (int)s;
        if (ylo > in_h - 1) ylo = in_h - 1;
        int yhi = std::min(ylo + 1, in_h - 1);
        float wy = s - (float)ylo;
        const uint8_t* row_lo = src + (size_t)ylo * in_w * channels;
        const uint8_t* row_hi = src + (size_t)yhi * in_w * channels;
        uint8_t* out_row = dst + (size_t)y * out_w * channels;
        for (int x = 0; x < out_w; ++x) {
            const int xl = x_lo[x] * channels, xh = x_hi[x] * channels;
            const float wx = x_w[x];
            for (int c = 0; c < channels; ++c) {
                float top = (float)row_lo[xl + c] * (1.f - wx) + (float)row_lo[xh + c] * wx;
                float bot = (float)row_hi[xl + c] * (1.f - wx) + (float)row_hi[xh + c] * wx;
                float v = top * (1.f - wy) + bot * wy;
                out_row[x * channels + c] = (uint8_t)(v + 0.5f);
            }
        }
    }
    delete[] x_lo; delete[] x_hi; delete[] x_w;
}

// ------------------------------------------------------------- normalize
// uint8 HWC -> float32 HWC: (x/255 - mean[c]) / std[c].
void md_normalize_u8_f32(const uint8_t* src, int n_pixels, int channels,
                         const float* mean, const float* stddev, float* dst) {
    float scale[8], bias[8];
    for (int c = 0; c < channels && c < 8; ++c) {
        scale[c] = 1.0f / (255.0f * stddev[c]);
        bias[c] = -mean[c] / stddev[c];
    }
    for (int i = 0; i < n_pixels; ++i) {
        const uint8_t* p = src + (size_t)i * channels;
        float* q = dst + (size_t)i * channels;
        for (int c = 0; c < channels; ++c)
            q[c] = (float)p[c] * scale[c] + bias[c];
    }
}

// ----------------------------------------------------------------- RNG
static inline uint64_t xorshift64(uint64_t* s) {
    uint64_t x = *s;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    *s = x;
    return x;
}
static inline float rng_uniform(uint64_t* s) {  // [0, 1)
    return (float)(xorshift64(s) >> 40) / (float)(1 << 24);
}
static inline float rng_normal(uint64_t* s) {   // Box-Muller
    float u1 = rng_uniform(s), u2 = rng_uniform(s);
    if (u1 < 1e-12f) u1 = 1e-12f;
    return sqrtf(-2.0f * logf(u1)) * cosf(6.2831853f * u2);
}

// -------------------------------------------------------------- augment
// In-place Mars-style photometric augmentation on float32 [0,1] HWC RGB:
// contrast jitter U[0.85,1.15], per-channel color jitter U[0.92,1.08],
// red boost U[1.05,1.15], Gaussian dust noise sigma = 5/255.
void md_mars_augment_f32(float* img, int n_pixels, uint64_t seed) {
    uint64_t s = seed ? seed : 0x9e3779b97f4a7c15ull;
    // warm the generator
    for (int i = 0; i < 4; ++i) xorshift64(&s);
    const float contrast = 0.85f + 0.30f * rng_uniform(&s);
    float color[3];
    for (int c = 0; c < 3; ++c) color[c] = 0.92f + 0.16f * rng_uniform(&s);
    color[0] *= 1.05f + 0.10f * rng_uniform(&s);  // red boost
    // mean for contrast jitter
    double total = 0.0;
    const size_t n = (size_t)n_pixels * 3;
    for (size_t i = 0; i < n; ++i) total += img[i];
    const float mean = (float)(total / (double)n);
    const float sigma = 5.0f / 255.0f;
    for (int i = 0; i < n_pixels; ++i) {
        float* p = img + (size_t)i * 3;
        for (int c = 0; c < 3; ++c) {
            float v = (p[c] - mean) * contrast + mean;
            v *= color[c];
            v += sigma * rng_normal(&s);
            p[c] = std::min(1.0f, std::max(0.0f, v));
        }
    }
}

// ------------------------------------------------------------------ PLY
// Binary little-endian PLY with float32 xyz and optional uint8 rgb.
// Returns 0 on success, nonzero on IO failure.
int md_write_ply(const char* path, const float* xyz, const uint8_t* rgb,
                 int64_t n_points) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    fprintf(f, "ply\nformat binary_little_endian 1.0\n");
    fprintf(f, "element vertex %lld\n", (long long)n_points);
    fprintf(f, "property float x\nproperty float y\nproperty float z\n");
    if (rgb)
        fprintf(f, "property uchar red\nproperty uchar green\nproperty uchar blue\n");
    fprintf(f, "end_header\n");
    int ok = 1;
    if (rgb) {
        const size_t rec = 3 * sizeof(float) + 3;
        char* buf = new char[(size_t)n_points * rec];
        for (int64_t i = 0; i < n_points; ++i) {
            memcpy(buf + i * rec, xyz + i * 3, 3 * sizeof(float));
            memcpy(buf + i * rec + 12, rgb + i * 3, 3);
        }
        ok = fwrite(buf, rec, (size_t)n_points, f) == (size_t)n_points;
        delete[] buf;
    } else {
        ok = fwrite(xyz, 3 * sizeof(float), (size_t)n_points, f) == (size_t)n_points;
    }
    fclose(f);
    return ok ? 0 : 2;
}

}  // extern "C"
