// Native host-side image preprocessing for the diffsim-tpu data pipeline.
//
// The benchmark hot loop decodes and lanczos-resizes thousands of images while the TPU
// scores; the reference does this serially in PIL inside each score call
// (/root/reference/diffsim/diffsim.py:27-41). This library provides the resize half as
// plain C++ so Python worker threads drop the GIL for the duration of the call (ctypes
// releases it) and scale across cores.
//
// The resampler reproduces Pillow's fixed-point separable convolution for 8-bit images
// bit-for-bit (lanczos support=3, 22-bit integer coefficients, horizontal-then-vertical
// passes with an 8-bit intermediate) so scores are identical whichever path produced the
// pixels. Parity is enforced by tests/test_native_preprocess.py against PIL itself.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libpreprocess.so preprocess.cpp -lpthread

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's 8bpc coefficient precision
constexpr double kLanczosSupport = 3.0;

double sinc(double x) {
    if (x == 0.0) return 1.0;
    x *= M_PI;
    return std::sin(x) / x;
}

double lanczos_filter(double x) {
    if (x <= -kLanczosSupport || x >= kLanczosSupport) return 0.0;
    return sinc(x) * sinc(x / kLanczosSupport);
}

inline uint8_t clip8(int in) {
    int v = in >> kPrecisionBits;
    if (v < 0) return 0;
    if (v > 255) return 255;
    return static_cast<uint8_t>(v);
}

// Precompute per-output-pixel integer coefficient windows (Pillow precompute_coeffs +
// normalize_coeffs_8bpc semantics).
struct Coeffs {
    int ksize;                 // max taps per output pixel
    std::vector<int> bounds;   // (xmin, xcount) per output pixel
    std::vector<int32_t> kk;   // ksize coefficients per output pixel
};

Coeffs precompute(int in_size, int out_size) {
    Coeffs c;
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = kLanczosSupport * filterscale;
    c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    c.bounds.resize(out_size * 2);
    c.kk.resize(static_cast<size_t>(out_size) * c.ksize, 0);
    std::vector<double> w(c.ksize);
    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            double v = lanczos_filter((x + xmin - center + 0.5) / filterscale);
            w[x] = v;
            ww += v;
        }
        for (int x = 0; x < xmax; ++x) {
            if (ww != 0.0) w[x] /= ww;
            double k = w[x] * (1 << kPrecisionBits);
            c.kk[static_cast<size_t>(xx) * c.ksize + x] =
                static_cast<int32_t>(k < 0 ? k - 0.5 : k + 0.5);
        }
        c.bounds[xx * 2] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

void resample_horizontal(const uint8_t* src, int in_w, int h, int ch, const Coeffs& c,
                         int out_w, uint8_t* dst) {
    for (int y = 0; y < h; ++y) {
        const uint8_t* __restrict row = src + static_cast<size_t>(y) * in_w * ch;
        uint8_t* __restrict orow = dst + static_cast<size_t>(y) * out_w * ch;
        if (ch == 3) {
            // contiguous-tap accumulation: one pass over the window feeds all 3 channels
            for (int xx = 0; xx < out_w; ++xx) {
                int xmin = c.bounds[xx * 2];
                int xmax = c.bounds[xx * 2 + 1];
                const int32_t* __restrict k = &c.kk[static_cast<size_t>(xx) * c.ksize];
                int s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
                const uint8_t* p = row + xmin * 3;
                for (int x = 0; x < xmax; ++x, p += 3) {
                    int32_t kv = k[x];
                    s0 += p[0] * kv;
                    s1 += p[1] * kv;
                    s2 += p[2] * kv;
                }
                orow[xx * 3] = clip8(s0);
                orow[xx * 3 + 1] = clip8(s1);
                orow[xx * 3 + 2] = clip8(s2);
            }
        } else {
            for (int xx = 0; xx < out_w; ++xx) {
                int xmin = c.bounds[xx * 2];
                int xmax = c.bounds[xx * 2 + 1];
                const int32_t* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
                for (int b = 0; b < ch; ++b) {
                    int ss = 1 << (kPrecisionBits - 1);
                    for (int x = 0; x < xmax; ++x)
                        ss += row[(xmin + x) * ch + b] * k[x];
                    orow[xx * ch + b] = clip8(ss);
                }
            }
        }
    }
}

void resample_vertical(const uint8_t* src, int w, int in_h, int ch, const Coeffs& c,
                       int out_h, uint8_t* dst) {
    int row_len = w * ch;
    std::vector<int32_t> acc(row_len);
    for (int yy = 0; yy < out_h; ++yy) {
        int ymin = c.bounds[yy * 2];
        int ymax = c.bounds[yy * 2 + 1];
        const int32_t* __restrict k = &c.kk[static_cast<size_t>(yy) * c.ksize];
        // row-major accumulation: the inner loop is contiguous over the image row, which
        // autovectorizes; tap loop outer
        int32_t init = 1 << (kPrecisionBits - 1);
        for (int x = 0; x < row_len; ++x) acc[x] = init;
        for (int y = 0; y < ymax; ++y) {
            const uint8_t* __restrict irow = src + static_cast<size_t>(ymin + y) * row_len;
            int32_t kv = k[y];
            int32_t* __restrict a = acc.data();
            for (int x = 0; x < row_len; ++x) a[x] += irow[x] * kv;
        }
        uint8_t* __restrict orow = dst + static_cast<size_t>(yy) * row_len;
        for (int x = 0; x < row_len; ++x) orow[x] = clip8(acc[x]);
    }
}

}  // namespace

extern "C" {

// Lanczos resize, Pillow-8bpc-exact. src: (in_h, in_w, ch) uint8 C-contiguous;
// dst: (out_h, out_w, ch). Returns 0 on success.
int resize_lanczos_u8(const uint8_t* src, int in_h, int in_w, int ch,
                      uint8_t* dst, int out_h, int out_w) {
    if (!src || !dst || ch < 1 || ch > 4 || in_h < 1 || in_w < 1 || out_h < 1 || out_w < 1)
        return 1;
    Coeffs ch_coeffs = precompute(in_w, out_w);
    std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * ch);
    resample_horizontal(src, in_w, in_h, ch, ch_coeffs, out_w, tmp.data());
    Coeffs cv = precompute(in_h, out_h);
    resample_vertical(tmp.data(), out_w, in_h, ch, cv, out_h, dst);
    return 0;
}

// Fused benchmark preprocess: lanczos resize to (size, size). Kept separate from the
// Python normalize (which runs in-graph on device).
int process_image_u8(const uint8_t* src, int in_h, int in_w, int ch,
                     uint8_t* dst, int size) {
    return resize_lanczos_u8(src, in_h, in_w, ch, dst, size, size);
}

}  // extern "C"
