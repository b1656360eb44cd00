// Native data-loader kernels for medicalsemseg_tpu.
//
// The reference's host-side preprocessing leans on native code inside its
// dependencies (nibabel's C IO, scipy.ndimage resampling — SURVEY.md §2.3);
// this library is the framework's own native equivalent for the hot
// per-volume work: spacing resampling (MONAI Spacingd semantics, half-pixel
// centers) fused with CT intensity windowing, plus nearest-neighbour label
// resampling. Exposed through a plain C ABI consumed via ctypes
// (medicalsemseg_tpu/data/native.py); the NumPy implementations remain as
// the portable fallback and the correctness oracle in tests.
//
// Build: make -C native   (produces libmedseg_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int64_t clamp_idx(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

struct Dims {
    int64_t d, h, w;
};

// half-pixel source coordinate for output index i with scale s = in/out
inline double src_coord(int64_t i, double scale) {
    return (static_cast<double>(i) + 0.5) * scale - 0.5;
}

}  // namespace

extern "C" {

// Trilinear resample of a single-channel (D, H, W) C-order volume with
// 'nearest' edge handling (matches scipy map_coordinates(mode='nearest')
// on in-range half-pixel grids). Optionally applies the intensity window
//   y = clip((x - a_min) / (a_max - a_min), 0, 1)
// in the same pass (apply_window != 0).
void medseg_resample_trilinear(
    const float* in, int64_t id, int64_t ih, int64_t iw,
    float* out, int64_t od, int64_t oh, int64_t ow,
    int apply_window, float a_min, float a_max) {
    const Dims is{id, ih, iw};
    const double sd = static_cast<double>(id) / od;
    const double sh = static_cast<double>(ih) / oh;
    const double sw = static_cast<double>(iw) / ow;
    const float inv_range = apply_window ? 1.0f / (a_max - a_min) : 0.0f;

    for (int64_t z = 0; z < od; ++z) {
        const double fz = src_coord(z, sd);
        int64_t z0 = static_cast<int64_t>(std::floor(fz));
        const double tz = fz - z0;
        int64_t z1 = clamp_idx(z0 + 1, 0, is.d - 1);
        z0 = clamp_idx(z0, 0, is.d - 1);
        for (int64_t y = 0; y < oh; ++y) {
            const double fy = src_coord(y, sh);
            int64_t y0 = static_cast<int64_t>(std::floor(fy));
            const double ty = fy - y0;
            int64_t y1 = clamp_idx(y0 + 1, 0, is.h - 1);
            y0 = clamp_idx(y0, 0, is.h - 1);
            const float* p00 = in + (z0 * is.h + y0) * is.w;
            const float* p01 = in + (z0 * is.h + y1) * is.w;
            const float* p10 = in + (z1 * is.h + y0) * is.w;
            const float* p11 = in + (z1 * is.h + y1) * is.w;
            float* dst = out + (z * oh + y) * ow;
            for (int64_t x = 0; x < ow; ++x) {
                const double fx = src_coord(x, sw);
                int64_t x0 = static_cast<int64_t>(std::floor(fx));
                const double tx = fx - x0;
                int64_t x1 = clamp_idx(x0 + 1, 0, is.w - 1);
                x0 = clamp_idx(x0, 0, is.w - 1);
                const double c00 = p00[x0] + tx * (p00[x1] - p00[x0]);
                const double c01 = p01[x0] + tx * (p01[x1] - p01[x0]);
                const double c10 = p10[x0] + tx * (p10[x1] - p10[x0]);
                const double c11 = p11[x0] + tx * (p11[x1] - p11[x0]);
                const double c0 = c00 + ty * (c01 - c00);
                const double c1 = c10 + ty * (c11 - c10);
                double v = c0 + tz * (c1 - c0);
                if (apply_window) {
                    v = (v - a_min) * inv_range;
                    v = v < 0.0 ? 0.0 : (v > 1.0 ? 1.0 : v);
                }
                dst[x] = static_cast<float>(v);
            }
        }
    }
}

// Nearest-neighbour resample for label volumes (any 32-bit payload).
void medseg_resample_nearest_i32(
    const int32_t* in, int64_t id, int64_t ih, int64_t iw,
    int32_t* out, int64_t od, int64_t oh, int64_t ow) {
    const double sd = static_cast<double>(id) / od;
    const double sh = static_cast<double>(ih) / oh;
    const double sw = static_cast<double>(iw) / ow;
    for (int64_t z = 0; z < od; ++z) {
        const int64_t zi = clamp_idx(
            static_cast<int64_t>(std::llround(src_coord(z, sd))), 0, id - 1);
        for (int64_t y = 0; y < oh; ++y) {
            const int64_t yi = clamp_idx(
                static_cast<int64_t>(std::llround(src_coord(y, sh))), 0, ih - 1);
            const int32_t* src = in + (zi * ih + yi) * iw;
            int32_t* dst = out + (z * oh + y) * ow;
            for (int64_t x = 0; x < ow; ++x) {
                const int64_t xi = clamp_idx(
                    static_cast<int64_t>(std::llround(src_coord(x, sw))), 0,
                    iw - 1);
                dst[x] = src[xi];
            }
        }
    }
}

int medseg_native_abi_version() { return 1; }

}  // extern "C"
