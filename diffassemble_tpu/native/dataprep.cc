// Native data-prep kernels for the host-side input pipeline.
//
// The reference keeps its input pipeline in Python (TorchScript patchify,
// numpy expander generation — puzzle_dataset.py:175-190, :33-152) and hides
// the cost behind torch DataLoader worker processes. Feeding a TPU at full
// rate from a single host needs the per-sample hot loops in native code:
//
//   patchify_f32   — image → (N, ps, ps, C) patch tensor (blocked copies)
//   unpatchify_f32 — inverse (for serving/viz)
//   rotate_patches_f32 — per-patch k·90° rotations (ROT datasets)
//   regular_graph_mask — permutation+rolls d-regular expander candidate as a
//                        boolean adjacency mask (spectral-gap check stays in
//                        scipy on the accepted candidate)
//   collate_pad_f32 — scatter variable-length samples into a padded batch
//
// Exposed with plain C linkage and driven via ctypes (native/__init__.py),
// which also compiles this file on first use (g++ -O3 -shared) and falls
// back to the pure-numpy implementations if no compiler is available.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// img: (H*ps, W*ps, C) row-major float32 → out: (H*W, ps, ps, C)
void patchify_f32(const float* img, int ph, int pw, int ps, int c, float* out) {
    const int img_w = pw * ps;
    const int row_stride = img_w * c;
    const int patch_row = ps * c;
    for (int by = 0; by < ph; ++by) {
        for (int bx = 0; bx < pw; ++bx) {
            float* dst = out + ((int64_t)(by * pw + bx)) * ps * patch_row;
            const float* src = img + (int64_t)by * ps * row_stride + (int64_t)bx * patch_row;
            for (int r = 0; r < ps; ++r) {
                std::memcpy(dst + (int64_t)r * patch_row,
                            src + (int64_t)r * row_stride,
                            sizeof(float) * patch_row);
            }
        }
    }
}

// patches: (H*W, ps, ps, C) → img: (H*ps, W*ps, C)
void unpatchify_f32(const float* patches, int ph, int pw, int ps, int c, float* img) {
    const int img_w = pw * ps;
    const int row_stride = img_w * c;
    const int patch_row = ps * c;
    for (int by = 0; by < ph; ++by) {
        for (int bx = 0; bx < pw; ++bx) {
            const float* src = patches + ((int64_t)(by * pw + bx)) * ps * patch_row;
            float* dst = img + (int64_t)by * ps * row_stride + (int64_t)bx * patch_row;
            for (int r = 0; r < ps; ++r) {
                std::memcpy(dst + (int64_t)r * row_stride,
                            src + (int64_t)r * patch_row,
                            sizeof(float) * patch_row);
            }
        }
    }
}

// in-place-style rotation: out[i] = rot90^{k[i]}(patches[i]), CCW like numpy
void rotate_patches_f32(const float* patches, const int32_t* rot_k,
                        int n, int ps, int c, float* out) {
    const int64_t plane = (int64_t)ps * ps * c;
    for (int i = 0; i < n; ++i) {
        const float* src = patches + i * plane;
        float* dst = out + i * plane;
        const int k = ((rot_k[i] % 4) + 4) % 4;
        if (k == 0) {
            std::memcpy(dst, src, sizeof(float) * plane);
            continue;
        }
        for (int y = 0; y < ps; ++y) {
            for (int x = 0; x < ps; ++x) {
                int sy, sx;  // source pixel for dst (y, x) after CCW k·90°
                switch (k) {
                    case 1: sy = x;          sx = ps - 1 - y; break;
                    case 2: sy = ps - 1 - y; sx = ps - 1 - x; break;
                    default: sy = ps - 1 - x; sx = y;         break;
                }
                std::memcpy(dst + ((int64_t)y * ps + x) * c,
                            src + ((int64_t)sy * ps + sx) * c,
                            sizeof(float) * c);
            }
        }
    }
}

// xorshift64* PRNG — deterministic across platforms
static inline uint64_t xs64(uint64_t& s) {
    s ^= s >> 12; s ^= s << 25; s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
}

// d-regular random graph via permutation + rolls (the reference's
// generate_random_regular_graph construction) written as an (n, n) mask.
// Self-loops on the diagonal; symmetric.
void regular_graph_mask(int n, int degree, uint64_t seed, uint8_t* mask) {
    std::memset(mask, 0, (size_t)n * n);
    for (int i = 0; i < n; ++i) mask[(int64_t)i * n + i] = 1;
    if (degree <= 0) return;
    if ((n * degree) % 2 != 0) degree += 1;
    // Fisher-Yates permutation
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
    int* perm = new int[n];
    for (int i = 0; i < n; ++i) perm[i] = i;
    for (int i = n - 1; i > 0; --i) {
        int j = (int)(xs64(s) % (uint64_t)(i + 1));
        std::swap(perm[i], perm[j]);
    }
    const int reps = degree / 2;
    for (int r = 1; r <= reps; ++r) {
        for (int i = 0; i < n; ++i) {
            int a = perm[i];
            int b = perm[(i + r) % n];
            mask[(int64_t)a * n + b] = 1;
            mask[(int64_t)b * n + a] = 1;
        }
    }
    if (degree % 2 == 1) {
        for (int i = 0; i < n / 2; ++i) {
            int a = perm[i], b = perm[n / 2 + i];
            mask[(int64_t)a * n + b] = 1;
            mask[(int64_t)b * n + a] = 1;
        }
    }
    delete[] perm;
}

// Scatter B variable-length samples into one padded batch:
//   src: concatenated rows (sum_lens, row_elems) float32
//   lens: (B,) lengths; out: (B, n_max, row_elems) pre-zeroed by caller
void collate_pad_f32(const float* src, const int32_t* lens, int b,
                     int n_max, int64_t row_elems, float* out) {
    int64_t off = 0;
    for (int i = 0; i < b; ++i) {
        const int n = std::min(lens[i], n_max);
        std::memcpy(out + (int64_t)i * n_max * row_elems,
                    src + off * row_elems,
                    sizeof(float) * (size_t)n * row_elems);
        off += lens[i];
    }
}

}  // extern "C"
