// Levenshtein distance kernels (C ABI).
//
// Replaces the reference's native distance dependencies:
// - python-Levenshtein (C ext) used by doc2tex/modules/metrics/ed.py:1
// - the optional `cdistance` ext of the vendored distance package
//   (doc2tex/tools/result_evaluate/distance/__init__.py:15-18)
// - the column-bitstring Levenshtein inner loop of the image metric
//   (doc2tex/tools/result_evaluate/evaluate_images.py:281)
//
// Build: g++ -O3 -shared -fPIC levenshtein.cpp -o _doc2tex_native.so
// (driven by doc2tex_tpu/native/__init__.py together with the tokenizer).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename T>
int lev_impl(const T* a, int n, const T* b, int m) {
    if (n == 0) return m;
    if (m == 0) return n;
    if (n < m) { std::swap(a, b); std::swap(n, m); }
    std::vector<int> prev(m + 1), cur(m + 1);
    for (int j = 0; j <= m; ++j) prev[j] = j;
    for (int i = 1; i <= n; ++i) {
        cur[0] = i;
        const T ai = a[i - 1];
        for (int j = 1; j <= m; ++j) {
            const int sub = prev[j - 1] + (ai != b[j - 1] ? 1 : 0);
            cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
        }
        std::swap(prev, cur);
    }
    return prev[m];
}

}  // namespace

extern "C" {

// byte strings (utf-8 bytes or ascii)
int d2t_lev_u8(const uint8_t* a, int n, const uint8_t* b, int m) {
    return lev_impl(a, n, b, m);
}

// generic id sequences (unicode codepoints, word ids, column hashes)
int d2t_lev_u32(const uint32_t* a, int n, const uint32_t* b, int m) {
    return lev_impl(a, n, b, m);
}

int d2t_lev_u64(const uint64_t* a, int n, const uint64_t* b, int m) {
    return lev_impl(a, n, b, m);
}

// Batched u32 version: flat concatenated sequences with offsets, pairwise
// distance of (a_i, b_i) written to out[i].  One call per eval batch kills
// the per-pair FFI overhead for metric sweeps.
void d2t_lev_u32_batch(const uint32_t* a, const int* a_off, const uint32_t* b,
                       const int* b_off, int count, int* out) {
    for (int i = 0; i < count; ++i) {
        const int an = a_off[i + 1] - a_off[i];
        const int bn = b_off[i + 1] - b_off[i];
        out[i] = lev_impl(a + a_off[i], an, b + b_off[i], bn);
    }
}

}  // extern "C"
