// Native out-of-core pass-A binner.
//
// The ooc tier's pass A turns one text chunk's (hi, lo) window keys
// into per-bucket row groups (oocore._bin_rows). The NumPy form costs
// a per-chunk argsort plus per-row fancy-gathers; this kernel streams
// the chunk once: separator distances via a moving pointer (positions
// are sequential), row metadata inline, destination by binary search
// over the sampled splitters, then a histogram + offset scatter —
// O(C) total, no sort. The role (and the prefix-sum placement trick)
// mirrors the reference's bucket scatter (src/mySort.c:61-110) minus
// the locks: slots are pre-assigned, so placement is race-free.
//
// Outputs are bucket-contiguous arrays; counts[b] gives each bucket's
// row count and the caller slices at the exclusive prefix offsets.

#include <algorithm>
#include <cstdint>

extern "C" {

// Returns the number of valid rows written (== sum of counts).
//  hi/lo        uint32[C_real] window keys of positions c0..c0+C_real
//  sep          int64[n_sep] sorted separator positions (global)
//  x2p          uint8[N + pad] 2-bit codes, separators stored as T
//  splitters    uint32[nb-1] sorted c-char-prefix splitters
//  k            node length; split_c = splitter depth in chars
//  out_*        caller buffers of >= C_real entries each
//  counts       int64[nb], zero-initialized by the callee
int64_t debwt_ooc_bin(const uint32_t* hi, const uint32_t* lo,
                      int64_t c0, int64_t C_real,
                      const int64_t* sep, int64_t n_sep,
                      const uint8_t* x2p, int64_t N,
                      const uint32_t* splitters, int64_t nb,
                      int64_t split_c, int64_t k,
                      uint32_t* out_hi, uint32_t* out_lo,
                      uint16_t* out_k16, int64_t* out_pos,
                      int64_t* counts) {
    for (int64_t b = 0; b < nb; ++b) counts[b] = 0;
    // moving separator cursor: first sep >= c0
    int64_t si = std::lower_bound(sep, sep + n_sep, c0) - sep;
    const uint32_t* sp_end = splitters + (nb - 1);
    const int64_t shift = 2 * (k - split_c);

    // pass 1: histogram (dest per row recomputed in pass 2 — the
    // recompute is cheaper than a C-sized dest scratch at 30 Gbp)
    int64_t si1 = si;
    for (int64_t j = 0; j < C_real; ++j) {
        int64_t pos = c0 + j;
        while (si1 < n_sep && sep[si1] < pos) ++si1;
        if (si1 >= n_sep || sep[si1] - pos < k) continue;
        uint64_t key = (static_cast<uint64_t>(hi[j]) << 32) | lo[j];
        uint32_t topc = static_cast<uint32_t>(key >> shift);
        int64_t b = std::upper_bound(splitters, sp_end, topc) - splitters;
        ++counts[b];
    }
    // exclusive prefix offsets
    int64_t total = 0;
    int64_t off[4096];  // nb is small (default 64; assert in caller)
    for (int64_t b = 0; b < nb; ++b) { off[b] = total; total += counts[b]; }

    // pass 2: metadata + scatter
    for (int64_t j = 0; j < C_real; ++j) {
        int64_t pos = c0 + j;
        while (si < n_sep && sep[si] < pos) ++si;
        if (si >= n_sep) break;
        int64_t dist = sep[si] - pos;
        if (dist < k) continue;
        uint64_t key = (static_cast<uint64_t>(hi[j]) << 32) | lo[j];
        uint32_t topc = static_cast<uint32_t>(key >> shift);
        int64_t b = std::upper_bound(splitters, sp_end, topc) - splitters;
        bool head = (pos == 0) ||
                    (si > 0 && sep[si - 1] == pos - 1);
        uint16_t prev = (pos > 0) ? x2p[pos - 1] : 0;
        uint16_t choice = (dist == k)
            ? static_cast<uint16_t>(pos + k == N - 1 ? 5 : 4)
            : static_cast<uint16_t>(x2p[pos + k]);
        uint16_t bwt_char = (pos == 0) ? 5 : (head ? 4 : prev);
        uint16_t predf = head ? 7 : prev;
        uint16_t k16 = static_cast<uint16_t>(
            (choice << 8) | (bwt_char << 4) |
            (static_cast<uint16_t>(head) << 3) | predf);
        int64_t w = off[b]++;
        out_hi[w] = hi[j];
        out_lo[w] = lo[j];
        out_k16[w] = k16;
        out_pos[w] = pos;
    }
    return total;
}

}  // extern "C"
