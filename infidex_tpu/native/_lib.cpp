// infidex_tpu native data-plane kernels (host side).
//
// Behavioral reference: Infidex Metrics/LevenshteinDistance.cs,
// Metrics/StringMetrics.cs and Compression/GroupVarInt.cs — the reference
// implements these in C# with SIMD intrinsics; here they are C++ compiled
// -O3 (auto-vectorized) and exposed through a plain C ABI for ctypes.
//
// Everything operates on UTF-32 codepoint buffers (uint32_t) so Python can
// pass str data losslessly (PyUnicode -> array of ordinals) — the reference
// compares UTF-16 chars; codepoint equality is equivalent for our purposes.
//
// All functions are pure and thread-safe (no globals, no allocation beyond
// small stack arrays except where documented).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------
// Banded Levenshtein with budget clamp (LevenshteinDistance.Calculate):
// returns min(lev(a,b), max_dist + 1).
static int lev_budget(const uint32_t* a, int la, const uint32_t* b, int lb,
                      int max_dist) {
    if (la == 0) return lb <= max_dist ? lb : max_dist + 1;
    if (lb == 0) return la <= max_dist ? la : max_dist + 1;
    int diff = la > lb ? la - lb : lb - la;
    if (diff > max_dist) return max_dist + 1;

    // row DP over b, banded by max_dist
    static thread_local int rowbuf[4096];
    int* row = rowbuf;
    if (lb + 1 > 4096) return max_dist + 1;  // callers keep tokens short
    for (int j = 0; j <= lb; ++j) row[j] = j;
    for (int i = 1; i <= la; ++i) {
        int prev_diag = row[0];
        row[0] = i;
        int row_min = row[0];
        int lo = std::max(1, i - max_dist);
        int hi = std::min(lb, i + max_dist);
        if (lo > 1) { prev_diag = row[lo - 1]; row[lo - 1] = max_dist + 1; }
        for (int j = lo; j <= hi; ++j) {
            int cur = row[j];
            int cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
            int v = std::min(std::min(row[j - 1] + 1, cur + 1),
                             prev_diag + cost);
            prev_diag = cur;
            row[j] = v;
            if (v < row_min) row_min = v;
        }
        if (hi < lb) row[hi + 1] = max_dist + 1;
        for (int j = hi + 2; j <= lb; ++j) row[j] = max_dist + 1;
        if (row_min > max_dist) return max_dist + 1;
    }
    return row[lb] <= max_dist ? row[lb] : max_dist + 1;
}

int infidex_levenshtein(const uint32_t* a, int la, const uint32_t* b, int lb,
                        int max_dist) {
    return lev_budget(a, la, b, lb, max_dist);
}

// CalculateDamerau (LevenshteinDistance.cs:281-341): plain Levenshtein with
// budget max_dist + 1; if the result lands exactly on max_dist + 1, scan to
// the FIRST mismatch, and if it is an adjacent transposition rescue with
// 1 + lev(rest) when that stays within budget. Mirrors
// utils/metrics.calculate_damerau exactly (incl. the max+2 fall-through).
int infidex_damerau(const uint32_t* a, int la, const uint32_t* b, int lb,
                    int max_dist) {
    int diff = la > lb ? la - lb : lb - la;
    if (diff > max_dist) return max_dist + 1;
    int d = lev_budget(a, la, b, lb, max_dist + 1);
    if (d <= max_dist) return d;
    if (d <= max_dist + 1) {
        int i = 0;
        int lim = la - 1;
        while (i < lim) {
            if (i >= lb) break;
            if (a[i] != b[i]) {
                if (i + 1 >= lb) break;
                if (a[i] == b[i + 1] && a[i + 1] == b[i]) {
                    int remaining = max_dist - 1;
                    if (remaining < 0) return max_dist + 1;
                    int rest = lev_budget(a + i + 2, la - i - 2,
                                          b + i + 2, lb - i - 2, remaining);
                    if (rest <= remaining) return 1 + rest;
                }
                break;  // only the first mismatch is examined
            }
            ++i;
        }
    }
    return d;
}

// CalculatePrefixDistance (PLD, Bast & Celikik 2011): min edit distance
// between q and any prefix of w; mirrors utils/metrics version (full DP,
// clamp to max_errors + 1 at the end).
int infidex_prefix_distance(const uint32_t* q, int lq, const uint32_t* w,
                            int lw, int max_errors) {
    if (lq == 0) return 0;
    if (lw == 0) return lq;
    if (lq - lw > max_errors) return max_errors + 1;
    static thread_local int prevbuf[4096], curbuf[4096];
    if (lq + 1 > 4096) return max_errors + 1;
    int* prev = prevbuf;
    int* cur = curbuf;
    for (int i = 0; i <= lq; ++i) prev[i] = i;
    int best = lq;
    for (int j = 1; j <= lw; ++j) {
        cur[0] = j;
        for (int i = 1; i <= lq; ++i) {
            int c = (q[i - 1] == w[j - 1]) ? 0 : 1;
            cur[i] = std::min(std::min(prev[i - 1] + c, prev[i] + 1),
                              cur[i - 1] + 1);
        }
        if (cur[lq] < best) best = cur[lq];
        std::swap(prev, cur);
    }
    return std::min(best, max_errors + 1);
}

// ---------------------------------------------------------------------
// StringMetrics "LCS" (StringMetrics.cs:12-36): containment-or-common-
// prefix with tolerance; mirrors utils/metrics.lcs exactly.
int infidex_lcs(const uint32_t* q, int lq, const uint32_t* r, int lr,
                int tolerance) {
    if (lq == 0 || lr == 0) return 0;
    // containment: q inside r (covers q == r)
    if (lq <= lr) {
        for (int s = 0; s + lq <= lr; ++s) {
            if (std::memcmp(q, r + s, lq * sizeof(uint32_t)) == 0) return lq;
        }
    }
    int m = std::min(lq, lr);
    int cp = 0;
    while (cp < m && q[cp] == r[cp]) ++cp;
    if (cp == 0) return 0;
    return std::min(cp + tolerance, m);
}

// Batch LCS over one query and many documents packed into a flat buffer.
// docs: concatenated codepoints; offsets[n+1] frames doc i.
void infidex_lcs_batch(const uint32_t* q, int lq, const uint32_t* docs,
                       const int64_t* offsets, int n, int tolerance,
                       int32_t* out) {
    for (int i = 0; i < n; ++i) {
        const uint32_t* r = docs + offsets[i];
        int lr = (int)(offsets[i + 1] - offsets[i]);
        out[i] = infidex_lcs(q, lq, r, lr, tolerance);
    }
}

// ---------------------------------------------------------------------
// GroupVarInt-GB codec (Compression/GroupVarInt.cs): 4 uint32 per 1-byte
// tag, 2 bits of byte-length each with value 0 in the TOP bits (matches
// utils/compression.group_varint_encode and the IFTS1 segment format),
// values little-endian. Returns encoded size in bytes; out must hold
// >= 1 + 16 bytes per group.
int64_t infidex_gvi_encode(const uint32_t* vals, int64_t n, uint8_t* out) {
    int64_t w = 0;
    for (int64_t g = 0; g < n; g += 4) {
        int64_t tag_pos = w++;
        uint8_t tag = 0;
        int cnt = (int)std::min<int64_t>(4, n - g);
        for (int k = 0; k < cnt; ++k) {
            uint32_t v = vals[g + k];
            int nb = v < 0x100 ? 1 : v < 0x10000 ? 2 : v < 0x1000000 ? 3 : 4;
            tag |= (uint8_t)((nb - 1) << ((3 - k) * 2));
            for (int b = 0; b < nb; ++b) out[w++] = (uint8_t)(v >> (8 * b));
        }
        out[tag_pos] = tag;
    }
    return w;
}

// Decodes exactly n values; returns bytes consumed.
int64_t infidex_gvi_decode(const uint8_t* in, int64_t n, uint32_t* out) {
    int64_t r = 0;
    for (int64_t g = 0; g < n; g += 4) {
        uint8_t tag = in[r++];
        int cnt = (int)std::min<int64_t>(4, n - g);
        for (int k = 0; k < cnt; ++k) {
            int nb = ((tag >> ((3 - k) * 2)) & 3) + 1;
            uint32_t v = 0;
            for (int b = 0; b < nb; ++b) v |= (uint32_t)in[r++] << (8 * b);
            out[g + k] = v;
        }
    }
    return r;
}

// Delta variants used by the segment format: docIds ascending.
int64_t infidex_gvi_encode_delta(const uint32_t* vals, int64_t n,
                                 uint8_t* out) {
    static thread_local uint32_t buf[65536];
    if (n <= 65536) {
        uint32_t prev = 0;
        for (int64_t i = 0; i < n; ++i) { buf[i] = vals[i] - prev; prev = vals[i]; }
        return infidex_gvi_encode(buf, n, out);
    }
    // large: allocate
    uint32_t* big = new uint32_t[n];
    uint32_t prev = 0;
    for (int64_t i = 0; i < n; ++i) { big[i] = vals[i] - prev; prev = vals[i]; }
    int64_t w = infidex_gvi_encode(big, n, out);
    delete[] big;
    return w;
}

int64_t infidex_gvi_decode_delta(const uint8_t* in, int64_t n,
                                 uint32_t* out) {
    int64_t r = infidex_gvi_decode(in, n, out);
    uint32_t acc = 0;
    for (int64_t i = 0; i < n; ++i) { acc += out[i]; out[i] = acc; }
    return r;
}

}  // extern "C"
